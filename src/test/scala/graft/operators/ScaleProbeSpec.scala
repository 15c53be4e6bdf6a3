package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Manual scale probe (skipped unless GRAFT_SCALE=1): replicates the
  * corpus with shifted ids and times the PRODUCTION prefix-filter
  * similarity join ([[graft.api.Ops.jaccardDupPairs]] — the same code
  * dd28 runs) at 1× vs 10× — evidence for the README's scaling claim
  * that cost tracks candidate mass, not corpus². The README measurement
  * (50k docs at 10×) was taken at sf0.1; run it with:
  * `GRAFT_SCALE=1 GRAFT_SCALE_SF=/root/testdata/sf0.1 sbt "testOnly graft.operators.ScaleProbeSpec"`
  */
class ScaleProbeSpec extends SparkTestBase {

  private def prefixJoinPairs(docs: org.apache.spark.sql.DataFrame): Long =
    graft.api.Ops.jaccardDupPairs(docs, idCol = "doc_id", textCol = "text",
      blockCol = Some("source"), threshold = 0.5).count()

  test("dd28 prefix-filter join: 10x replicated corpus timing") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val base = Tables(spark, sfDir, "documents").select("doc_id", "source", "text")

    def replicate(k: Int) = (0 until k)
      .map(i => base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("source"), col("text")))
      .reduce(_ unionByName _)

    for (k <- Seq(1, 10)) {
      val docs = replicate(k).localCheckpoint()
      val n = docs.count()
      val t0 = System.nanoTime()
      val pairs = prefixJoinPairs(docs)
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"k=$k docs=$n pairs=$pairs time=$sec%.1fs")
    }
  }
}
