package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Manual scale probe (skipped unless GRAFT_SCALE=1): replicates the
  * corpus with shifted ids and times the dd28-style prefix-filter
  * similarity join at 1× vs 10× — evidence for the README's scaling
  * claim that cost tracks candidate mass, not corpus². Run with:
  * `GRAFT_SCALE=1 sbt "testOnly graft.operators.ScaleProbeSpec"`
  */
class ScaleProbeSpec extends SparkTestBase {

  private def prefixJoinPairs(docs: org.apache.spark.sql.DataFrame): Long = {
    val hsUdf = udf { text: String => graft.functions.TextHash.shingleHashesSorted(text) }
    val g = docs.select(col("doc_id"), col("source"), hsUdf(col("text")).as("hs"))
      .withColumn("sz", size(col("hs"))).filter(col("sz") > 0)
    val pref = g.select(col("doc_id"), col("source"), col("sz"),
      explode(slice(col("hs"), lit(1), (col("sz") / 2).cast("int") + 1)).as("ph"))
    val pa = pref.alias("a"); val pb = pref.alias("b")
    val cand = pa.join(pb,
      col("a.ph") === col("b.ph") && col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.sz") <= col("b.sz") * 2 && col("b.sz") <= col("a.sz") * 2)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct()
    val ha = g.select(col("doc_id").as("a_id"), col("hs").as("hsa"), col("sz").as("sza"))
    val hb = g.select(col("doc_id").as("b_id"), col("hs").as("hsb"), col("sz").as("szb"))
    val inter = graft.functions.ArrayOps.intersectCardSorted(col("hsa"), col("hsb"))
    cand.join(ha, "a_id").join(hb, "b_id")
      .select((inter / (col("sza") + col("szb") - inter)).as("j"))
      .filter(col("j") >= 0.5).count()
  }

  test("dd28 prefix-filter join: 10x replicated corpus timing") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.01")
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
