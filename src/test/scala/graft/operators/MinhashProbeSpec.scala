package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Manual stage profile for the MinHash pipeline (skipped unless
  * GRAFT_SCALE=1): where do dd26's seconds go — signatures, banding
  * self-join, or verification? */
class MinhashProbeSpec extends SparkTestBase {

  test("dd26 stage timings") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val docs = Tables(spark, sfDir, "documents")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // absorb scan/codegen/session warm-up so stage timings are honest —
    // the aggregate must actually CONSUME text, or Catalyst prunes the
    // column and the first timed stage still pays the cold text scan
    docs.agg(sum(length(col("text")))).head()

    val sigUdf = udf { text: String => graft.functions.TextHash.minhashSig(text, 64) }
    timed("signatures (k=64)") {
      // count of negative first-hash values forces full computation
      // without ANSI long-sum overflow on the huge hash magnitudes
      docs.select(sigUdf(col("text")).as("sig"))
        .select(count(when(element_at(col("sig"), 1) < 0, 1))).head()
    }
    val hsUdf = udf { text: String => graft.functions.TextHash.shingleHashesSorted(text) }
    timed("shingle hash sets") {
      docs.select(hsUdf(col("text")).as("hs")).select(sum(size(col("hs")))).head()
    }
    timed("full minhashDupPairs") {
      graft.api.Ops.minhashDupPairs(docs, "doc_id", "text").count()
    }
  }
}
