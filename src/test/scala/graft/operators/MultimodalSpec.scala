package graft.operators

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import Multimodal._

  test("decodeFeatures: schema, determinism, and per-media-type behavior") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3, 4)),
      MediaRow(2L, "audio", Array[Byte](5, 6)),
      MediaRow(3L, "video", new Array[Byte](2500))).toDS()
    val out = decodeFeatures(media).collect().sortBy(_.doc_id)

    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).channels == 3 && out(1).channels == 1)
    assert(out(2).n_frames == 3, "video frame-sampling stub: 2500 bytes / 1024 + 1")
    assert(out(0).mean_byte == (1 + 2 + 3 + 4) / 4.0)
    assert(out.forall(f => f.resized_w == 224 && f.resized_h == 224))
    // deterministic: same input, same features
    val again = decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(out.toSeq == again.toSeq)
  }

  test("decode runs partition-batched (one pass per partition, no collect)") {
    import spark.implicits._
    val n = 100
    val media = (1 to n).map(i => MediaRow(i.toLong, "image", Array.fill(i % 7 + 1)(i.toByte))).toDS()
      .repartition(8)
    val out = decodeFeatures(media)
    assert(out.rdd.getNumPartitions == 8, "decode must preserve partitioning")
    assert(out.count() == n)
  }
}
