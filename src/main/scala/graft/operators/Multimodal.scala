package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.TextHash

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata, processed batch-at-a-time with `mapPartitions`
  * over a typed Dataset (the Scala analogue of a batched Pandas UDF —
  * one decoder instance per partition, streaming rows through it).
  *
  * The container has no image/audio codecs, so `FakeCodec.decode` is a
  * clearly-marked deterministic STUB; everything Spark-side — schema,
  * partitioning, batch shape, feature extraction contract — is real and
  * tested, and swapping a real decoder in changes only the stub body.
  */
object Multimodal {

  /** Input row: media payload as an opaque binary column. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Output row: decoded metadata + extracted features. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      channels: Int,
      n_frames: Int,
      mean_byte: Double,
      resized_w: Int,
      resized_h: Int)

  /** STUB decoder: a real implementation would link an image/audio codec
    * here. This fake is deterministic in the payload bytes only.
    */
  object FakeCodec {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length
      val width = (n % 640) + 16
      val height = ((n.toLong * 7919L) % 480).toInt + 16
      val channels = if (r.media_type == "image") 3 else 1
      val nFrames = if (r.media_type == "video") (n / 1024) + 1 else 1
      var sum = 0L
      var i = 0
      while (i < n) { sum += (r.payload(i) & 0xff); i += 1 }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      // "resize" stub: target 224x224, metadata-only.
      MediaFeatures(r.doc_id, r.media_type, width, height, channels, nFrames, mean, 224, 224)
    }
  }

  /** Batched decode: one codec per partition, rows streamed through. */
  def decodeFeatures(media: org.apache.spark.sql.Dataset[MediaRow]): org.apache.spark.sql.Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup (a real codec would init native resources here)
      it.map(FakeCodec.decode)
    }
  }

  /** mm36: derive a binary payload column from documents (stand-in for a
    * real media column), run the batched decode, return the feature table. */
  private def mm36(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
    decodeFeatures(media).toDF().orderBy("doc_id")
  }

  /** The stub codec is arithmetic in the payload bytes, so the whole
    * decode pipeline — media-type routing, batched mapPartitions decode,
    * feature schema — is oracle-checkable in SQL. Oracle caveat: mean_byte
    * is expressed over character codepoints, equal to the engine's
    * byte-wise mean only for ASCII payloads (true of this corpus). A real
    * codec would drop back to the rows-only check. */
  private val mm36Oracle =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    CAST(strlen(text) AS INTEGER) AS n, text
      |  FROM documents)
      |SELECT doc_id, media_type,
      |  CAST(n % 640 + 16 AS INTEGER) AS width,
      |  CAST((CAST(n AS BIGINT) * 7919) % 480 + 16 AS INTEGER) AS height,
      |  CAST(CASE WHEN media_type = 'image' THEN 3 ELSE 1 END AS INTEGER) AS channels,
      |  CAST(CASE WHEN media_type = 'video' THEN n // 1024 + 1 ELSE 1 END AS INTEGER) AS n_frames,
      |  CASE WHEN n > 0
      |       THEN CAST(list_sum(list_transform(range(1, n + 1), i -> ord(substr(text, i, 1)))) AS DOUBLE) / n
      |       ELSE CAST(0 AS DOUBLE) END AS mean_byte,
      |  CAST(224 AS INTEGER) AS resized_w, CAST(224 AS INTEGER) AS resized_h
      |FROM m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- mm37
  /** Binary-column plumbing without the decode step: payload byte length
    * (octet_length, NOT character length — they diverge the moment a
    * payload is non-ASCII) and content digests, aggregated per source.
    * The partition-friendly shape for media manifests: metadata stats
    * never deserialize the payload beyond the scan. */
  private def mm37(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("source"), encode(col("text"), "UTF-8").as("payload"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(octet_length(col("payload"))).as("sum_bytes"),
        min(md5(col("payload"))).as("min_md5"))
      .orderBy("source")

  private val mm37Oracle =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(strlen(text)) AS BIGINT) AS sum_bytes,
      |  MIN(md5(text)) AS min_md5
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- mm38
  /** Frame sampling: each video payload (n_frames = bytes/1024 + 1, the
    * FakeCodec convention) expands to every-5th-frame rows via a
    * sequence() generator — the decode-k-frames-per-clip shape. The
    * generator is codegen'd and the expansion factor is bounded by the
    * stride, so the op stays linear in sampled (not total) frames; a real
    * decoder slots into a mapPartitions over these (doc_id, frame_idx)
    * rows exactly like [[decodeFeatures]]. */
  private def mm38(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 2) // the video rows under mm36's routing
      .select(
        col("doc_id"),
        (octet_length(col("text")).cast("int") / 1024 + 1).cast("int").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(expr("sequence(0, n_frames - 1, 5)")).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  private val mm38Oracle =
    """WITH v AS (
      |  SELECT doc_id, CAST(strlen(text) // 1024 + 1 AS INTEGER) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT doc_id, n_frames,
      |  CAST(unnest(generate_series(0, n_frames - 1, 5)) AS INTEGER) AS frame_idx
      |FROM v ORDER BY doc_id, frame_idx""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("mm36_multimodal_features", mm36, Some(mm36Oracle)),
    GraftQuery("mm37_binary_manifest", mm37, Some(mm37Oracle)),
    GraftQuery("mm38_frame_sample", mm38, Some(mm38Oracle)))
}
