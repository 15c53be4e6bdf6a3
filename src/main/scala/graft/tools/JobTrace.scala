package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Lake

/** Scratch diagnostic: prints each Spark job's index per tagged phase
  * while running a minimal lake scenario, so a per-commit driver-job
  * budget can be decomposed line by line (the px115 job table in
  * SURVEY §8 came from this). Not part of any protocol. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.builder(8).config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = new AtomicLong(0)
    @volatile var tag = "warmup"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        println(s"[job ${n.incrementAndGet()}] phase=$tag")
    })
    def drain(): Unit = org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
    // warm up (mirror Bench)
    graft.SparkEntry.entry(spark).count(); drain()
    n.set(0)

    // ---- px115 decomposed
    val out = java.nio.file.Files.createTempDirectory("jt115").toString + "/lake"
    val sharded = Tables(spark, sfDir, "documents")
      .withColumn("split", when(col("doc_id") % 10 < 8, "train").otherwise("val"))
      .withColumn("shard_id", (col("doc_id") % 4).cast("int"))
    locally { // init decomposed (mirror of Lake.init's body)
      val df = sharded.filter(col("doc_id") % 3 =!= 0)
      tag = "init_stage"
      val files = Lake.stageWrite(spark, out, df, Seq("split", "shard_id"))
      drain(); println(s"== init_stage: ${n.get()} files=${files.size}")
      tag = "init_schema"
      val schemaJson = Lake.readFiles(spark, out, df.schema.json, files).schema.json
      drain(); println(s"== init_schema: ${n.get()}")
      tag = "init_audit"
      val stats = Lake.auditStaged(spark, out, schemaJson, files, Seq.empty)._2
      drain(); println(s"== init_audit: ${n.get()}")
      tag = "init_commit"
      Lake.commitDelta(spark, out,
        Lake.DeltaRecord(1L, "init", schemaJson,
          files.map(f => f -> stats.getOrElse(f, Seq.empty)), Seq.empty,
          layout = Some(Seq("split", "shard_id"))),
        Some(Lake.LakeState(1L, schemaJson, files.sorted, stats,
          layout = Some(Seq("split", "shard_id")))))
      drain(); println(s"== init_commit: ${n.get()}")
      tag = "init_read"
      Lake.read(spark, out)
      drain(); println(s"== init_read: ${n.get()}")
    }
    tag = "create"
    spark.sql("DROP TABLE IF EXISTS jt115_corpus")
    spark.sql(s"CREATE TABLE jt115_corpus USING `graft-lake` OPTIONS (path '$out')")
    drain(); println(s"== create: ${n.get()}")
    tag = "insert"
    sharded.filter(col("doc_id") % 3 === 0).createOrReplaceTempView("jt115_batch")
    spark.sql("INSERT INTO jt115_corpus BY NAME SELECT * FROM jt115_batch")
    drain(); println(s"== insert: ${n.get()}")
    spark.sql("DROP TABLE IF EXISTS jt115_corpus")
    tag = "read"
    println(Lake.read(spark, out)
      .groupBy("split", "shard_id").agg(count(lit(1)).as("n")).count())
    drain(); println(s"== read: ${n.get()}")
    // does Dataset.observe fire on an EAGER localCheckpoint action?
    tag = "obsckpt"
    val obs2 = new org.apache.spark.sql.Observation("jt-obs")
    val ckpt = spark.range(100).toDF("id")
      .observe(obs2, count(lit(1)).as("n")).localCheckpoint(true)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    try {
      val m = Await.result(Future(obs2.get), 15.seconds)
      println(s"== observe-on-localCheckpoint fired: $m")
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        println("== observe-on-localCheckpoint DID NOT fire (timeout)")
    }
    drain(); println(s"== obsckpt: ${n.get()} (ckpt rows=${ckpt.count()})")
    spark.stop()
  }
}
