package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Lake

/** Scratch diagnostic: prints each Spark job's callsite while running a
  * minimal init + append + read scenario, so the per-commit driver-job
  * budget can be decomposed line by line. Not part of any protocol. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.builder(8).config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = new AtomicLong(0)
    @volatile var tag = "init"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val cs = Option(js.properties).map(_.getProperty("callSite.short")).getOrElse("?")
        println(s"[job ${n.incrementAndGet()}] phase=$tag callsite=$cs")
      }
    })
    val out = java.nio.file.Files.createTempDirectory("jobtrace").toString
    val sharded = Tables(spark, sfDir, "documents")
      .withColumn("split", when(col("doc_id") % 10 < 8, "train").otherwise("val"))
      .withColumn("shard_id", (col("doc_id") % 4).cast("int"))
    tag = "init"
    Lake.init(spark, sharded.filter(col("doc_id") % 3 =!= 0), out, Seq("split", "shard_id"))
    org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
    println(s"== init done at job ${n.get()}")
    tag = "append"
    Lake.append(spark, out, sharded.filter(col("doc_id") % 3 === 0))
    org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
    println(s"== append done at job ${n.get()}")
    // decomposed append (same steps, tagged)
    locally {
      import org.apache.spark.sql.types.{DataType, StructType}
      val df2 = sharded.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + lit(90000000L))
      val base = Lake.adopt(spark, out)
      val lakeSchema = DataType.fromJson(base.schemaJson).asInstanceOf[StructType]
      tag = "a_checkpoint"
      val aligned = df2.select(lakeSchema.map(f => col(f.name).cast(f.dataType)): _*)
        .localCheckpoint(true)
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      tag = "a_count"
      val expected = aligned.count()
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      tag = "a_stage"
      val staged = Lake.stageWrite(spark, out, aligned, Seq("split", "shard_id"))
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      tag = "a_audit"
      val (rows, stats) = Lake.auditStaged(spark, out, base.schemaJson, staged, Seq.empty)
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      tag = "a_publish"
      Lake.publish(spark, Lake.StagedCommit(out, base, "append", base.schemaJson,
        Seq.empty, staged, rows, expected, stats))
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      println(s"== decomposed append done at job ${n.get()}")
    }
    tag = "read"
    println(Lake.read(spark, out).count())
    org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
    println(s"== read done at job ${n.get()}")
    spark.stop()
  }
}
