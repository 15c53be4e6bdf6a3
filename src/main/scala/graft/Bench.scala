package graft
/** Per-round benchmark main: times every registered query at the given
  * scale factor and prints one JSON line. Session defaults come from
  * GraftSession.builder (single source of truth). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/classloading/parquet-reader paths on the tiny sf so
    // the first timed query doesn't absorb ~5s of fixed JVM startup cost.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q01_...,q02_... restricts the run (isolated timing)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(ns => SparkEntry.queries.filter(kv => ns(kv._1)))
    val results = selected.map { case (name, fn) =>
      // Driver-JVM hygiene between measurements: checkpoint/broadcast
      // blocks of PREVIOUS queries are freed by the ContextCleaner only
      // after their DataFrames are GC'd — without a nudge, a query deep
      // in the run can pay storage-memory pressure (block eviction/spill)
      // accrued by its hundred predecessors, which showed up as bimodal
      // 2 s / 13 s timings for the checkpoint-heavy pipeline queries.
      System.gc()
      val t0 = System.nanoTime()
      // a failed query reports -1 (not its elapsed-until-throw time, which
      // would read as a suspiciously fast success)
      val sec =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The harness's BENCH_r*.json keeps only a truncated tail of stdout,
    // which loses the first ~100 queries of the per-query map every round.
    // Persist the complete record to a file so regressions can be
    // adjudicated per-query without re-running the bench.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    try {
      Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(outPath, (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] could not persist $outPath: ${e.getMessage}") }
    // The r2 bench output was truncated from the FRONT, losing the leading
    // "metric":"total" field — repeat the total on its own compact line
    // after the big per-query map so the last line always survives.
    println(s"""{"total":$total}""")
    spark.stop()
  }
}
