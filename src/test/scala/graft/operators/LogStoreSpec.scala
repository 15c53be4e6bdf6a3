package graft.operators

import org.apache.hadoop.fs.Path

import graft.SparkTestBase

/** The commit primitive's per-filesystem seam: both shipped stores must
  * implement the same contract — payload lands if and only if the
  * destination was absent, and every race loss is a loud `"concurrent
  * commit"` error — so [[Lake.publish]]'s rebase loop works unchanged
  * through either. */
class LogStoreSpec extends SparkTestBase {

  private def freshLog(): (org.apache.hadoop.fs.FileSystem, Path) = {
    val dir = java.nio.file.Files.createTempDirectory("logstore").toString
    val p = new Path(dir, "_graft_log")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p)
    (fs, fs.makeQualified(p))
  }

  private def readBack(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  for (store <- Seq(RenameReadBackLogStore, ExclusiveCreateLogStore)) {
    val name = store.getClass.getSimpleName.stripSuffix("$")
    test(s"$name: put-if-absent lands the payload once and refuses the second writer loudly") {
      val (fs, log) = freshLog()
      val target = new Path(log, "v1.manifest")
      store.putIfAbsent(fs, log, target, "first-writer-payload")
      assert(readBack(fs, target) == "first-writer-payload")
      val e = intercept[IllegalStateException] {
        store.putIfAbsent(fs, log, target, "second-writer-payload")
      }
      assert(e.getMessage.startsWith("concurrent commit"),
        s"the rebase loop keys on the message prefix, got: ${e.getMessage}")
      assert(readBack(fs, target) == "first-writer-payload",
        "the loser must never clobber the landed record")
    }
  }

  test("the local filesystem selects the rename+read-back store (exclusive create is not atomic there)") {
    val (fs, _) = freshLog()
    assert(LogStore.forFileSystem(fs) eq RenameReadBackLogStore)
  }

  test("cross-PROCESS race: spawned subprocess writers vs an in-JVM writer — " +
      "exactly one winner per version, every loser loud (OS FileLock, not read-back luck)") {
    val (fs, log) = freshLog()
    val nVersions = 8
    val nProcs = 2
    val goFile = java.nio.file.Files.createTempDirectory("racer").resolve("go")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val procs = (1 to nProcs).map { id =>
      val pb = new ProcessBuilder(javaBin, "-cp", cp, "graft.tools.CommitRacer",
        log.toString, goFile.toString, s"p$id", nVersions.toString)
      pb.redirectErrorStream(false)
      pb.start()
    }
    // the in-JVM racer reports its wins the same way the subprocesses do
    val jvmWins = scala.collection.mutable.Set[Long]()
    val jvmRacer = new Thread(() => {
      (1L to nVersions).foreach { v =>
        try {
          RenameReadBackLogStore.putIfAbsent(fs, log, new Path(log, s"v$v.manifest"),
            s"racer-jvm-v$v")
          jvmWins.synchronized { jvmWins += v }
        } catch {
          case e: IllegalStateException if e.getMessage.startsWith("concurrent commit") => ()
        }
      }
    })
    // wait for both subprocess JVMs to boot, then fire the gun with the
    // in-JVM racer already running — all three interleave across versions
    Thread.sleep(3000)
    jvmRacer.start()
    java.nio.file.Files.createFile(goFile)
    val outs = procs.map { p =>
      val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8").mkString
      assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "racer subprocess hung")
      assert(p.exitValue() == 0,
        s"racer subprocess failed (exit ${p.exitValue()}): a race loss must be the loud " +
          "'concurrent commit' refusal, never an unexpected error")
      out
    }
    jvmRacer.join(60000)
    val subWins: Seq[(Int, Long)] = outs.zipWithIndex.flatMap { case (out, i) =>
      out.linesIterator.collect { case s if s.startsWith("WON ") => (i + 1, s.drop(4).trim.toLong) }
    }
    (1L to nVersions).foreach { v =>
      val claimants =
        subWins.collect { case (id, `v`) => s"p$id" } ++
          (if (jvmWins.synchronized(jvmWins(v))) Seq("jvm") else Nil)
      assert(claimants.size == 1,
        s"version $v must have exactly ONE winner, got: ${claimants.mkString(", ")}")
      val content = readBack(fs, new Path(log, s"v$v.manifest"))
      assert(content == s"racer-${claimants.head}-v$v",
        s"version $v's landed payload ($content) must be the claimed winner's " +
          s"(racer-${claimants.head}-v$v) — a clobber slipped through")
    }
  }
}
