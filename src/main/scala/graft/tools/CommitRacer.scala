package graft.tools

import org.apache.hadoop.fs.Path

import graft.operators.RenameReadBackLogStore

/** Subprocess half of the cross-PROCESS put-if-absent race spec: a tiny
  * main (no SparkSession) that waits on a `go` file so every racing JVM
  * is booted before the race starts, then attempts to commit versions
  * `1..n` of the given log as fast as it can, printing `WON <v>` for
  * each version it landed. The spec spawns several of these against an
  * in-JVM racer and asserts exactly one winner per version — the
  * guarantee [[RenameReadBackLogStore]]'s OS `FileLock` provides that
  * a same-JVM striped lock alone cannot.
  *
  * Exit codes: 0 = ran the whole loop (wins on stdout); 1 = unexpected
  * error (a race loss is NOT an error — it must be the loud
  * `"concurrent commit"` refusal, anything else fails the spec). */
object CommitRacer {
  def main(args: Array[String]): Unit = {
    val Array(logDir, goFile, racerId, nVersions) = args
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(java.nio.file.Paths.get(goFile))) {
      if (System.nanoTime() > deadline) { System.err.println("go file never appeared"); sys.exit(1) }
      Thread.sleep(5)
    }
    val log = new Path(logDir)
    val fs = log.getFileSystem(new org.apache.hadoop.conf.Configuration())
    try {
      (1L to nVersions.toLong).foreach { v =>
        try {
          RenameReadBackLogStore.putIfAbsent(fs, log, new Path(log, s"v$v.manifest"),
            s"racer-$racerId-v$v")
          println(s"WON $v")
        } catch {
          case e: IllegalStateException if e.getMessage.startsWith("concurrent commit") => ()
        }
      }
      sys.exit(0)
    } catch {
      case e: Throwable => e.printStackTrace(); sys.exit(1)
    }
  }
}
