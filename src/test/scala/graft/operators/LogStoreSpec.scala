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
}
