package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}

/** The commit primitive behind [[Lake.commitDelta]]: atomically
  * materialize a log record at `target`, FAILING when the destination
  * already exists — put-if-absent, the single-writer-per-version guard
  * of the whole OCC protocol. Every failure throws an
  * `IllegalStateException` whose message starts with `"concurrent
  * commit"`, which is the contract [[Lake.publish]]'s rebase loop keys
  * on.
  *
  * Backends differ in what atomic primitive they offer, so the choice is
  * a per-filesystem SEAM rather than a comment in the commit path:
  *
  *   - HDFS-style filesystems: `create(target, overwrite = false)` is an
  *     atomic exclusive-create in the namenode — [[ExclusiveCreateLogStore]].
  *   - POSIX / `RawLocalFileSystem`: rename OVERWRITES and exclusive
  *     create is check-then-act, so [[RenameReadBackLogStore]] serializes
  *     same-JVM writers on a striped in-process lock (Delta's
  *     `LocalLogStore` design) AND cross-process writers on an OS
  *     `FileLock` over a dotfile in the log dir — put-if-absent is
  *     EXACT for every local writer. The content read-back survives as
  *     the backstop for non-local schemes without an OS lock.
  *   - Object stores (S3/GCS/ABFS): the contract to implement here is a
  *     CONDITIONAL PUT — `If-None-Match: *` / `x-goog-if-generation-match:
  *     0` / `If-None-Match` preconditions respectively — mapping a
  *     precondition-failed response to the `"concurrent commit"` error.
  *     No such backend ships in this build (no cloud connectors in the
  *     container), but the seam is the one-class extension point.
  */
private[graft] trait LogStore { // open: the object-store impl extends here
  /** Write `payload` at `target` if and only if nothing is there; throws
    * `IllegalStateException("concurrent commit: ...")` when the version
    * was raced by another writer. `log` is the directory holding the
    * record (already created). */
  def putIfAbsent(fs: FileSystem, log: Path, target: Path, payload: String): Unit
}

private[graft] object LogStore {
  /** Scheme-keyed selection: exclusive-create where the filesystem
    * guarantees its atomicity (HDFS and kin), rename+read-back
    * everywhere else (local/POSIX — the test default). */
  def forFileSystem(fs: FileSystem): LogStore = fs.getScheme match {
    case "hdfs" | "webhdfs" | "viewfs" => ExclusiveCreateLogStore
    case _ => RenameReadBackLogStore
  }
}

/** Atomic exclusive-create: one namenode round-trip decides the race. */
private[graft] object ExclusiveCreateLogStore extends LogStore {
  override def putIfAbsent(fs: FileSystem, log: Path, target: Path,
      payload: String): Unit = {
    val out =
      try fs.create(target, false)
      catch {
        case _: FileAlreadyExistsException | _: org.apache.hadoop.fs.PathExistsException =>
          throw new IllegalStateException(
            s"concurrent commit: manifest version already exists at $target")
      }
    try out.write(payload.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}

/** Exists-check + temp-file rename + content read-back, for filesystems
  * whose rename overwrites (POSIX).
  *
  * SAME-JVM racers are fully serialized by a striped in-process lock
  * (Delta's `LocalLogStore` design), and on a `file:` filesystem
  * CROSS-PROCESS racers are serialized too: the exists-check/rename/
  * read-back window runs under an OS-level [[java.nio.channels.FileLock]]
  * on a `.commit.lock` dotfile inside the log dir (the name parses as
  * neither delta nor checkpoint, so every log reader ignores it) —
  * put-if-absent is EXACT for every local writer, in-process or not.
  * The content read-back stays as the backstop for NON-local,
  * non-HDFS filesystems where an OS lock has no meaning. */
private[graft] object RenameReadBackLogStore extends LogStore {
  // striped, not per-path: bounded memory over an unbounded commit
  // history; a hash collision only widens a critical section. Keyed on
  // the LOG DIR (one lake's commits serialize — they race for
  // consecutive versions anyway), which also guarantees the OS FileLock
  // below is only ever acquired by ONE thread of this JVM per log —
  // a second same-JVM acquisition would throw
  // OverlappingFileLockException instead of waiting.
  private val stripes = Array.fill(64)(new Object)

  override def putIfAbsent(fs: FileSystem, log: Path, target: Path,
      payload: String): Unit = {
    // stripe on the QUALIFIED uri: 'file:/x/_log' and '/x/_log' are one
    // directory — keying on the raw spelling would hash them to
    // different stripes and silently bypass the exact same-JVM
    // put-if-absent for differently-qualified callers
    val logUri = fs.makeQualified(log).toUri
    stripes(math.floorMod(logUri.toString.hashCode, stripes.length)).synchronized {
      withProcessLock(logUri) {
        if (fs.exists(target))
          throw new IllegalStateException(
            s"concurrent commit: manifest version already exists at $target")
        val tmp = new Path(log, s".tmp-${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, false)
        try out.write(payload.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        if (!fs.rename(tmp, target)) {
          fs.delete(tmp, false)
          throw new IllegalStateException(
            s"concurrent commit: rename to $target failed (version raced by another writer)")
        }
        val back = {
          val in = fs.open(target)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        }
        if (back != payload)
          throw new IllegalStateException(
            s"concurrent commit: $target was clobbered by another writer after rename " +
              "(overwrite-on-rename filesystem) — this commit lost")
      }
    }
  }

  /** Run `body` holding an exclusive OS file lock on `<log>/.commit.lock`
    * when the log lives on the local filesystem — the lock a FOREIGN
    * process's writer contends on, closing the residual clobber window
    * the in-JVM stripe cannot see. `FileChannel.lock()` BLOCKS until the
    * other process releases (commit critical sections are tiny), and the
    * outer stripe guarantees single-threaded acquisition within this JVM.
    * Non-`file:` schemes run `body` directly: the read-back stays their
    * backstop. */
  private def withProcessLock[T](logUri: java.net.URI)(body: => T): T = {
    if (logUri.getScheme != "file") return body
    val dir = java.nio.file.Paths.get(logUri.getPath)
    java.nio.file.Files.createDirectories(dir)
    val ch = java.nio.channels.FileChannel.open(dir.resolve(".commit.lock"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try body finally lock.release()
    } finally ch.close()
  }
}
