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
  *     SAME-JVM writers on a striped in-process lock (exact put-if-absent
  *     for every racer a `local[n]` deployment can have — Delta's
  *     `LocalLogStore` design) and renames a temp file in with a content
  *     READ-BACK as the cross-process backstop. The residual window is
  *     now cross-PROCESS only (a foreign writer clobbering after this
  *     one's read-back passed) — accepted for local filesystems.
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
  * SAME-JVM racers — the only writers a `local[n]` deployment has — are
  * fully serialized by a striped in-process lock, making put-if-absent
  * EXACT there (Delta's `LocalLogStore` closes the identical gap the
  * identical way: an in-JVM lock, multi-process local writers declared
  * out of scope). The read-back stays as the cross-PROCESS backstop:
  * a foreign writer clobbering after this writer's rename is caught by
  * the content mismatch, with the (documented) residue that a clobber
  * landing after a PASSED read-back goes unseen — best-effort by
  * nature on an overwrite-on-rename filesystem. */
private[graft] object RenameReadBackLogStore extends LogStore {
  // striped, not per-path: bounded memory over an unbounded commit
  // history; a hash collision only widens a critical section
  private val stripes = Array.fill(64)(new Object)

  override def putIfAbsent(fs: FileSystem, log: Path, target: Path,
      payload: String): Unit =
    stripes(math.floorMod(target.toString.hashCode, stripes.length)).synchronized {
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
