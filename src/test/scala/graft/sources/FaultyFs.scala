package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Fault-injecting filesystem (`faulty://`): a local FS whose semantics are
  * deliberately degraded to an OBJECT-STORE's weak contract — the two trap
  * patterns this repo hit for real on RawLocalFileSystem, formalized:
  *
  *  - `create(overwrite = false)` is CHECK-THEN-CREATE with a widened
  *    window (the round-13 commit-lock race: two committers both pass the
  *    exists() check and both "hold" the lock);
  *  - `rename` onto an existing destination is DELETE-THEN-RENAME with a
  *    visibility gap (the round-12 no-manifest window).
  *
  * Registered by ServiceLoader (META-INF/services), so every code path —
  * including executor-side `new Configuration()` resolutions — finds it.
  * The fault-injection spec runs the 8-way commit race on this filesystem:
  * the default `fs` lock provider is unsafe here BY CONSTRUCTION, and the
  * `cas` coordinator provider must keep every commit intact anyway.
  */
class FaultyFs extends RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: URI = URI.create("faulty:///")

  private def nonAtomicExclusiveCheck(f: Path, overwrite: Boolean): Unit =
    if (!overwrite) {
      if (exists(f))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      Thread.sleep(3) // widen the check-then-create window
    }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    nonAtomicExclusiveCheck(f, overwrite)
    // overwrite = true past the check: BOTH racers succeed — the trap
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    nonAtomicExclusiveCheck(f, overwrite)
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) {
      delete(dst, false)
      Thread.sleep(2) // the destination-missing visibility gap
    }
    super.rename(src, dst)
  }
}

/** FileContext binding for `faulty://` (AbstractFileSystem has no
  * ServiceLoader discovery — the spec wires `fs.AbstractFileSystem.faulty
  * .impl` to this class). */
class FaultyAbstractFs(uri: URI, conf: Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new FaultyFs, conf, "faulty", false)
