package graft.repl

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}

/** Advisory locks as atomic-create marker files on Hadoop FileSystem.
  *
  * Replaces the reference's two locking layers — the local pidfile per-db
  * instance lock with stale-pid detection
  * (`/root/reference/misc_functions.sh:151-183`) and the global dump lock
  * (`/root/reference/beeline_functions.sh:92-101`) — with a cluster-visible
  * primitive: `FileSystem.create(path, overwrite = false)` is atomic on
  * HDFS, so exactly one runner wins. Staleness is judged by the marker's
  * modification time (a heartbeat), not a pid: pids are meaningless across
  * cluster nodes.
  */
object Locks {

  final case class Lock(fs: FileSystem, path: Path, ownerId: String) {
    def release(): Unit =
      if (fs.exists(path) && readOwner(fs, path) == ownerId) fs.delete(path, false)
  }

  private def readOwner(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](256)
      val n = in.read(bytes)
      if (n <= 0) "" else new String(bytes, 0, n, StandardCharsets.UTF_8).trim
    } finally in.close()
  }

  /** Try to acquire; steals the lock if the holder's marker is older than
    * `staleMs` (crashed holder — the reference's stale-pid case,
    * `misc_functions.sh:163-176`).
    */
  def tryAcquire(fs: FileSystem, path: Path, ownerId: String, staleMs: Long): Option[Lock] = {
    def create(): Boolean =
      try {
        fs.mkdirs(path.getParent)
        val out = fs.create(path, false) // atomic create-if-absent
        try out.write(ownerId.getBytes(StandardCharsets.UTF_8)) finally out.close()
        true
      } catch { case _: java.io.IOException => false }

    if (create()) Some(Lock(fs, path, ownerId))
    else {
      val st = try Some(fs.getFileStatus(path)) catch { case _: java.io.IOException => None }
      val stale = st.exists(s => System.currentTimeMillis() - s.getModificationTime > staleMs)
      if (stale) {
        fs.delete(path, false)
        if (create()) Some(Lock(fs, path, ownerId)) else None
      } else None
    }
  }

  /** Acquire-or-throw, mirroring the reference's "another instance running →
    * exit" behavior (`misc_functions.sh:158-162`).
    */
  def acquire(fs: FileSystem, path: Path, ownerId: String, staleMs: Long): Lock =
    tryAcquire(fs, path, ownerId, staleMs).getOrElse(
      throw new IllegalStateException(s"lock busy: $path (held by ${readOwner(fs, path)})"))
}
