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
    /** Delete only a marker we still own; a marker stolen after staleness
      * is left alone. The read-then-delete pair is still a (tiny) race —
      * acceptable for an ADVISORY lock: the worst case is deleting a marker
      * stolen in the last few ms, which the thief's own release tolerates.
      */
    def release(): Unit =
      if (fs.exists(path) && readOwner(fs, path) == ownerId) fs.delete(path, false)

    /** Heartbeat: touch the marker's mtime so a long-running holder is not
      * judged stale and stolen mid-run. Callers refresh between phases
      * (`staleMs` then only needs to exceed the longest single phase, not
      * the whole run).
      */
    def refresh(): Unit =
      if (fs.exists(path) && readOwner(fs, path) == ownerId)
        fs.setTimes(path, System.currentTimeMillis(), -1)
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
        // Atomic takeover: rename the stale marker ASIDE (to a per-contender
        // name) rather than delete-then-create — rename succeeds for at most
        // one contender, so two racers can never both clear the way and both
        // create. After the rename, verify the captured marker is the SAME
        // one judged stale (mtime is preserved by rename); if the holder
        // replaced it in between, put it back and lose.
        val aside = new Path(path.getParent, s"_stale_${path.getName}_$ownerId")
        val renamed = try fs.rename(path, aside)
          catch { case _: java.io.IOException => false }
        if (!renamed) None
        else {
          val mt = try Some(fs.getFileStatus(aside).getModificationTime)
            catch { case _: java.io.IOException => None }
          if (!mt.contains(st.get.getModificationTime)) {
            try { fs.rename(aside, path); () }
            catch { case _: java.io.IOException => () }
            None
          } else {
            fs.delete(aside, false)
            if (create()) Some(Lock(fs, path, ownerId)) else None
          }
        }
      } else None
    }
  }

  /** Acquire-or-throw, mirroring the reference's "another instance running →
    * exit" behavior (`misc_functions.sh:158-162`).
    */
  def acquire(fs: FileSystem, path: Path, ownerId: String, staleMs: Long): Lock =
    tryAcquire(fs, path, ownerId, staleMs).getOrElse(
      throw new LockBusyException(s"lock busy: $path (held by ${readOwner(fs, path)})"))
}

/** A lock held elsewhere — a BENIGN condition callers branch on (a sweep
  * skips the db, like the reference's "another instance running" exit path).
  * A typed class, not a message prefix: string matching would silently turn
  * benign skips into errors the moment the message changes.
  */
final class LockBusyException(msg: String) extends IllegalStateException(msg)
