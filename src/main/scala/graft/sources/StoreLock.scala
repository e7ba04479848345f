package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process COMMIT ARBITRATION for the durable stores — the gap
  * every store so far left open by contract: marker-last / rename
  * publication makes a single writer crash-safe and a retry
  * idempotent, but nothing stopped two SIMULTANEOUS writers from
  * interleaving their publishes (writer A truncates, writer B
  * truncates, A lands half its files, B lands the rest → a mixed
  * artifact from two jobs, each individually "successful"). A shared
  * warehouse hits this in week one.
  *
  * Mechanism: an exclusive LEASE FILE on the artifact's own
  * filesystem, acquired with an atomic create-if-absent (O_EXCL via
  * `File.createNewFile` on local paths; `FileSystem.create(p,
  * overwrite=false)` elsewhere — atomic on HDFS, whose namenode
  * serializes creates). Two arbitration modes, matching the two kinds
  * of writer:
  *
  *  - **fail-clean** (`wait = false`, the commit paths): the loser
  *    throws [[ConcurrentWriteException]] BEFORE touching the
  *    destination — its staged work is never published (the DSv2
  *    abort path deletes staging; saveAsTable commits never start),
  *    so the loser's artifact never becomes visible. Retrying after
  *    the winner finishes is the caller's policy, exactly like any
  *    optimistic-concurrency lake commit.
  *  - **wait-and-serve** (`wait = true`, the load-or-build paths):
  *    the loser polls until the winner releases, then re-checks for
  *    the winner's completed artifact and SERVES it instead of
  *    double-building — closing the cross-process half of the
  *    trainMemo double-build note (the in-process half is the memo's
  *    own build lock).
  *
  * Liveness: a crashed winner leaves a stale lease. A lease older
  * than `leaseMs` (mtime-based; default 15 min, conf
  * `spark.graft.commitLeaseMs`) is broken and re-contended — the
  * standard lease compromise: long enough that no live commit ever
  * exceeds it, short enough that a crash doesn't wedge the store. A
  * waiter also gives up (fail-clean) after `leaseMs` so an
  * interactive session can't hang forever. */
object StoreLock {

  class ConcurrentWriteException(msg: String)
    extends RuntimeException(msg)

  val DefaultLeaseMs = 900000L

  /** Lease duration from the session conf (milliseconds). */
  def leaseMs(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("spark.graft.commitLeaseMs",
      DefaultLeaseMs.toString).toLong

  /** Atomic create-if-absent. RawLocalFileSystem's create(p, false) is
    * a non-atomic exists-then-create (TOCTOU), so local paths go
    * through File.createNewFile — O_EXCL at the syscall level. */
  private def tryAcquire(fs: FileSystem, lock: Path): Boolean = {
    fs.mkdirs(lock.getParent)
    if (fs.getScheme == "file")
      new java.io.File(lock.toUri.getPath).createNewFile()
    else
      try { fs.create(lock, false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  /** Age of the lease in ms, or -1 if it vanished (released between
    * our failed acquire and this probe — re-contend immediately). */
  private def ageMs(fs: FileSystem, lock: Path): Long =
    try System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
    catch { case _: java.io.FileNotFoundException => -1L }

  /** Exclusive commit lease for a named catalog store (LabelStore /
    * SketchStore / GraphStore tables): the lease file lives under the
    * session warehouse (`_graft_locks/<name>.lock`), so every writer
    * to a shared warehouse contends on the same filesystem the tables
    * live on. Fail-clean mode — the loser throws before any table
    * write starts, so a half-interleaved multi-table commit (batch A's
    * sketches under batch B's labels) cannot exist. */
  def withStoreLease[A](spark: org.apache.spark.sql.SparkSession,
      name: String)(body: => A): A = {
    val lock = new Path(
      new Path(spark.sessionState.conf.warehousePath),
      s"_graft_locks/$name.lock")
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    withLease(fs, lock, leaseMs(spark), wait = false)(body)
  }

  /** Run `body` under the exclusive lease at `lock`. */
  def withLease[A](fs: FileSystem, lock: Path, leaseMs: Long,
      wait: Boolean)(body: => A): A = {
    val deadline = System.currentTimeMillis() + leaseMs
    var acquired = tryAcquire(fs, lock)
    while (!acquired) {
      val age = ageMs(fs, lock)
      if (age > leaseMs) {
        // stale lease from a crashed writer: break it and re-contend
        // (delete-then-create is a race among breakers, but every
        // breaker re-contends through the atomic create, so exactly
        // one wins)
        fs.delete(lock, false)
      } else if (age >= 0 && !wait) {
        throw new ConcurrentWriteException(
          s"another writer holds $lock (age ${age} ms); " +
            "this commit published nothing")
      } else if (System.currentTimeMillis() > deadline) {
        throw new ConcurrentWriteException(
          s"gave up waiting for $lock after $leaseMs ms")
      } else if (age >= 0) {
        Thread.sleep(100)
      }
      acquired = tryAcquire(fs, lock)
    }
    try body finally fs.delete(lock, false)
  }
}
