package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Table-level commit lock for the partition-swap committers.
  *
  * The swap phase of a partition-scoped commit is a sequence of
  * directory renames; two writers interleaving swaps (or a repair
  * racing a live swap's `_prev.` window) could strand a commit's data.
  * The lock makes the SWAP PHASE mutually exclusive per table — the
  * expensive part of a commit (merge + staging write) runs unlocked and
  * concurrent, so disjoint writers overlap on all the real work and
  * serialize only on renames (milliseconds).
  *
  * Protocol: a QUEUE lock over globally-unique claim files, not a
  * single fixed-name lock file. Each acquirer exclusive-creates
  * `_graft_commit_lock.claim.<zero-padded-millis>.<uuid>` and holds
  * the lock exactly while its claim is the lexicographically smallest
  * ALIVE (younger than [[StaleLockMs]]) claim. A crashed holder's
  * claim ages past the TTL and is thereafter ignored and garbage-
  * collected. Because claim names embed a UUID and are NEVER reused, a
  * GC delete can never remove a fresh lock that re-landed under the
  * same name — the delete-then-create TOCTOU of fixed-name stale-lock
  * breaking (two waiters both judging the old lock stale; the slower
  * one deleting the faster one's fresh lock) cannot occur by
  * construction. The only remaining cross-writer assumption is the
  * lease itself: a holder must finish its swap within [[StaleLockMs]]
  * (renames are ms-scale against a 1 h TTL).
  *
  * Multi-table transactions (the promote pair) acquire in sorted-path
  * order, so two transactions over the same tables cannot deadlock. */
object CommitLock {

  val LockName = "_graft_commit_lock"

  private val ClaimPrefix = LockName + ".claim."

  /** A claim older than this is a crashed holder's leftover. */
  val StaleLockMs: Long = Versioned.StaleClaimMs

  /** How long an acquirer waits before giving up. */
  val AcquireTimeoutMs: Long = 60L * 1000L

  /** Exclusive-create CAS, atomic on BOTH HDFS-like stores and the
    * local filesystem. `FileSystem.create(f, overwrite=false)` is
    * atomic on HDFS (namenode arbitration) but CHECK-THEN-ACT on
    * Hadoop's LocalFileSystem — concurrent creators racing within the
    * exists/create gap can all "win". For `file://` paths go straight
    * to POSIX `O_CREAT|O_EXCL` via `File.createNewFile`, which the
    * kernel arbitrates. Returns true iff this caller created the file. */
  def atomicCreate(fs: FileSystem, path: Path): Boolean = {
    val q = fs.makeQualified(path)
    if (q.toUri.getScheme == "file") {
      val f = new java.io.File(q.toUri.getPath)
      val parent = f.getParentFile
      if (parent != null && !parent.exists()) parent.mkdirs()
      try f.createNewFile()
      catch { case _: java.io.IOException => false }
    } else {
      try { fs.create(q, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }

  private def acquire(fs: FileSystem, table: Path): Path = {
    if (!fs.exists(table)) fs.mkdirs(table)
    // Enqueue: a claim whose name is unique forever. Zero-padded millis
    // give lexicographic = arrival order; the UUID breaks same-ms ties
    // and guarantees no name is ever created twice.
    var myClaim: Path = null
    while (myClaim == null) {
      val name = ClaimPrefix +
        f"${System.currentTimeMillis()}%020d." +
        java.util.UUID.randomUUID().toString
      val p = new Path(table, name)
      if (atomicCreate(fs, p)) myClaim = p
    }
    val deadline = System.currentTimeMillis() + AcquireTimeoutMs
    try {
      while (true) {
        val now = System.currentTimeMillis()
        val claims = fs.listStatus(table)
          .filter(s => s.isFile && s.getPath.getName.startsWith(ClaimPrefix))
        val (alive, dead) =
          claims.partition(c => now - c.getModificationTime <= StaleLockMs)
        // GC crashed holders' leftovers. Safe: claim names are never
        // reused, so this delete cannot hit a fresh re-creation.
        dead.foreach { c =>
          try fs.delete(c.getPath, false)
          catch { case _: java.io.IOException => () }
        }
        if (alive.map(_.getPath.getName).min == myClaim.getName)
          return myClaim
        if (now > deadline)
          throw new java.util.ConcurrentModificationException(
            s"CommitLock: could not acquire $myClaim within " +
              s"$AcquireTimeoutMs ms — concurrent committer stuck?")
        Thread.sleep(50)
      }
      myClaim // unreachable; keeps the compiler's return-type analysis happy
    } catch {
      case t: Throwable =>
        // Never leave a claim behind on a failed acquire — it would
        // block the queue until the TTL.
        try fs.delete(myClaim, false)
        catch { case _: java.io.IOException => () }
        throw t
    }
  }

  /** Run `body` holding the commit locks of every path (deduped,
    * sorted-order acquisition). */
  def withLocks[T](spark: SparkSession, paths: Seq[String])(body: => T): T = {
    val distinctPaths = paths.distinct.sorted
    val fss = distinctPaths.map { p =>
      val hp = new Path(p)
      (hp, hp.getFileSystem(spark.sparkContext.hadoopConfiguration))
    }
    val held = scala.collection.mutable.ListBuffer.empty[(FileSystem, Path)]
    try {
      fss.foreach { case (table, fs) => held += ((fs, acquire(fs, table))) }
      body
    } finally {
      held.reverseIterator.foreach { case (fs, claim) =>
        try fs.delete(claim, false)
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Per-dir file-name sets of `dirs` under `path` — the conflict
    * fingerprint: a partition-dir swap always produces fresh file names
    * (task UUIDs), so equality of name sets ⇔ no commit touched the dir
    * since the fingerprint. A missing dir fingerprints as empty. */
  def fingerprint(
      spark: SparkSession,
      path: String,
      dirs: Seq[String]): Map[String, Set[String]] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dirs.distinct.map { d =>
      val p = new Path(root, d)
      val names =
        if (!fs.exists(p)) Set.empty[String]
        else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
      d -> names
    }.toMap
  }

  /** [[fingerprint]] over every visible partition dir of the table —
    * for committers whose touched set is only known after reading (the
    * promote transaction derives it from the data): any concurrent
    * commit to either table invalidates the whole transaction. */
  def fingerprintAll(
      spark: SparkSession, path: String): Map[String, Set[String]] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    val dirs = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    fingerprint(spark, path, dirs.toIndexedSeq)
  }
}
