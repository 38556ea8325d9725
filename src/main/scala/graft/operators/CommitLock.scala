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
  * The primitive is the same exclusive create used by the generation
  * claims ([[Versioned]]): `fs.create(_graft_commit_lock,
  * overwrite=false)` is the CAS; a holder crashing leaves a lock file
  * that waiters break after [[StaleLockMs]] (lease semantics — a
  * holder must finish its swap within the TTL, which a rename sequence
  * clears by orders of magnitude). Multi-table transactions (the
  * promote pair) acquire in sorted-path order, so two transactions
  * over the same tables cannot deadlock. */
object CommitLock {

  val LockName = "_graft_commit_lock"

  /** A lock older than this is a crashed holder's leftover. */
  val StaleLockMs: Long = Versioned.StaleClaimMs

  /** How long an acquirer waits before giving up. */
  val AcquireTimeoutMs: Long = 60L * 1000L

  private def acquire(fs: FileSystem, table: Path): Path = {
    if (!fs.exists(table)) fs.mkdirs(table)
    val lock = new Path(table, LockName)
    val deadline = System.currentTimeMillis() + AcquireTimeoutMs
    var held = false
    while (!held) {
      try {
        fs.create(lock, false).close()
        held = true
      } catch {
        case _: java.io.IOException =>
          val stale =
            try System.currentTimeMillis() -
              fs.getFileStatus(lock).getModificationTime > StaleLockMs
            catch { case _: java.io.FileNotFoundException => false }
          if (stale) fs.delete(lock, false) // break a crashed holder's lock
          else if (System.currentTimeMillis() > deadline)
            throw new java.util.ConcurrentModificationException(
              s"CommitLock: could not acquire $lock within " +
                s"$AcquireTimeoutMs ms — concurrent committer stuck?")
          else Thread.sleep(50)
      }
    }
    lock
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
      held.reverseIterator.foreach { case (fs, lock) =>
        try fs.delete(lock, false)
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
