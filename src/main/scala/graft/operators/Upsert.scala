package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE/upsert semantics without a lakehouse format.
  *
  * Re-expresses the reference's Postgres `INSERT ... ON CONFLICT (keys) DO
  * UPDATE` batched upserts (ref: src/db/load.py:71-110 users on `id`,
  * :112-151 meetings on `uuid`, :153-191 participants on composite
  * `(user_id, meeting_uuid)`, lambda/zoom_webhook/utils.py:147-167 staging)
  * as a pure-DataFrame operator:
  *
  *   result = dedup(updates) ∪ (target ⟕anti updates-on-keys)
  *
  * Semantics replicated from Postgres:
  *  - last-write-wins among conflicting rows in one batch (Postgres takes
  *    the last conflicting row; the webhook's dict build handler.py:26 is
  *    the same idiom) — made explicit via a row_number window over an
  *    arrival-order column;
  *  - NULLs are distinct in unique constraints (ref K3, SURVEY §2.5): rows
  *    with any NULL key never conflict — they pass through as plain
  *    inserts, and null-keyed target rows are never overwritten (the
  *    left-anti join naturally keeps them since NULL never equals).
  *
  * Scale posture: the anti-join shuffles on the upsert keys only; with the
  * target bucketed/partitioned by key, Catalyst prunes and AQE handles
  * skew. No driver-side collection anywhere.
  */
object Upsert {

  /** Upsert `updates` into `target` keyed by `keys`.
    *
    * @param orderBy winner selection among duplicate keys inside
    *   `updates`: a plain column ⇒ LARGEST value wins (newest-wins); an
    *   explicit `.asc`/`.desc` sort order ⇒ first row under that
    *   ordering wins. Defaults to input arrival order via
    *   monotonically_increasing_id (stable for a single narrow batch,
    *   mirroring the reference's "last row in the batch wins").
    * @param dedupNullKeyed NULL-keyed rows normally pass through as plain
    *   inserts every time (Postgres NULL-distinctness — re-running the
    *   same batch appends guests again, in the reference too). When true,
    *   null-keyed updates are deduplicated on ALL columns within the
    *   batch and against the target (null-safe equality), making replay
    *   of the same batch idempotent for guests as well. Caveat: two
    *   genuinely distinct rows identical in every column collapse.
    */
  def upsert(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      orderBy: Option[Column] = None,
      dedupNullKeyed: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val cols = target.columns.toSeq
    val anyNullKey = keys.map(col(_).isNull).reduce(_ || _)

    // a SortOrder can't be projected as a value — strip it and keep its
    // direction for the window ordering instead
    import org.apache.spark.sql.GraftColumnBridge
    val (ordValue, firstWinsAsc) = orderBy match {
      case Some(c) => GraftColumnBridge.unwrapSortOrder(c) match {
        case Some((child, asc)) => (child, asc)
        case None => (c, false)
      }
      case None => (monotonically_increasing_id(), false)
    }
    val tagged = updates.withColumn("__graft_ord", ordValue)
    val keyed = tagged.where(!coalesce(anyNullKey, lit(false)))
    val nullKeyed = tagged.where(coalesce(anyNullKey, lit(false)))

    val winnerOrd =
      if (firstWinsAsc) col("__graft_ord").asc else col("__graft_ord").desc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(winnerOrd)
    val winners = keyed
      .withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1)
      .select(cols.map(col): _*)

    val nullInserts0 = nullKeyed.select(cols.map(col): _*)
    val nullInserts =
      if (!dedupNullKeyed) nullInserts0
      else {
        // replay-idempotent guests: all-column dedup within the batch,
        // then null-safe anti-join against rows already in the target
        val nullTarget = target.where(coalesce(anyNullKey, lit(false)))
        val dd = nullInserts0.dropDuplicates(cols)
        val cond = cols.map(c => dd(c) <=> nullTarget(c)).reduce(_ && _)
        dd.join(nullTarget, cond, "left_anti")
      }
    val untouched = target.join(winners, keys, "left_anti")
    winners
      .unionByName(nullInserts)
      .unionByName(untouched)
  }

  /** Atomic snapshot write: write to `<path>__tmp`, then swap directories.
    * Crash-safe replacement for Postgres transactional commit
    * (ref load.py:41-50) given plain parquet storage. */
  def writeSnapshot(df: DataFrame, path: String): Unit =
    writeSnapshots(Seq(df -> path))

  /** Multi-table transactional snapshot write: ALL plans execute into
    * tmp dirs first, THEN all directories swap. Required when the plans
    * read each other's current snapshots (e.g. the promote pair: the new
    * staging is an anti-join against the new main, whose plan still scans
    * the old main files — swapping early would yank files out from under
    * the second plan). This is the reference's single-transaction pair
    * commit (load.py:230) for plain-parquet storage. */
  def writeSnapshots(dfsAndPaths: Seq[(DataFrame, String)]): Unit = {
    dfsAndPaths.foreach { case (df, path) =>
      df.write.mode("overwrite").parquet(path + "__tmp")
    }
    dfsAndPaths.foreach { case (df, path) =>
      val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
      val dst = new org.apache.hadoop.fs.Path(path)
      val fs = dst.getFileSystem(hadoopConf)
      val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
      val bak = new org.apache.hadoop.fs.Path(path + "__prev")
      if (fs.exists(dst)) {
        // normal swap: every crash point leaves a committed generation
        // readable (dst until the mid-swap rename, then __prev)
        if (fs.exists(bak)) fs.delete(bak, true)
        fs.rename(dst, bak)
        fs.rename(tmp, dst)
      } else {
        // recovery write (prior run crashed mid-swap; __prev holds the
        // only committed generation, which this plan was read FROM).
        // Commit the new primary FIRST, clean up after — deleting
        // __prev before tmp→dst lands would leave a crash window with
        // NO generation on disk, i.e. silent total loss.
        fs.rename(tmp, dst)
        if (fs.exists(bak)) fs.delete(bak, true)
      }
    }
  }

  /** Crash-safe snapshot read: the swap in [[writeSnapshots]] has a
    * window between rename(dst, __prev) and rename(__tmp, dst) where no
    * primary directory exists — a reader that treats "missing" as
    * "empty table" there would silently drop the whole snapshot. Fall
    * back to `<path>__prev` when the primary is absent (mirroring
    * Bookmark's `.bak` fallback); return None only when neither
    * generation exists (genuine first run). Read errors on an EXISTING
    * directory (corruption, permissions) propagate — they must fail
    * loudly, not read as empty. */
  def readSnapshot(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(conf)
    val bak = new org.apache.hadoop.fs.Path(path + "__prev")
    if (fs.exists(dst)) Some(spark.read.parquet(path))
    else if (fs.exists(bak)) Some(spark.read.parquet(path + "__prev"))
    else None
  }

  /** True when a readable snapshot generation (primary or `__prev`)
    * exists at `path`. */
  def snapshotExists(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(conf)
    fs.exists(dst) || fs.exists(new org.apache.hadoop.fs.Path(path + "__prev"))
  }
}
