package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staging→main promote: the reference's only multi-statement relational
  * transaction (ref: src/db/load.py:193-235).
  *
  * The reference's merge is:
  *   1. J1 inner join: `recording_staging s JOIN meeting m ON
  *      s.meeting_uuid = m.uuid` — gate: promote only rows whose parent
  *      has arrived (load.py:203-208);
  *   2. K5 upsert of the joined rows into `recording` on `id`;
  *   3. J2 semi-join delete: remove from staging the rows now present in
  *      `recording` keyed `(id, meeting_uuid)` (load.py:222-228) —
  *      delete-via-EXISTS ≡ keep-via-left-anti.
  *
  * Rows whose parent hasn't arrived stay parked in staging and are retried
  * on the next cycle — the reference's late-data design (SURVEY §2.7).
  *
  * Scale posture: the gate is a left-semi join (Catalyst broadcasts the
  * projected parent-key side when small); no row of staging is ever
  * collected to the driver.
  */
object Merge {

  final case class PromoteResult(main: DataFrame, staging: DataFrame)

  /** @param staging  parked child rows (no FK enforced — ref
    *                 create_tables.sql:63-75)
    * @param parent   the gating parent table
    * @param fk       column in `staging` referencing `parentKey`
    * @param mainKeys upsert conflict keys in `main` (ref uses `id`; the
    *                 delete uses `(id, meeting_uuid)` — pass both to match)
    */
  def promote(
      staging: DataFrame,
      parent: DataFrame,
      fk: String,
      parentKey: String,
      main: DataFrame,
      mainKeys: Seq[String]): PromoteResult = {
    val parentKeys = parent.select(col(parentKey).as(fk))
    val promoted = staging.join(parentKeys, Seq(fk), "left_semi")
    val newMain = Upsert.upsert(main, promoted, mainKeys)
    // J2: staging rows that made it into main are dropped; unmatched rows
    // remain parked for the next cycle.
    val remaining = staging.join(
      newMain.select(mainKeys.map(col): _*), mainKeys, "left_anti")
    PromoteResult(newMain, remaining)
  }

  /** What a partition-scoped promote committed (empty touched set ⇒
    * nothing gated in, nothing written). */
  final case class PromotePartitionedResult(
      main: Upsert.PartitionedCommit, staging: Upsert.PartitionedCommit)

  /** [[promote]] over partition-scoped snapshot tables: both the main
    * upsert and the staging delete rewrite ONLY the partition
    * directories holding promoted rows. Write cost per cycle is
    * proportional to the promoted batch, not to the accumulated main
    * table — the at-scale form of the promote transaction (the flat
    * [[promote]] + [[Upsert.writeSnapshots]] pair rewrites both tables
    * in full every cycle).
    *
    * Same two-phase commit ordering as the flat pair: both output
    * plans execute against the CURRENT generations before any
    * partition dir swaps ([[Upsert.writeSnapshotsPartitioned]]).
    *
    * Semantics note vs [[promote]]: the staging-side delete anti-joins
    * against THIS CYCLE'S PROMOTED keys (not the full new main — which
    * would execute the whole main-upsert plan a second time just to
    * project its keys). A parked row whose key already exists in main
    * but was not promoted this cycle (possible only when an
    * already-promoted key is redelivered AND its parent has since
    * vanished from `parent`) stays parked instead of being dropped —
    * it re-promotes (idempotently) whenever its parent reappears.
    * Keys must not migrate partitions (see the contract in [[Upsert]]'s
    * partition-scoped section).
    *
    * @param schema       full staging/main row schema including
    *                     `partitionCol` (pins partition-column typing;
    *                     both tables share the row shape, as in the
    *                     reference's staging/main pair)
    * @param partitionCol partition column of BOTH snapshot tables */
  /** @param commitRetries optimistic-concurrency retries (see
    *   [[Upsert.upsertPartitioned]]). The promote's touched set is only
    *   known after reading staging, so the fingerprint covers EVERY
    *   partition dir of both tables — a concurrent commit to either
    *   (e.g. the streaming upsert landing a batch in staging mid-
    *   promote, whose rows an unguarded staging swap would delete)
    *   aborts the swap and re-runs the transaction from the new state. */
  def promotePartitioned(
      spark: org.apache.spark.sql.SparkSession,
      stagingPath: String,
      parent: DataFrame,
      fk: String,
      parentKey: String,
      mainPath: String,
      mainKeys: Seq[String],
      partitionCol: String,
      schema: org.apache.spark.sql.types.StructType,
      maxTouchedPartitions: Int = 10000,
      commitRetries: Int = 3): Option[PromotePartitionedResult] = {
    var attempt = 0
    while (true) {
      attempt += 1
      val fpStaging = CommitLock.fingerprintAll(spark, stagingPath)
      val fpMain = CommitLock.fingerprintAll(spark, mainPath)
      val staging = Upsert.readPartitionedSnapshot(spark, stagingPath, schema)
        .getOrElse(sys.error(s"promotePartitioned: no staging snapshot at $stagingPath"))
      val parentKeys = parent.select(col(parentKey).as(fk))
      val promoted = staging.join(parentKeys, Seq(fk), "left_semi")
      val touched = promoted.select(col(partitionCol)).distinct()
        .limit(maxTouchedPartitions + 1).collect().map(_.get(0)).toSeq
      require(touched.size <= maxTouchedPartitions,
        s"promotePartitioned: promoted rows touch > $maxTouchedPartitions " +
          s"partitions of $partitionCol")
      if (touched.isEmpty) return None // nothing gated in this cycle
      val filter = Upsert.touchedFilter(partitionCol, touched)
      val mainPruned = Upsert.readPartitionedSnapshot(spark, mainPath, schema)
        .map(_.where(filter)).getOrElse(promoted.limit(0))
      val newMainTouched = Upsert.upsert(mainPruned, promoted, mainKeys)
      val remaining = staging.where(filter).join(
        promoted.select(mainKeys.map(col): _*), mainKeys, "left_anti")
      try {
        // both paths were just repaired by their readPartitionedSnapshot
        val Seq(mainCommit, stagingCommit) = Upsert.writeSnapshotsPartitioned(Seq(
          Upsert.PartitionedWrite(newMainTouched, mainPath, partitionCol, touched),
          Upsert.PartitionedWrite(remaining, stagingPath, partitionCol, touched)),
          skipRepair = true,
          preSwapCheck = () => {
            if (CommitLock.fingerprintAll(spark, stagingPath) != fpStaging ||
                CommitLock.fingerprintAll(spark, mainPath) != fpMain)
              throw new java.util.ConcurrentModificationException(
                s"promotePartitioned($stagingPath -> $mainPath): a table " +
                  "changed since the transaction was computed")
          })
        return Some(PromotePartitionedResult(mainCommit, stagingCommit))
      } catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt > commitRetries) throw e
          // re-run the transaction against the new state
      }
    }
    sys.error("unreachable")
  }
}
