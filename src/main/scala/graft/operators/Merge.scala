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
}
