package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for each left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key (backward as-of; the
  * standard time-series enrichment join, e.g. "state of the dimension as
  * of the event's timestamp").
  *
  * Spark has no native as-of join. The scalable formulation here is the
  * union + ordered-window sweep (one shuffle on the key, one sort —
  * exactly what a dedicated sort-merge as-of operator would do):
  *
  *   1. tag both sides, union on (key, time);
  *   2. window per key ordered by (time, side-tag): `last_value(STRUCT
  *      of all right payload columns, ignoreNulls)` up to the current
  *      row = most recent right row at-or-before this left row. A
  *      single struct — not one sweep per column — so the attached
  *      values always come from ONE right row: per-column sweeps would
  *      backfill a NULL payload cell from an older right row,
  *      fabricating a combined row that never existed (DuckDB ASOF
  *      returns the matched row's NULL);
  *   3. keep left rows.
  *
  * This never builds the (left × right-history) product a naive
  * filter+max join would, and AQE handles key skew. Ties (equal
  * timestamps) resolve right-before-left, i.e. a right row AT the left
  * timestamp matches — DuckDB ASOF JOIN semantics (`>=`).
  */
object AsOfJoin {

  /** @param left      probe side (events)
    * @param right     reference side (versions/history)
    * @param key       equi-key column name present on both sides
    * @param leftTime  ordering column on left
    * @param rightTime ordering column on right
    * @param rightCols right payload columns to attach (null when no
    *                  right row precedes the left row)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // timestamps order at micros precision — cast("long") on a timestamp
    // would truncate to SECONDS and scramble sub-second ordering
    def ordCol(df: DataFrame, c: String) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }
    // One struct holding the whole right payload: the sweep either takes
    // ALL columns from the matched right row or none (left rows carry a
    // NULL struct, which ignoreNulls skips; a right row whose payload
    // cells are NULL still carries a non-null struct, so its NULLs
    // surface instead of being backfilled from an older row).
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    // side tag 0 = right (sorts first on equal time → inclusive match)
    val taggedRight = right.select(
      (col(key).as(key) +:
        ordCol(right, rightTime).as("__t") +:
        lit(0).as("__side") +:
        struct(rightCols.map(c => col(c).as(c)): _*).as("__r") +: Nil) ++
        leftCols.filterNot(c => c == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (col(key).as(key) +:
        ordCol(left, leftTime).as("__t") +:
        lit(1).as("__side") +:
        lit(null).cast(rStructType).as("__r") +: Nil) ++
        leftCols.filterNot(c => c == key).map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    swept.where(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
