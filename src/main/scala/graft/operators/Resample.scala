package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling of an event stream with gap filling — the
  * time-series densification every monitoring / feature pipeline needs
  * (pandas `resample().ffill()`, TimescaleDB `time_bucket_gapfill` +
  * `locf`): bucket events into fixed intervals per key, keep the LAST
  * observation and event count per bucket, then materialize EMPTY
  * buckets between each key's first and last observation, carrying the
  * last observed value forward.
  *
  * All stages are key-shuffled or narrow:
  *  1. bucket assignment — a row-local floor division of the epoch;
  *  2. per-(key, bucket) reduction — one keyed window pass ranking by
  *     (ts desc, id desc) picks the last observation while a count
  *     over the same partition prices the bucket (ties broken by the
  *     id, so the result is layout-invariant);
  *  3. per-key grid — min/max bucket per key (one keyed agg), then a
  *     narrow `sequence`+`explode` materializes the dense grid (rows ∝
  *     buckets, not events²);
  *  4. forward fill — `last(value, ignoreNulls)` over (key, bucket
  *     asc): the first bucket of every key is observed by
  *     construction, so the fill is total.
  *
  * At 100 TB the grid explode bounds memory per key at its bucket
  * span; keys with pathological spans (one event in 1990, one today)
  * surface as large-fanout rows — cap spans upstream if that is a real
  * shape. Output: (key, bucket, n_events, value) — `n_events` 0 marks
  * a filled gap; `bucket` is the interval index (epoch ÷ interval).
  */
object Resample {

  def resampleFfill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: Column,
      intervalSec: Long): DataFrame = {
    require(intervalSec > 0, "resampleFfill: intervalSec must be positive")
    val intervalUs = intervalSec * 1000000L
    // FLOOR division, not `/` and not bare `div`: Spark's `/` is double
    // division, whose rounding could misbucket a timestamp sitting on
    // an interval boundary, and `div` truncates toward zero — which
    // disagrees with DuckDB's floor-dividing `//` on NEGATIVE epochs
    // (pre-1970 timestamps): truncation would fold two intervals around
    // the epoch into bucket 0. floorDiv = div − 1 when the remainder is
    // negative (Spark's % follows the dividend's sign, like Java), so
    // both engines bucket every epoch — positive or negative —
    // identically.
    val q = expr(s"ts_us div ${intervalUs}L")
    val ev = events.select(
        col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("ts_us"),
        valueCol.cast("long").as("v"))
      .withColumn("bucket",
        when(col("ts_us") % intervalUs < 0, q - 1).otherwise(q))
    val wB = Window.partitionBy(col("key"), col("bucket"))
    val wLast = wB.orderBy(col("ts_us").desc, col("v").desc)
    val perBucket = ev
      .withColumn("rn", row_number().over(wLast))
      .withColumn("n_events", count(lit(1)).over(wB))
      .where(col("rn") === 1)
      .select("key", "bucket", "n_events", "v")
    val grid = perBucket.groupBy(col("key"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("key"),
        explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val wFill = Window.partitionBy(col("key")).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(perBucket, Seq("key", "bucket"), "left")
      .withColumn("value", last(col("v"), ignoreNulls = true).over(wFill))
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .select("key", "bucket", "n_events", "value")
  }
}
