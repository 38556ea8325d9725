package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval / range join with bucket blocking.
  *
  * Naive `a JOIN b ON a.key = b.key AND b.t BETWEEN a.lo AND a.hi` plans
  * as an equi-join then per-key filter — fine until one key dominates; a
  * pure theta join degenerates to broadcast-nested-loop. The scalable
  * formulation blocks both sides into fixed-width time buckets:
  * intervals explode into every bucket they overlap, points land in one
  * bucket, the join runs on (key, bucket) — a plain shuffled hash join —
  * and the exact predicate refines. This is the standard
  * bucketing/binning range-join strategy (cf. interval joins in stream
  * processors and range-join binning in warehouse engines).
  *
  * Choose `bucketWidth` ≈ typical interval length: each interval then
  * explodes into O(1) buckets and candidate pairs stay near-linear.
  */
object RangeJoin {

  /** Join points to enclosing intervals.
    *
    * @param intervals side with [lo, hi] columns (inclusive, long/epoch)
    * @param points    side with a single time column (long/epoch)
    * @param key       equi-key on both sides (pass empty Seq for none —
    *                  then blocking is by bucket alone)
    * @param bucketWidth blocking granularity in the time unit
    */
  def pointInInterval(
      intervals: DataFrame,
      points: DataFrame,
      key: Seq[String],
      lo: String,
      hi: String,
      t: String,
      bucketWidth: Long): DataFrame = {
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        (col(lo) / bucketWidth).cast("long"),
        (col(hi) / bucketWidth).cast("long"))))
    val pt = points.withColumn("__bucket",
      (col(t) / bucketWidth).cast("long"))
    iv.join(pt, key :+ "__bucket")
      .where(col(t) >= col(lo) && col(t) <= col(hi))
      .drop("__bucket")
  }

  /** Overlapping-interval pairs: rows (a, b) whose [lo,hi] windows
    * intersect, blocked by bucket. An overlap spanning k buckets is
    * emitted exactly ONCE — in the bucket containing the overlap's
    * start, `max(aLo, bLo)` (that instant lies inside both intervals,
    * so both sides exploded that bucket). The filter is row-local —
    * no global pair-dedup exchange, the same first-collision idea that
    * de-spilled the LSH candidate paths (truncating division is
    * monotonic, so the overlap-start bucket is always within both
    * sides' enumerated ranges, any sign). Assumes `aId`/`bId` identify
    * their rows uniquely, as before. */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      key: Seq[String],
      aLo: String, aHi: String,
      bLo: String, bHi: String,
      aId: String, bId: String,
      bucketWidth: Long): DataFrame = {
    val av = a.withColumn("__bucket",
      explode(sequence(
        (col(aLo) / bucketWidth).cast("long"),
        (col(aHi) / bucketWidth).cast("long"))))
    val bv = b.withColumn("__bucket",
      explode(sequence(
        (col(bLo) / bucketWidth).cast("long"),
        (col(bHi) / bucketWidth).cast("long"))))
    av.join(bv, key :+ "__bucket")
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .where(col("__bucket") ===
        (greatest(col(aLo), col(bLo)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
