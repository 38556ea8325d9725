package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch over a string column: fixed-memory frequency
  * summaries for heavy-hitter estimation at corpus scale.
  *
  * At 100 TB token/url/entity cardinality, an exact `groupBy(count)`
  * shuffles one row per distinct value; a count-min sketch is a
  * depth×width Long grid whose size is INDEPENDENT of cardinality —
  * each executor folds its partition into a local grid, partial grids
  * merge by element-wise addition (commutative + associative, exact at
  * any parallelism), and the driver ends up with a `depth*width*8`-byte
  * summary (64 KB at the defaults) answering point frequency queries
  * with the classic one-sided guarantee: estimate ≥ true count always,
  * and ≤ true + (e/width)·N with probability 1 − e^(−depth) per query.
  * The same shape as [[graft.functions.MinHashUnionAgg]] (a bounded
  * sketch where the exact computation would shuffle the corpus), and
  * the companion of the exact two-phase top-k: candidates come from
  * exact/partial counts or external lists; the sketch prices ANY value
  * without a second corpus pass.
  *
  * Hashing is `scala.util.hashing.MurmurHash3.stringHash` with one
  * fixed seed per depth row — deterministic across JVMs and
  * partitionings (DedupSpec-style layout invariance is spec-tested).
  */
object Sketches {

  /** Per-depth-row hash seed base (arbitrary fixed odd constant). */
  private val SeedBase = 0x5bd1e995

  private[operators] def bucket(d: Int, x: String, width: Int): Int =
    java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(x, SeedBase + d), width)

  /** Typed Aggregator folding strings into a flat depth×width grid.
    * Nulls contribute nothing (a null is absence, not a value). */
  final class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    require(depth > 0 && width > 0, "depth and width must be positive")

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], x: String): Array[Long] = {
      if (x == null) return buf
      var d = 0
      while (d < depth) {
        buf(d * width + bucket(d, x, width)) += 1L
        d += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** One distributed pass: fold `stringCol` of `df` into a sketch and
    * return it as a driver-side array. The collect is the point — the
    * sketch is the BOUNDED summary (depth·width·8 bytes, 64 KB at the
    * defaults) of an unbounded column; nothing else reaches the
    * driver. */
  def buildSketch(
      df: DataFrame,
      stringCol: String,
      depth: Int = 4,
      width: Int = 2048): CmSketch = {
    val ds: Dataset[String] =
      df.select(col(stringCol).cast("string")).as[String](Encoders.STRING)
    val grid = ds.select(new CountMinAgg(depth, width).toColumn)
      .head().toArray
    CmSketch(depth, width, grid)
  }

  /** A materialized sketch + its point-query estimator. */
  final case class CmSketch(depth: Int, width: Int, grid: Array[Long]) {
    require(grid.length == depth * width, "grid shape mismatch")

    /** Point frequency estimate: min over depth rows (≥ true count;
      * ≤ true + (e/width)·N w.p. 1 − e^(−depth)). */
    def estimate(x: String): Long = {
      var best = Long.MaxValue
      var d = 0
      while (d < depth) {
        val v = grid(d * width + bucket(d, x, width))
        if (v < best) best = v
        d += 1
      }
      best
    }

    /** Total stream length N (row count folded in, from any depth row). */
    def totalCount: Long = {
      var s = 0L
      var i = 0
      while (i < width) { s += grid(i); i += 1 }
      s
    }
  }

  /** Estimate frequencies for a candidate column: the sketch rides to
    * executors as a broadcast task binary (64 KB), estimation is a
    * row-local typed map — no join, no shuffle. */
  def estimateCounts(
      spark: SparkSession,
      candidates: DataFrame,
      stringCol: String,
      sketch: CmSketch): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(sketch)
    candidates.select(col(stringCol).cast("string")).as[String]
      // null is absence on the probe side too, mirroring
      // CountMinAgg.reduce — estimate(null) would NPE in the hash
      .map(x => (x, if (x == null) 0L else bc.value.estimate(x)))
      .toDF(stringCol, "est_n")
  }
}
