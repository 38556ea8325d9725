package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, IntegerType}

import graft.functions.expressions.NativeExpressions

/** Z-order (Morton-curve) table layout: cluster rows so that a range
  * predicate on ANY of the z-columns — or a box on several at once —
  * touches few files, where a linear sort only serves its leading
  * column. This is the multi-dimensional complement to
  * [[Maintenance.writePartitioned]]'s one-dimensional sort and feeds
  * the [[DataSkipping]] manifest: min/max envelopes of z-ordered files
  * are tight in EVERY interleaved dimension.
  *
  * The reference leans on multiple independent B-tree indexes for this
  * (`sql/create_tables.sql:78-81` — one per lookup column); a columnar
  * snapshot engine gets the same multi-column selectivity from layout
  * alone, which is the standard lakehouse construction (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`).
  *
  * Mechanics: each z-column is rank-normalized onto a `bits`-wide
  * integer grid via its global min/max (one tiny driver-side agg — two
  * scalars per column, not data), the grid coordinates are
  * bit-interleaved into a single long with pure built-in bit ops (the
  * whole expression stays inside whole-stage codegen — no UDF), and the
  * table is range-repartitioned + sorted by that z-value, then written
  * WITHOUT the helper column.
  *
  * Scale posture: one extra range-exchange over the data being laid
  * out — identical shuffle shape to any sorted write; the interleave
  * itself is row-local. Min/max normalization is value-distribution
  * sensitive (a single outlier squashes the grid); at 100 TB the
  * histogram-equalized variant (normalize by `ntile` rank instead of
  * min/max) drops in by swapping `gridCoord` — the interleave and
  * write path are unchanged.
  */
object ZOrder {

  final case class ZReport(files: Long)

  /** How raw values map onto the interleave grid. */
  sealed trait Grid
  /** Linear between the column's global min and max — one tiny agg, but
    * a single outlier squashes the useful range into few cells. */
  case object MinMaxGrid extends Grid
  /** Histogram-equalized: cells are approximate quantile buckets, so
    * every cell holds ≈ the same row count regardless of skew or
    * outliers. Costs one `approxQuantile` pass per column (sketch-
    * based, driver gets `2^bits − 1` cut points — bits ≤ 8 keeps that
    * ≤ 255 doubles). Cut points are sketch-derived, which only moves
    * WHERE rows land on the curve, never their values — layout choice,
    * not semantics. */
  case object QuantileGrid extends Grid

  /** Interleave `coords` (each an integer Column in `[0, 2^bits)`) into
    * one Morton long: bit b of coordinate i lands at position
    * `b * coords.size + i`. Built entirely from shiftright/and/
    * shiftleft/or — codegen-friendly, no UDF. `bits * coords.size`
    * must fit a signed long (≤ 63). */
  def interleaveBits(coords: Seq[Column], bits: Int): Column = {
    require(coords.nonEmpty, "interleaveBits: need at least one column")
    require(bits * coords.size <= 63,
      s"interleaveBits: $bits bits x ${coords.size} cols exceeds a long")
    val k = coords.size
    val terms =
      for {
        b <- 0 until bits
        (c, i) <- coords.zipWithIndex
      } yield shiftleft(
        shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Map a numeric/date column onto the `[0, 2^bits)` grid given its
    * global [lo, hi]. Degenerate ranges (lo == hi) map to 0. Nulls map
    * to 0 — they cluster at the curve origin, which keeps them packed
    * in few files rather than scattered. */
  private def gridCoord(c: Column, dt: org.apache.spark.sql.types.DataType,
      lo: Double, hi: Double, bits: Int): Column = {
    val maxCell = (1L << bits) - 1
    val num = dt match {
      case DateType => unix_date(c).cast("double")
      case _ => c.cast("double")
    }
    val scaled =
      if (hi <= lo) lit(0L)
      else least(lit(maxCell), greatest(lit(0L),
        floor((num - lit(lo)) / lit(hi - lo) * lit(maxCell.toDouble))))
    coalesce(scaled, lit(0L))
  }

  /** Numeric view of a z-column (dates → epoch days). */
  private def numView(c: Column, dt: DataType): Column = dt match {
    case DateType => unix_date(c).cast("double")
    case _ => c.cast("double")
  }

  /** The z-value Column for `df` over `zCols` — grid statistics (min/
    * max or quantile cut points) are computed eagerly here (one small
    * driver-side stats job). Exposed for specs; most callers want
    * [[writeZOrdered]]. */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int,
      grid: Grid = MinMaxGrid): Column = {
    val schema = df.schema
    val coords = grid match {
      case MinMaxGrid =>
        val statAggs = zCols.flatMap { c =>
          val base = numView(col(c), schema(c).dataType)
          Seq(min(base), max(base))
        }
        val row = df.agg(statAggs.head, statAggs.tail: _*).head()
        zCols.zipWithIndex.map { case (c, i) =>
          val lo = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
          val hi = if (row.isNullAt(2 * i + 1)) 0.0
            else row.getDouble(2 * i + 1)
          gridCoord(col(c), schema(c).dataType, lo, hi, bits)
        }
      case QuantileGrid =>
        require(bits <= 8,
          s"QuantileGrid: $bits bits means ${(1 << bits) - 1} cut points " +
            "per column — cap at 8 bits (255 doubles)")
        val cells = 1 << bits
        val probes = (1 until cells).map(_.toDouble / cells).toArray
        val tmp = zCols.indices.map(i => s"__graft_q$i")
        val numd = zCols.zip(tmp).foldLeft(df) { case (d, (c, t)) =>
          d.withColumn(t, numView(col(c), schema(c).dataType))
        }
        // one sketch pass over all columns together
        val cuts = numd.stat.approxQuantile(tmp.toArray, probes, 0.001)
        zCols.zipWithIndex.map { case (c, i) =>
          val bucket = NativeExpressions.col(QuantileBucket(
            NativeExpressions.expr(numView(col(c), schema(c).dataType)),
            cuts(i)))
          coalesce(bucket.cast("long"), lit(0L))
        }
    }
    interleaveBits(coords, bits)
  }

  /** Write `df` to `path` clustered along the Morton curve of `zCols`:
    * range-repartition into `targetFiles` curve segments, sort inside
    * each, drop the helper column, write parquet. Pair with
    * [[DataSkipping.writeManifest]] over the same columns to make the
    * tight per-file envelopes queryable. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      targetFiles: Int,
      bits: Int = 16,
      grid: Grid = MinMaxGrid): ZReport = {
    require(zCols.nonEmpty, "writeZOrdered: zCols must be non-empty")
    val z = zValue(df, zCols, bits, grid)
    df.withColumn("__graft_z", z)
      .repartitionByRange(targetFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    ZReport(files.toLong)
  }
}

/** Grid cell of a double under sorted quantile cut points: the number
  * of cuts ≤ the value (binary search per row — 8 probes for 255 cuts,
  * vs a 255-branch when-chain). Used by [[ZOrder.QuantileGrid]]; a
  * layout helper, so exact tie placement is a non-issue. */
case class QuantileBucket(child: Expression, cuts: Array[Double])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_quantile_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    val i = java.util.Arrays.binarySearch(cuts, v)
    if (i >= 0) i + 1 else -(i + 1)
  }

  override protected def withNewChildInternal(c: Expression): QuantileBucket =
    copy(child = c)
}
