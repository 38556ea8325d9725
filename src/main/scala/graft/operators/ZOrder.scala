package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

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

  /** The z-value Column for `df` over `zCols` — global min/max per
    * column are computed eagerly here (one driver agg returning
    * 2·|zCols| scalars). Exposed for specs; most callers want
    * [[writeZOrdered]]. */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int): Column = {
    val schema = df.schema
    val statAggs = zCols.flatMap { c =>
      val base = schema(c).dataType match {
        case DateType => unix_date(col(c)).cast("double")
        case _ => col(c).cast("double")
      }
      Seq(min(base), max(base))
    }
    val row = df.agg(statAggs.head, statAggs.tail: _*).head()
    val coords = zCols.zipWithIndex.map { case (c, i) =>
      val lo = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val hi = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      gridCoord(col(c), schema(c).dataType, lo, hi, bits)
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
      bits: Int = 16): ZReport = {
    require(zCols.nonEmpty, "writeZOrdered: zCols must be non-empty")
    val z = zValue(df, zCols, bits)
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
