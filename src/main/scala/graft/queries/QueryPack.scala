package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named bundle of queries + their DuckDB oracle SQL.
  *
  * Conventions that make the driver's hash-compare deterministic across
  * Spark and DuckDB (CORRECTNESS gate, see builder contract):
  *  - Money/quantity aggregates go through exact decimal arithmetic and
  *    are cast to double at the END: `CAST(SUM(CAST(x AS DECIMAL(18,2)))
  *    AS DOUBLE)` — double summation order is nondeterministic across
  *    partitions, decimal summation is exact, and the final double cast
  *    of an exact decimal is identical IEEE rounding in both engines.
  *  - Never output raw TIMESTAMP columns (Spark writes UTC-adjusted
  *    parquet, DuckDB oracles produce naive timestamps; `events.ts` is
  *    micros-precision, with a legacy nanos-as-long fallback handled in
  *    `Tables.load`). Output `DATE`, epoch-micros BIGINT, or formatted
  *    strings instead.
  *  - Every computed column is aliased identically in Spark and SQL.
  *  - Window orderings always carry a unique tie-break column.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB SQL per query name; omit ⇒ driver records rows-only check. */
  def oracles: Map[String, String]

  // ---- shared helpers ---------------------------------------------------
  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(spark, dir, name)

  /** Exact decimal view of a 2-decimal-place double column. */
  protected def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  protected val oneDec: Column = lit(1).cast(DecimalType(18, 2))

  /** Exact decimal sum surfaced as double (see class doc). */
  protected def dsum(c: Column): Column = sum(dec(c)).cast("double")

  protected def ts(s: String): Column = lit(s).cast("timestamp")

  /** `read_parquet` over the engine's own dump of `name` — the
    * {{GRAFT_OUT}} token is replaced with the absolute output dir by
    * [[graft.Verify]] when it writes oracle_sql.json. Derived-invariant
    * oracles read this to recompute/guard the engine's reported values. */
  protected def outGlob(name: String): String =
    s"read_parquet('{{GRAFT_OUT}}/$name/*.parquet')"
}
