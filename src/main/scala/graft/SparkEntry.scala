package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EtlQueries, PipelineQueries, ProdBenchQueries, RelationalQueries, ScaleQueries, StreamReplayQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 surfaces here as a named
  * query over the driver's parquet testdata; `oracleSql` carries the
  * DuckDB-equivalent SQL for the hash-match correctness gate (queries
  * without an entry get the weaker rows-only check — those are the
  * hash-signature operators whose exact bit patterns aren't expressible
  * in DuckDB 1.0 SQL; they carry golden-value unit tests instead).
  */
object SparkEntry {

  private val packs =
    Seq(RelationalQueries, EtlQueries, TextQueries, VectorQueries,
      PipelineQueries, StreamReplayQueries, ScaleQueries,
      ProdBenchQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_pricing_summary")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
