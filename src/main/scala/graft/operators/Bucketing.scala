package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables ON WRITE so repeated
  * joins/aggregations on the bucket key run shuffle-free (SURVEY §4's
  * replacement for the reference's join-key B-tree indexes,
  * create_tables.sql:78-81).
  *
  * At 100 TB the win compounds: every (fact ⋈ fact) on the bucket key
  * skips both sides' exchanges; bucket pruning cuts scans for point
  * lookups on the bucket column.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. `buckets` should be
    * sized so one bucket ≈ one healthy task (128-512 MB of data). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a PREVIOUS session's managed-table dir survives in the warehouse
    // while the fresh in-memory catalog has no entry for it — then
    // CREATE fails with LOCATION_ALREADY_EXISTS even in overwrite mode.
    // Clear the stale location (default-db managed tables live at
    // <warehouse>/<lowercased name>).
    val loc = new Path(spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** True if the physical plan of `df` contains no shuffle exchange of
    * any kind (hash, range, single-partition) — the check that a
    * bucketed join actually avoided the shuffle. Walks the plan tree for
    * ShuffleExchangeLike nodes (a substring test on "Exchange" would
    * false-positive on BroadcastExchange, which moves no rows between
    * reducers and is exactly what a bucketed plan with a broadcast dim
    * side should contain). */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // AdaptiveSparkPlanExec and query stages are leaf nodes to collect()
    // — recurse into them explicitly or AQE plans always look clean.
    // collectWithSubqueries also descends into subquery plans (a scalar
    // subquery's aggregate shuffles inside innerChildren, which plain
    // collect() never visits).
    def hasShuffle(p: SparkPlan): Boolean = p.collectWithSubqueries {
      case _: ShuffleExchangeLike => true
      case _: ShuffleQueryStageExec => true
      case a: AdaptiveSparkPlanExec if hasShuffle(a.executedPlan) => true
    }.contains(true)
    !hasShuffle(df.queryExecution.executedPlan)
  }
}
