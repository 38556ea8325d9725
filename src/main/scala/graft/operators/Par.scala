package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism hygiene for compute-heavy per-row stages.
  *
  * Small parquet inputs (one file, a few MB) arrive as 1-2 partitions,
  * so an expensive narrow stage right after the scan — MinHash
  * signatures, SimHash, per-row dot-product scans — runs on 1-2 of the
  * cluster's cores. [[spread]] repartitions ONLY when the input has
  * fewer partitions than the default parallelism; a large table already
  * carrying hundreds of partitions passes through untouched, so the
  * 100 TB path never pays a gratuitous full-table shuffle.
  */
object Par {

  /** Round-robin repartition to the default parallelism when `df` is
    * under-partitioned for a CPU-bound downstream stage.
    *
    * Shuffled inputs pass through untouched WITHOUT probing the
    * partition count: under AQE, `df.rdd` materializes the upstream
    * shuffle stages just to read `getNumPartitions`, and that discarded
    * execution would run again in the real query. A shuffled input is
    * already sized by spark.sql.shuffle.partitions anyway; only narrow
    * (scan-pipeline) plans — where `.rdd` builds lazily with no jobs —
    * are probed and spread. */
  def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val target = df.sparkSession.sparkContext.defaultParallelism
    val plan = df.queryExecution.sparkPlan
    // collectWithSubqueries: a shuffle inside a scalar subquery would
    // otherwise slip past and the .rdd probe would execute its stages
    val shuffled = plan.collectWithSubqueries {
      case _: ShuffleExchangeLike => true
    }.contains(true)
    if (shuffled) {
      // static partition count from the plan root — no execution; a
      // shuffled input sized below the cluster (small
      // spark.sql.shuffle.partitions, explicit coalesce) still spreads
      val n = plan.outputPartitioning.numPartitions
      if (n > 0 && n < target) df.repartition(target) else df
    }
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
