package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.PlanExpression
import org.apache.spark.sql.catalyst.plans.logical._

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

  /** Is the plan a pure narrow pipeline over leaves (scan / project /
    * filter / generate / alias) with no subquery expressions? Only such
    * plans may be probed with `df.rdd`: anything carrying a shuffle or
    * a subquery would EXECUTE work during the probe (under AQE,
    * `Dataset.rdd` materializes shuffle stages), and the physical plan
    * cannot be inspected safely pre-execution (subquery expressions
    * still hold logical plans at the `sparkPlan` stage). */
  private def narrowNoSubquery(p: LogicalPlan): Boolean = {
    val noSubq = !p.expressions.exists(_.exists(_.isInstanceOf[PlanExpression[_]]))
    noSubq && (p match {
      case _: LeafNode => true
      case r: Repartition if !r.shuffle => // coalesce — narrow
        p.children.forall(narrowNoSubquery)
      case _: Project | _: Filter | _: Generate | _: SubqueryAlias |
          _: Union | _: LocalLimit | _: GlobalLimit | _: Sample =>
        p.children.forall(narrowNoSubquery)
      case _ => false
    })
  }

  /** Largest EXPLICIT repartition count in the plan, if any — a plan
    * the user already spread to ≥ target must not be reshuffled. */
  private def explicitRepartition(p: LogicalPlan): Option[Int] = {
    val counts = p.collect {
      case r: Repartition if r.shuffle => r.numPartitions
      case r: RepartitionByExpression if r.optNumPartitions.isDefined =>
        r.optNumPartitions.get
    }
    if (counts.isEmpty) None else Some(counts.max)
  }

  /** Round-robin repartition to the default parallelism when `df` is
    * under-partitioned for a CPU-bound downstream stage.
    *
    * Narrow scan pipelines are probed via `df.rdd` (lazy — no jobs run
    * for a shuffle-free plan) and spread when under-partitioned. Plans
    * containing aggregates/joins/subqueries are never probed (the probe
    * would execute their shuffle stages once and the real query again);
    * they already shuffle into `spark.sql.shuffle.partitions`
    * partitions, so they are spread only when that conf is sized below
    * the cluster's parallelism. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val plan = df.queryExecution.optimizedPlan
    if (narrowNoSubquery(plan)) {
      // includes coalesce/union/limit chains: the probe stays lazy —
      // an explicitly coalesced input still spreads
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    } else if (explicitRepartition(plan).exists(_ >= target)) {
      df // user already spread it wider than the cluster — keep
    } else {
      val shufflePartitions = spark.sessionState.conf.numShufflePartitions
      if (shufflePartitions < target) df.repartition(target) else df
    }
  }
}
