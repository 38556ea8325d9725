package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained grouped aggregates — the materialized-view
  * pattern for append-mostly fact tables.
  *
  * At 100 TB, re-aggregating the full history to refresh a rollup is
  * the single most wasteful recurring job in a warehouse. For algebraic
  * aggregates (count / sum / min / max — and averages derived from
  * count+sum at read time) the refresh only needs to aggregate the NEW
  * batch and merge it with the stored state: state ∪ agg(batch) →
  * re-aggregate by group. The merge shuffles |groups| + |batch groups|
  * rows, independent of history size.
  *
  * The reference's analytic surface (SURVEY §2.6 — per-department
  * counts, storage by file type, duration sums) is exactly this shape:
  * its Postgres tables were re-queried from scratch by Power BI; here
  * the rollup is a snapshot table maintained per load.
  *
  * Caveats by design:
  *  - only algebraic aggregates (no count-distinct / percentiles —
  *    those need sketches or full recompute);
  *  - append-only semantics: updates/deletes to history require
  *    recompute (or retraction rows, out of scope);
  *  - exactly-once via the same crash-safe snapshot swap as Upsert.
  */
object IncrementalAgg {

  /** Aggregate spec: the column being aggregated and which algebraic
    * stats to maintain for it. */
  final case class Stat(col: String, count: Boolean = true,
      sum: Boolean = true, min: Boolean = true, max: Boolean = true)

  private def aggCols(s: Stat): Seq[Column] = {
    val c = col(s.col)
    (if (s.count) Seq(count(c).as(s"${s.col}__count")) else Nil) ++
      (if (s.sum) Seq(sum(c).as(s"${s.col}__sum")) else Nil) ++
      (if (s.min) Seq(min(c).as(s"${s.col}__min")) else Nil) ++
      (if (s.max) Seq(max(c).as(s"${s.col}__max")) else Nil)
  }

  /** Merge columns: how two partial states combine (count+count,
    * sum+sum, min(min), max(max)). */
  private def mergeCols(s: Stat): Seq[Column] =
    (if (s.count) Seq(sum(col(s"${s.col}__count")).as(s"${s.col}__count"))
     else Nil) ++
      (if (s.sum) Seq(sum(col(s"${s.col}__sum")).as(s"${s.col}__sum"))
       else Nil) ++
      (if (s.min) Seq(min(col(s"${s.col}__min")).as(s"${s.col}__min"))
       else Nil) ++
      (if (s.max) Seq(max(col(s"${s.col}__max")).as(s"${s.col}__max"))
       else Nil)

  /** Aggregate one batch into the partial-state shape. */
  def aggregateBatch(batch: DataFrame, groupCols: Seq[String],
      stats: Seq[Stat]): DataFrame = {
    val cs = stats.flatMap(aggCols)
    batch.groupBy(groupCols.map(col): _*).agg(cs.head, cs.tail: _*)
  }

  /** Merge an aggregated batch into the stored state (both in the
    * partial-state shape). */
  def merge(state: DataFrame, batchAgg: DataFrame, groupCols: Seq[String],
      stats: Seq[Stat]): DataFrame = {
    val cs = stats.flatMap(mergeCols)
    state.unionByName(batchAgg)
      .groupBy(groupCols.map(col): _*)
      .agg(cs.head, cs.tail: _*)
  }

  /** One refresh cycle against a snapshot path: read state (if any),
    * aggregate the new batch, merge, swap. Returns the new state. */
  def refresh(spark: SparkSession, statePath: String, batch: DataFrame,
      groupCols: Seq[String], stats: Seq[Stat]): DataFrame = {
    val batchAgg = aggregateBatch(batch, groupCols, stats)
    val merged = Upsert.readSnapshot(spark, statePath) match {
      case Some(state) => merge(state, batchAgg, groupCols, stats)
      case None => batchAgg
    }
    Upsert.writeSnapshot(merged, statePath)
    spark.read.parquet(statePath)
  }
}
