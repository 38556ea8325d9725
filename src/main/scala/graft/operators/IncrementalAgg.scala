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
  *  - [[merge]]/[[refresh]] are append-only; UPDATES to history flow
  *    through [[applyChangeSet]] instead, which consumes
  *    [[Changelog.changeSet]]'s retraction rows (count/sum only —
  *    min/max are not retraction-algebraic);
  *  - UNLIKE the keyed upsert, the merge is NOT idempotent (sum-of-sums
  *    double-counts a replayed batch), so at-least-once replay needs
  *    the batch-id guard: pass `batchId` to [[refresh]] and an
  *    already-applied batch is skipped. The marker commits in the same
  *    crash-safe swap as the state itself (it is a column of the
  *    state), so marker and data can never disagree.
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

  /** Physical row count per group — distinct from `count(col)`, which
    * skips NULLs: only a true row count can tell an emptied group from
    * a group whose stat values are all NULL. Opt-in (the append-only
    * path keeps its historical state shape); REQUIRED for
    * update-maintained views ([[applyChangeSet]]). */
  val RowsCol = "__rows"

  /** Aggregate one batch into the partial-state shape.
    * @param trackRows also maintain [[RowsCol]]. */
  def aggregateBatch(batch: DataFrame, groupCols: Seq[String],
      stats: Seq[Stat], trackRows: Boolean = false): DataFrame = {
    val cs = (if (trackRows) Seq(count(lit(1)).as(RowsCol)) else Nil) ++
      stats.flatMap(aggCols)
    require(cs.nonEmpty,
      "at least one aggregate required (stats empty or all flags false)")
    batch.groupBy(groupCols.map(col): _*).agg(cs.head, cs.tail: _*)
  }

  /** Merge an aggregated batch into the stored state (both in the
    * partial-state shape; [[RowsCol]] sums through when both sides
    * carry it). */
  def merge(state: DataFrame, batchAgg: DataFrame, groupCols: Seq[String],
      stats: Seq[Stat]): DataFrame = {
    val rows =
      if (state.columns.contains(RowsCol) &&
          batchAgg.columns.contains(RowsCol))
        Seq(sum(col(RowsCol)).as(RowsCol))
      else Nil
    val cs = rows ++ stats.flatMap(mergeCols)
    require(cs.nonEmpty,
      "at least one aggregate required (stats empty or all flags false)")
    state.unionByName(batchAgg)
      .groupBy(groupCols.map(col): _*)
      .agg(cs.head, cs.tail: _*)
  }

  private val BatchIdCol = "__last_batch_id"

  /** One refresh cycle against a snapshot path: read state (if any),
    * aggregate the new batch, merge, swap. Returns the new state.
    *
    * @param batchId replay guard: when set, the id rides in the state
    *   snapshot (same atomic swap — marker and data cannot disagree)
    *   and a refresh whose id is ≤ the stored one is a no-op, covering
    *   both the immediate crash-replay and a late redelivery of an
    *   older batch. Ids are NUMERIC (epoch millis, sequence numbers) —
    *   numeric comparison has no lexicographic footgun where
    *   "batch-10" < "batch-9" would silently drop a genuinely new
    *   batch. Callers with at-least-once upstreams (BatchEtl-style
    *   bookmark replay) MUST pass it — the merge itself double-counts
    *   replays. */
  def refresh(spark: SparkSession, statePath: String, batch: DataFrame,
      groupCols: Seq[String], stats: Seq[Stat],
      batchId: Option[Long] = None): DataFrame = {
    val prior = Upsert.readSnapshot(spark, statePath)
    // guard only against a LONG-typed marker: a state stamped by a
    // different id scheme (e.g. a legacy string column) cannot be
    // ordered against the numeric id — comparing would throw under
    // ANSI or silently disarm; treat it as absent and re-arm from this
    // refresh instead
    val alreadyApplied = (prior, batchId) match {
      case (Some(state), Some(id))
          if state.columns.contains(BatchIdCol) &&
            state.schema(BatchIdCol).dataType ==
              org.apache.spark.sql.types.LongType =>
        !state.limit(1).where(col(BatchIdCol) >= id).isEmpty
      case _ => false
    }
    if (alreadyApplied) return prior.get.drop(BatchIdCol)

    val batchAgg = aggregateBatch(batch, groupCols, stats)
    val merged = prior.map(_.drop(BatchIdCol)) match {
      case Some(state) => merge(state, batchAgg, groupCols, stats)
      case None => batchAgg
    }
    val stamped = batchId match {
      case Some(id) => merged.withColumn(BatchIdCol, lit(id))
      case None => merged
    }
    Upsert.writeSnapshot(stamped, statePath)
    spark.read.parquet(statePath).drop(BatchIdCol)
  }

  /** Maintain the view through an UPDATE/DELETE-carrying delta — the
    * retraction path the append-only [[merge]] cannot express: consume
    * [[Changelog.changeSet]] rows, where `insert`/`update_post`
    * contribute +1 and `update_pre`/`delete` retract (−rows, −count,
    * −sum), then merge as usual. A group whose rows all leave it nets
    * to zero PHYSICAL rows and VANISHES from the state — [[RowsCol]]
    * (not `count(col)`, which is 0 for an all-NULL group that a
    * from-scratch recompute would keep) is the emptiness signal, so
    * the state MUST be built with `aggregateBatch(trackRows = true)`.
    *
    * Only count/sum are retraction-algebraic: subtracting the current
    * min's value says nothing about the next min without the full
    * group. Maintaining min/max under updates needs a recompute of the
    * touched groups (or a mergeable sketch) — rejected loudly here. */
  def applyChangeSet(
      state: DataFrame,
      changes: DataFrame,
      groupCols: Seq[String],
      stats: Seq[Stat]): DataFrame = {
    require(stats.nonEmpty && stats.forall(s => !s.min && !s.max),
      "applyChangeSet: min/max are not retraction-algebraic — drop them " +
        "from the maintained view or recompute the touched groups")
    require(state.columns.contains(RowsCol),
      s"applyChangeSet: state lacks $RowsCol — build it with " +
        "aggregateBatch(trackRows = true); emptied groups cannot be told " +
        "from all-NULL groups otherwise")
    val retract = Seq(Changelog.OpUpdatePre, Changelog.OpDelete)
    val sign = when(col(Changelog.OpCol).isin(retract: _*), -1L)
      .otherwise(1L)
    val cs = Seq(sum(sign).as(RowsCol)) ++ stats.flatMap { s =>
      val c = col(s.col)
      (if (s.count)
        Seq(sum(when(c.isNotNull, sign).otherwise(0L))
          .as(s"${s.col}__count")) else Nil) ++
        (if (s.sum) Seq(sum(c * sign).as(s"${s.col}__sum")) else Nil)
    }
    val delta = changes.groupBy(groupCols.map(col): _*)
      .agg(cs.head, cs.tail: _*)
    merge(state, delta, groupCols, stats).where(col(RowsCol) > 0)
  }

  /** Maintain a view INCLUDING min/max through an UPDATE/DELETE-carrying
    * delta — the path [[applyChangeSet]] rejects. Min/max are not
    * retraction-algebraic (subtracting the current min's value says
    * nothing about the next min without the full group), so the only
    * sound incremental move is a recompute scoped to the DIRTY groups —
    * exactly the groups receiving a retraction (`update_pre`/`delete`).
    * Inserts never dirty a group: min/max merge algebraically with new
    * rows (min(state_min, batch_min)), the same merge the append-only
    * path uses.
    *
    * Plan, for result ≡ `aggregateBatch(base, …, trackRows = true)`:
    *  1. dirty = distinct groups of the retraction rows — bounded by the
    *     BATCH, not the table;
    *  2. clean groups: state rows pass through the ordinary append-only
    *     [[merge]] with the batch's non-dirty rows (all inserts by
    *     construction — a group with any retraction is dirty);
    *  3. dirty groups: ALL stats recomputed from `base` (the post-change
    *     table) restricted to those groups. When the dirty-group count
    *     is ≤ `maxLiteralDirtyGroups` the restriction is a LITERAL
    *     null-safe predicate — static partition pruning when the group
    *     key is (or prefixes) the table's partitioning, so the recompute
    *     reads only dirty groups' partitions (spec-asserted); beyond the
    *     cap it falls back to a null-safe semi join (still ∝ dirty
    *     groups' data through dynamic pruning, never a full-history
    *     re-aggregation of clean groups).
    * A dirty group whose rows all vanish has no `base` rows and drops
    * out of the result — emptiness needs no [[RowsCol]] judgment on the
    * recompute side, though the state still carries it (required, as in
    * [[applyChangeSet]], and maintained through the clean-side merge).
    *
    * @param base the POST-change base table (the upserted snapshot the
    *   changelog describes). Pass the pruned/partitioned read — at
    *   100 TB the literal predicate is what keeps the recompute ∝
    *   touched groups. */
  def applyChangeSetWithRecompute(
      state: DataFrame,
      changes: DataFrame,
      base: DataFrame,
      groupCols: Seq[String],
      stats: Seq[Stat],
      maxLiteralDirtyGroups: Int = 10000): DataFrame = {
    require(stats.nonEmpty, "applyChangeSetWithRecompute: stats empty")
    require(state.columns.contains(RowsCol),
      s"applyChangeSetWithRecompute: state lacks $RowsCol — build it " +
        "with aggregateBatch(trackRows = true)")
    val retract = Seq(Changelog.OpUpdatePre, Changelog.OpDelete)
    val dirty = changes.where(col(Changelog.OpCol).isin(retract: _*))
      .select(groupCols.map(col): _*).distinct()

    val dirtyLit: Option[Array[org.apache.spark.sql.Row]] = {
      val capped = dirty.limit(maxLiteralDirtyGroups + 1).collect()
      if (capped.length <= maxLiteralDirtyGroups) Some(capped) else None
    }
    // (base-dirty, state-clean, changes-clean) under either strategy
    val (baseDirty, stateClean, cleanChanges) = dirtyLit match {
      case Some(rows) =>
        // OR-of-null-safe-conjunctions literal: partition-prunable and
        // well-defined under negation (<=> never yields NULL, so the
        // clean side is exactly the complement, null-keyed groups
        // included)
        val isDirty = rows.map { r =>
          groupCols.zipWithIndex
            .map { case (c, i) => col(c) <=> lit(r.get(i)) }
            .reduce(_ && _)
        }.reduceOption(_ || _).getOrElse(lit(false))
        (base.where(isDirty), state.where(!isDirty),
          changes.where(!isDirty))
      case None =>
        val d = dirty.select(groupCols.map(c =>
          col(c).as(s"__dirty_$c")): _*)
        def cond(df: DataFrame) = groupCols
          .map(c => df(c) <=> d(s"__dirty_$c")).reduce(_ && _)
        (base.join(d, cond(base), "left_semi"),
          state.join(d, cond(state), "left_anti"),
          changes.join(d, cond(changes), "left_anti"))
    }

    // clean side: every surviving change row is an insert (groups with
    // any retraction are dirty), so this IS the append-only merge
    val cleanAgg =
      aggregateBatch(cleanChanges, groupCols, stats, trackRows = true)
    val cleanMerged = merge(stateClean, cleanAgg, groupCols, stats)
    // dirty side: full recompute from the post-change base, scoped to
    // dirty groups — vanished groups simply produce no rows
    val recomputed =
      aggregateBatch(baseDirty, groupCols, stats, trackRows = true)
    cleanMerged.unionByName(recomputed)
  }
}
