package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Physical-plan regression guards for the scale posture PLANS_r2.md
  * documents: pushdown reaching the scan, pruned read schemas, dim
  * broadcasts, partial aggregation. A refactor that silently loses one
  * of these would still pass the value-based oracle — these fail it. */
class PlanPostureSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    // default maxMetadataStringLength (100) truncates ReadSchema before
    // later columns appear — the negative assert below would be vacuous
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q02: predicate AND projection pushdown reach the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(800))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(800))
    // pruned ReadSchema: quantities+keys only, no returnflag/linestatus
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint"), p.take(800))
    assert(!p.contains("l_returnflag"), "scan reads unused columns")
  }

  test("q03: star joins broadcast the dimension sides") {
    val p = plan("q03_star_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "dim-fact star join fell back to sort-merge")
  }

  test("q01: aggregation is partial+final (map-side combine present)") {
    val p = plan("q01_pricing_summary")
    // two HashAggregate operators around one exchange = partial+final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
  }

  test("q23: priority selection keeps the priority table broadcast") {
    val p = plan("q23_priority_top1")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(1200))
  }

  test("q01: whole-stage codegen spans exist (no silent interpreted " +
      "fallback on the core agg path)") {
    // AQE wraps unexecuted stages, hiding WholeStageCodegen from the
    // debug traversal — disable it for this one structural probe
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      val s = org.apache.spark.sql.execution.debug.codegenString(
        df.queryExecution.executedPlan)
      // "Found N WholeStageCodegen subtrees" — zero would mean Spark
      // silently dropped to interpreted and the plan string wouldn't say
      assert(!s.contains("Found 0 WholeStageCodegen"), s.take(300))
      assert(s.contains("WholeStageCodegen"), s.take(300))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q74: the gated plan IS the LSH signature/bucket path " +
      "(round-4 silent-reroute regression guard)") {
    // routing decision: pinned params keep LSH even where pruning is
    // weak; auto-tune at the same threshold falls back to exact — both
    // directions of the documented fallback semantics
    assert(graft.operators.Dedup.approxPathDecision(
      VectorQueries.Q74Threshold, VectorQueries.Q74LshBits,
      VectorQueries.Q74LshTables) === "lsh")
    assert(graft.operators.Dedup.approxPathDecision(
      VectorQueries.Q74Threshold) === "exact")
    // and the executed plan really contains the signature explode — the
    // exact path has no Generate/posexplode anywhere
    val p = plan("q74_neardup_approx")
    assert(p.contains("posexplode") || p.contains("Generate"),
      "q74 plan lost the LSH signature explode — rerouted to exact?")
  }
}
