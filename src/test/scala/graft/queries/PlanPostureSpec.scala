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

  test("bloom prune: the probe is a Filter BELOW the join, not after") {
    import org.apache.spark.sql.functions._
    import graft.operators.BloomPrune
    val spark0 = spark
    import spark0.implicits._
    // a real file scan: local relations constant-fold the probe away
    val dir = java.nio.file.Files.createTempDirectory("graft_pp_").toString
    (1L to 1000L).map(i => (i, i % 50)).toDF("row_id", "fk")
      .write.parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = (0L until 50L by 5).map(i => (i, s"d$i")).toDF("dk", "dv")
    val joined = BloomPrune.bloomPrunedJoin(fact, dim, "fk", "dk")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("graft_bloom_might_contain"),
      "probe expression missing from the physical plan")
    // the probe must appear on the fact SCAN side (below the join):
    // in the printed tree the join header precedes its children, so
    // the probe string must occur after the first join operator line
    val joinAt = math.max(p.indexOf("Join"), 0)
    assert(p.indexOf("graft_bloom_might_contain") > joinAt,
      "bloom probe is not under the join subtree")
  }

  test("manifest build is a partial+final aggregation over the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pp_").toString
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    (1 to 100).map(i => (i.toLong, i * 2L)).toDF("k", "v")
      .repartition(2).write.parquet(s"$dir/t")
    val m = graft.operators.DataSkipping.buildManifest(
      spark, s"$dir/t", Seq("k"))
    val p = m.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"manifest agg lost map-side combine:\n${p.take(800)}")
  }

  test("q94/q95: sketch aggregates keep partial+final shape; q95 pins " +
      "its group clustering") {
    val p94 = plan("q94_approx_distinct")
    assert(p94.contains("approx_count_distinct"), p94.take(600))
    assert("HashAggregate".r.findAllIn(p94).size >= 2 ||
      "ObjectHashAggregate".r.findAllIn(p94).size >= 2, p94.take(900))
    val p95 = plan("q95_approx_quantiles")
    assert(p95.contains("percentile_approx"), p95.take(600))
    assert(p95.contains("hashpartitioning(event_type") &&
      p95.contains("Sort"),
      "q95 lost its determinism pinning (repartition+sort)")
  }

  test("z-order interleave stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // spark.range is a codegen source; a local Seq constant-folds
      val df = spark.range(100)
        .select(col("id").as("x"), (col("id") * 3 % 7).as("y"))
        .select(graft.operators.ZOrder.interleaveBits(
          Seq(col("x"), col("y")), bits = 8).as("z"))
      val s = org.apache.spark.sql.execution.debug.codegenString(
        df.queryExecution.executedPlan)
      assert(!s.contains("Found 0 WholeStageCodegen"), s.take(300))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
