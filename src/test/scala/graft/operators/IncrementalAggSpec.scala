package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IncrementalAgg.Stat

/** Incremental rollup maintenance ≡ full recompute, across multiple
  * refresh cycles and crash-safe snapshots. Exactness is asserted on
  * integer columns (double sums differ in float association between
  * incremental and full paths by design). */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val stats = Seq(Stat("v"))

  test("refresh over 3 batches equals aggregating the union") {
    val dir = java.nio.file.Files.createTempDirectory("graft_iagg").toString
    val path = s"$dir/rollup"
    val batches = Seq(
      Seq(("a", 1L), ("a", 2L), ("b", 10L)),
      Seq(("a", 3L), ("c", 7L)),
      Seq(("b", 5L), ("c", 0L), ("c", -2L)))
      .map(_.toDF("k", "v"))

    batches.foreach(b =>
      IncrementalAgg.refresh(spark, path, b, Seq("k"), stats))

    val full = IncrementalAgg.aggregateBatch(
      batches.reduce(_ unionByName _), Seq("k"), stats)
    val incr = spark.read.parquet(path)
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty,
      incr.collect().mkString(" | "))
    // derived average at read time: sum/count
    val avgA = incr.where($"k" === "a")
      .select(col("v__sum") / col("v__count")).as[Double].head()
    assert(avgA === 2.0)
  }

  test("batchId guard makes at-least-once replay safe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_iagg2").toString
    val path = s"$dir/rollup"
    val b1 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    IncrementalAgg.refresh(spark, path, b1, Seq("k"), stats,
      batchId = Some(9L))
    // replay of the SAME batch (bookmark not yet advanced) → no-op
    val replayed = IncrementalAgg.refresh(spark, path, b1, Seq("k"), stats,
      batchId = Some(9L))
    assert(replayed.where($"k" === "a").select("v__count")
      .as[Long].head() === 1L)
    // a genuinely new batch applies — numeric ids have no lexicographic
    // trap (10 > 9, where the string "batch-10" < "batch-9")
    val b2 = Seq(("a", 5L)).toDF("k", "v")
    val after = IncrementalAgg.refresh(spark, path, b2, Seq("k"), stats,
      batchId = Some(10L))
    assert(after.where($"k" === "a")
      .select("v__count", "v__sum").as[(Long, Long)].head() === ((2L, 6L)))
    // LATE redelivery of the older batch: skipped
    val late = IncrementalAgg.refresh(spark, path, b1, Seq("k"), stats,
      batchId = Some(9L))
    assert(late.where($"k" === "a")
      .select("v__count", "v__sum").as[(Long, Long)].head() === ((2L, 6L)))
  }

  test("incremental distinct via HLL sketch union == single-pass estimate") {
    // the sketch path for the one aggregate IncrementalAgg excludes:
    // per-batch hll_sketch_agg states hll_union_agg-merged give the
    // SAME estimate as one pass over the union (sketches deterministic)
    val b1 = (1L to 4000L).map(i => i % 997).toDF("v")
    val b2 = (1L to 4000L).map(i => i % 1499).toDF("v")
    val full = b1.unionByName(b2)
      .selectExpr("hll_sketch_estimate(hll_sketch_agg(v)) AS est")
      .as[Long].head()
    val merged = b1.selectExpr("hll_sketch_agg(v) AS sk")
      .unionByName(b2.selectExpr("hll_sketch_agg(v) AS sk"))
      .selectExpr("hll_sketch_estimate(hll_union_agg(sk)) AS est")
      .as[Long].head()
    assert(merged === full)
    // and the estimate is close to the true distinct count (1499)
    assert(math.abs(merged - 1499L).toDouble / 1499 <= 0.05, s"est=$merged")
  }

  test("merge shuffles state rows, not history: new group appears, old kept") {
    val state = Seq(("a", 3L, 6L, 1L, 3L), ("b", 1L, 10L, 10L, 10L))
      .toDF("k", "v__count", "v__sum", "v__min", "v__max")
    val batchAgg = IncrementalAgg.aggregateBatch(
      Seq(("b", 2L), ("z", 99L)).toDF("k", "v"), Seq("k"), stats)
    val out = IncrementalAgg.merge(state, batchAgg, Seq("k"), stats)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      ("a", 3L, 6L, 1L, 3L),
      ("b", 2L, 12L, 2L, 10L),
      ("z", 1L, 99L, 99L, 99L)))
  }

  test("applyChangeSet: retractions, group migration, emptied groups") {
    val stats = Seq(IncrementalAgg.Stat("v", min = false, max = false))
    val cur = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("id", "g", "v")
    val state = IncrementalAgg.aggregateBatch(cur, Seq("g"), stats,
      trackRows = true)
    // update moves id=3 out of b (b empties), id=2 changes value,
    // id=9 is a brand-new row in a brand-new group
    val updates = Seq((2L, "a", 25L), (3L, "c", 30L), (9L, "d", 5L))
      .toDF("id", "g", "v")
    val changes = Changelog.changeSet(cur, updates, Seq("id"))
    val view = IncrementalAgg.applyChangeSet(state, changes, Seq("g"), stats)
      .drop(IncrementalAgg.RowsCol)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // ground truth: recompute over the upserted table
    val truth = IncrementalAgg.aggregateBatch(
      Upsert.upsert(cur, updates, Seq("id")), Seq("g"), stats)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(view == truth, s"view=$view truth=$truth")
    assert(!view.exists(_._1 == "b"), "emptied group must vanish")
    assert(view.exists(_._1 == "c") && view.exists(_._1 == "d"))
  }

  test("applyChangeSet rejects min/max and rowless state") {
    val cur = Seq((1L, "a", 1L)).toDF("id", "g", "v")
    val ch = Changelog.changeSet(cur, cur, Seq("id"))
    val stats0 = Seq(IncrementalAgg.Stat("v", min = false, max = false))
    intercept[IllegalArgumentException] {
      IncrementalAgg.applyChangeSet(
        IncrementalAgg.aggregateBatch(cur, Seq("g"), stats0,
          trackRows = true),
        ch, Seq("g"), Seq(IncrementalAgg.Stat("v")))
    }
    intercept[IllegalArgumentException] { // state without __rows
      IncrementalAgg.applyChangeSet(
        IncrementalAgg.aggregateBatch(cur, Seq("g"), stats0),
        ch, Seq("g"), stats0)
    }
  }

  test("applyChangeSetWithRecompute: min/max view ≡ from-scratch under " +
      "updates, deletes, migration, null keys — both strategies") {
    val stats = Seq(IncrementalAgg.Stat("v"))
    val cur = Seq(
      (1L, Some("a"), 10L), (2L, Some("a"), 20L), (3L, Some("a"), 30L),
      (4L, Some("b"), 5L), (5L, Some("b"), 50L),
      (6L, Option.empty[String], 7L), (7L, Some("c"), 70L)
    ).toDF("id", "g", "v")
    val state = IncrementalAgg.aggregateBatch(cur, Seq("g"), stats,
      trackRows = true)
    // delete the max of a (min/max must recompute), delete ALL of c
    // (group vanishes), migrate id=4 b→d (b dirtied, d clean insert),
    // update the null-keyed group's value (null-keyed dirty group),
    // fresh insert into clean-new group e
    val next = Seq(
      (1L, Some("a"), 10L), (2L, Some("a"), 20L),
      (4L, Some("d"), 5L), (5L, Some("b"), 50L),
      (6L, Option.empty[String], 9L), (8L, Some("e"), 80L)
    ).toDF("id", "g", "v")
    val changes = Changelog.changeSet(cur, next, Seq("id"),
      dedupNullKeyed = true, emitDeletes = true)
    val truth = IncrementalAgg.aggregateBatch(next, Seq("g"), stats,
        trackRows = true)
      .as[(Option[String], Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    for (cap <- Seq(10000, 0)) { // literal predicate vs join fallback
      val view = IncrementalAgg.applyChangeSetWithRecompute(
          state, changes, next, Seq("g"), stats,
          maxLiteralDirtyGroups = cap)
        .as[(Option[String], Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      assert(view == truth, s"cap=$cap view=$view truth=$truth")
    }
    assert(!truth.exists(_._1.contains("c")), "emptied group gone")
    assert(truth.exists(_._1.contains("e")), "clean insert group present")
  }

  test("applyChangeSetWithRecompute reads ONLY dirty groups' partitions") {
    val stats = Seq(IncrementalAgg.Stat("v"))
    val dirs = java.nio.file.Files
      .createTempDirectory("graft_iagg_").toString
    val cur = Seq(
      (1L, "a", 10L), (2L, "a", 20L),
      (3L, "b", 30L), (4L, "b", 40L),
      (5L, "c", 50L)).toDF("id", "g", "v")
    cur.write.partitionBy("g").parquet(s"$dirs/base")
    val state = IncrementalAgg.aggregateBatch(cur, Seq("g"), stats,
      trackRows = true)
    // only group b receives a retraction (delete id=4)
    val next = cur.where($"id" =!= 4L)
    next.write.partitionBy("g").parquet(s"$dirs/next")
    val changes = Changelog.changeSet(cur, next, Seq("id"),
      emitDeletes = true)
    val base = spark.read.parquet(s"$dirs/next")
    val view = IncrementalAgg.applyChangeSetWithRecompute(
      state, changes, base, Seq("g"), stats)
    val truth = IncrementalAgg.aggregateBatch(next, Seq("g"), stats,
        trackRows = true)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(view.as[(String, Long, Long, Long, Long, Long)]
      .collect().toSet == truth)
    // the recompute scan must prune to the dirty group's partition
    val scans = view.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString
            .contains("/next")) => f
    }
    assert(scans.nonEmpty, "expected a scan of the base table")
    val parts = scans.map(_.selectedPartitions.partitionCount).max
    assert(parts == 1,
      s"recompute must read ONLY the dirty group's partition, read $parts")
  }

  test("applyChangeSet: deletes retract; all-NULL groups survive") {
    val stats = Seq(IncrementalAgg.Stat("v", min = false, max = false))
    val cur = Seq((1L, "a", Some(10L)), (2L, "b", Option.empty[Long]))
      .toDF("id", "g", "v")
    val state = IncrementalAgg.aggregateBatch(cur, Seq("g"), stats,
      trackRows = true)
    // generation-style delta deleting id=1 entirely
    val next = cur.where($"id" =!= 1L)
    val ch = Changelog.changeSet(cur, next, Seq("id"), emitDeletes = true)
    val view = IncrementalAgg.applyChangeSet(state, ch, Seq("g"), stats)
      .select("g").as[String].collect().toSet
    assert(view == Set("b"),
      "deleted group must vanish; the all-NULL-valued group must survive")
  }
}
