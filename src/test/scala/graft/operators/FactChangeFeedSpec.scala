package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[FactChangeFeed]]: at-least-once change-feed consumption with a
  * crash-safe generation bookmark — replayed windows are identical,
  * multi-generation catch-up composes, deletes flow, and the diff is
  * restricted to the touched partitions. */
class FactChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_feed_").toString

  private def base(n: Int) =
    (1 to n).map(i => (i.toLong, i % 3, i * 10L)).toDF("k", "p", "v")

  private def ops(p: FactChangeFeed.Polled): Set[(String, Long, Int, Long)] =
    p.changes.select(col("op"), col("k"), col("p"), col("v"))
      .as[(String, Long, Int, Long)].collect().toSet

  test("initial poll delivers the full head as inserts; caught-up poll " +
      "returns None; bookmark survives") {
    val wh = tmp()
    val path = s"$wh/t"
    val bm = s"$wh/feed.bookmark"
    FactVersioned.upsert(spark, path, base(9), Seq("k"), "p")
    var seen = Set.empty[(String, Long, Int, Long)]
    val w = FactChangeFeed.poll(spark, path, Seq("k"), bm)(p => seen = ops(p))
    assert(w.exists(p => p.fromGen == -1L && p.toGen == 0L))
    assert(seen == base(9).collect().map(r =>
      ("insert", r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
    assert(FactChangeFeed.readBookmark(spark, bm).contains(0L))
    assert(FactChangeFeed.poll(spark, path, Seq("k"), bm)(_ => fail()).isEmpty)
  }

  test("handler failure leaves the bookmark; the identical window replays") {
    val wh = tmp()
    val path = s"$wh/t"
    val bm = s"$wh/feed.bookmark"
    FactVersioned.upsert(spark, path, base(9), Seq("k"), "p")
    FactChangeFeed.poll(spark, path, Seq("k"), bm)(_.changes.count())
    FactVersioned.upsert(spark, path,
      Seq((3L, 0, 999L)).toDF("k", "p", "v"), Seq("k"), "p")
    intercept[RuntimeException] {
      FactChangeFeed.poll(spark, path, Seq("k"), bm) { _ =>
        throw new RuntimeException("sink down")
      }
    }
    assert(FactChangeFeed.readBookmark(spark, bm).contains(0L),
      "failed handler must not advance the bookmark")
    var seen = Set.empty[(String, Long, Int, Long)]
    val w = FactChangeFeed.poll(spark, path, Seq("k"), bm)(p => seen = ops(p))
    assert(w.exists(p => p.fromGen == 0L && p.toGen == 1L))
    assert(seen == Set(
      ("update_pre", 3L, 0, 30L), ("update_post", 3L, 0, 999L)))
    assert(FactChangeFeed.readBookmark(spark, bm).contains(1L))
  }

  test("multi-generation catch-up composes into one window; " +
      "partition deletes flow as delete rows") {
    val wh = tmp()
    val path = s"$wh/t"
    val bm = s"$wh/feed.bookmark"
    val v0 = base(9)
    FactVersioned.upsert(spark, path, v0, Seq("k"), "p")
    FactChangeFeed.poll(spark, path, Seq("k"), bm)(_.changes.count())
    // gen 1: update k=3 (p=0); gen 2: delete partition p=1 entirely
    FactVersioned.upsert(spark, path,
      Seq((3L, 0, 111L)).toDF("k", "p", "v"), Seq("k"), "p")
    FactVersioned.replacePartitions(spark, path,
      v0.where(col("p") === 99), "p", touched = Seq(1))
    var seen = Set.empty[(String, Long, Int, Long)]
    val w = FactChangeFeed.poll(spark, path, Seq("k"), bm)(p => seen = ops(p))
    assert(w.exists(p => p.fromGen == 0L && p.toGen == 2L))
    val expectDeletes = v0.where(col("p") === 1).collect()
      .map(r => ("delete", r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(seen == expectDeletes +
      (("update_pre", 3L, 0, 30L)) + (("update_post", 3L, 0, 111L)))
    // untouched partition p=2 contributed nothing (and was never diffed)
    assert(!seen.exists(_._3 == 2))
  }

  test("randomized commit/poll interleavings: the feed-maintained view " +
      "always converges to the from-scratch truth; every generation " +
      "matches the model") {
    // seeded model-based fuzz over the whole CDC stack: random upserts,
    // partition deletes, compactions, and polls in arbitrary order;
    // key→partition stays stable (the partitioned-upsert contract)
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 3) {
      val wh = tmp()
      val path = s"$wh/t"
      val bm = s"$wh/feed.bookmark"
      var model = Map.empty[Long, Long] // key -> v (p = key % 3)
      val genModels = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
      def toDf(m: Map[Long, Long]) =
        m.toSeq.map { case (k, v) => (k, (k % 3).toInt, v) }
          .toDF("k", "p", "v")
      // seed commit
      model = (1 to 12).map(k => k.toLong -> rnd.nextLong(1000)).toMap
      FactVersioned.upsert(spark, path, toDf(model), Seq("k"), "p",
        retain = 50)
      genModels(0L) = model
      // feed-maintained count/sum view over partition groups
      val stats = Seq(IncrementalAgg.Stat("v", min = false, max = false))
      var view = IncrementalAgg.aggregateBatch(
        toDf(model).limit(0), Seq("p"), stats, trackRows = true)
      def pollApply(): Unit =
        FactChangeFeed.poll(spark, path, Seq("k"), bm) { w =>
          view = IncrementalAgg.applyChangeSet(view, w.changes, Seq("p"),
            stats).localCheckpoint()
        }
      (1 to 6).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 | 1 => // upsert a random batch (inserts + updates)
            val keys = (1 to 1 + rnd.nextInt(6))
              .map(_ => 1L + rnd.nextInt(20)).distinct
            val batch = keys.map(k => k -> rnd.nextLong(1000)).toMap
            model = model ++ batch
            val c = FactVersioned.upsert(spark, path, toDf(batch),
              Seq("k"), "p", retain = 50)
            genModels(c.gen) = model
          case 2 => // delete one partition entirely
            val p = rnd.nextInt(3)
            model = model.filterNot { case (k, _) => k % 3 == p }
            val c = FactVersioned.replacePartitions(spark, path,
              toDf(Map.empty), "p", touched = Seq(p), retain = 50)
            genModels(c.gen) = model
          case 3 => // content-preserving compaction of a live partition
            val live = model.keySet.map(_ % 3)
            if (live.nonEmpty) {
              val p = live.toSeq.sorted.apply(rnd.nextInt(live.size))
              val c = FactVersioned.compactPartitions(spark, path,
                Seq(s"p=$p"), "p", retain = 50)
              genModels(c.gen) = model
            }
        }
        if (rnd.nextBoolean()) pollApply()
      }
      pollApply() // drain
      // 1. the feed-maintained view equals a from-scratch recompute
      val got = view.select(col("p"), col("v__count"), col("v__sum"))
        .as[(Int, Long, Long)].collect().toSet
      val want = IncrementalAgg.aggregateBatch(
          FactVersioned.read(spark, path), Seq("p"), stats)
        .select(col("p"), col("v__count"), col("v__sum"))
        .as[(Int, Long, Long)].collect().toSet
      assert(got == want, s"round $round: view $got != truth $want")
      // 2. every retained generation reads back as its model snapshot
      genModels.foreach { case (g, m) =>
        val rowsG = FactVersioned.read(spark, path, Some(g))
          .select(col("k"), col("v")).as[(Long, Long)].collect().toMap
        assert(rowsG == m, s"round $round gen $g: $rowsG != model $m")
      }
    }
  }

  test("a window crossing an additive evolution commit surfaces the new " +
      "column as updates") {
    val wh = tmp()
    val path = s"$wh/t"
    val bm = s"$wh/feed.bookmark"
    val v0 = base(6)
    FactVersioned.upsert(spark, path, v0, Seq("k"), "p")
    FactChangeFeed.poll(spark, path, Seq("k"), bm)(_.changes.count())
    // evolve: p=1 rows gain a tag (values unchanged otherwise)
    FactVersioned.upsertEvolve(spark, path,
      v0.where(col("p") === 1).withColumn("tag", concat(lit("t"), col("k"))),
      Seq("k"), "p")
    var seen = Set.empty[(String, Long, Option[String])]
    FactChangeFeed.poll(spark, path, Seq("k"), bm) { w =>
      seen = w.changes.select(col("op"), col("k"), col("tag"))
        .as[(String, Long, Option[String])].collect().toSet
    }
    val p1Keys = v0.where(col("p") === 1).select("k").as[Long].collect()
    assert(seen == p1Keys.flatMap(k => Seq(
      ("update_pre", k, None),
      ("update_post", k, Some(s"t$k")))).toSet,
      s"evolution window must carry the new column as updates: $seen")
  }

  test("a window spanning a NESTED add/drop reconciles struct shapes: " +
      "added fields null-fill on the from side, dropped ones fall away") {
    val wh = tmp()
    val path = s"$wh/t"
    val metaBase = (1 to 6).map(i => (i.toLong, i % 3, s"s$i", i * 10L))
      .toDF("k", "p", "src", "score")
      .select(col("k"), col("p"),
        struct(col("src"), col("score")).as("meta"))
    FactVersioned.upsert(spark, path, metaBase, Seq("k"), "p", retain = 10)
    val g0 = FactVersioned.generations(spark, path).max
    // nested ADD + a data commit inside one window: the from-side
    // struct is NARROWER than the to-side — the diff must null-fill
    // meta.lang on the from side (exactly how the evolved generation
    // reads carried files), not throw a struct-resolution error
    FactVersioned.addNestedColumn(spark, path, Seq("meta", "lang"),
      org.apache.spark.sql.types.StringType, retain = 10)
    FactVersioned.upsert(spark, path,
      Seq((3L, 0)).toDF("k", "p").select(col("k"), col("p"),
        struct(lit("s3").as("src"), lit(30L).as("score"),
          lit("en").as("lang")).as("meta")),
      Seq("k"), "p", retain = 10)
    val g1 = FactVersioned.generations(spark, path).max
    val w = FactChangeFeed.window(spark, path, Seq("k"), Some(g0), g1)
    val got = w.select(col("op"), col("k"), col("meta.lang"))
      .as[(String, Long, Option[String])].collect().toSet
    assert(got == Set(
      ("update_pre", 3L, None), ("update_post", 3L, Some("en"))), got)
    // nested DROP spanning a window: the from-side struct is WIDER —
    // the dropped field falls away on both sides, so rows that only
    // differed in it emit nothing and real changes diff exactly
    FactVersioned.dropNestedColumn(spark, path, Seq("meta", "score"),
      retain = 10)
    FactVersioned.upsert(spark, path,
      Seq((4L, 1)).toDF("k", "p").select(col("k"), col("p"),
        struct(lit("zz").as("src"),
          lit(null).cast("string").as("lang")).as("meta")),
      Seq("k"), "p", retain = 10)
    val g2 = FactVersioned.generations(spark, path).max
    val w2 = FactChangeFeed.window(spark, path, Seq("k"), Some(g1), g2)
    val got2 = w2.select(col("op"), col("k"), col("meta.src"))
      .as[(String, Long, String)].collect().toSet
    assert(got2 == Set(
      ("update_pre", 4L, "s4"), ("update_post", 4L, "zz")), got2)
  }

  test("a window spanning ADD COLUMN ... DEFAULT fills the from side " +
      "with the DEFAULT (how the evolved generation reads carried " +
      "files) — unchanged rows emit nothing") {
    val wh = tmp()
    val path = s"$wh/t"
    FactVersioned.upsert(spark, path, base(6), Seq("k"), "p", retain = 10)
    val g0 = FactVersioned.generations(spark, path).max
    FactVersioned.addColumns(spark, path,
      Seq(org.apache.spark.sql.types.StructField("tier",
        org.apache.spark.sql.types.StringType)),
      retain = 10, defaults = Map("tier" -> "'std'"))
    // one real change inside the window; everything else carried
    FactVersioned.upsert(spark, path,
      Seq((3L, 0, 30L, "gold")).toDF("k", "p", "v", "tier"),
      Seq("k"), "p", retain = 10)
    val g2 = FactVersioned.generations(spark, path).max
    val w = FactChangeFeed.window(spark, path, Seq("k"), Some(g0), g2)
    val got = w.select(col("op"), col("k"), col("tier"))
      .as[(String, Long, Option[String])].collect().toSet
    // carried rows read 'std' on BOTH sides → only k=3 surfaces, with
    // the default as its true old value
    assert(got == Set(
      ("update_pre", 3L, Some("std")), ("update_post", 3L, Some("gold"))),
      got)
  }

  test("a window spanning a NESTED field RENAME is exact: unchanged " +
      "rows emit nothing, changes surface under the window-end field " +
      "name with their true old values") {
    val wh = tmp()
    val path = s"$wh/t"
    val metaBase = (1 to 6).map(i => (i.toLong, i % 3, s"s$i", i * 10L))
      .toDF("k", "p", "src", "score")
      .select(col("k"), col("p"),
        struct(col("src"), col("score")).as("meta"))
    FactVersioned.upsert(spark, path, metaBase, Seq("k"), "p", retain = 10)
    val g0 = FactVersioned.generations(spark, path).max
    FactVersioned.renameNestedColumn(spark, path, Seq("meta", "score"),
      "points", retain = 10)
    FactVersioned.upsert(spark, path,
      Seq((3L, 0)).toDF("k", "p").select(col("k"), col("p"),
        struct(lit("s3").as("src"), lit(999L).as("points")).as("meta")),
      Seq("k"), "p", retain = 10)
    val g2 = FactVersioned.generations(spark, path).max
    // the pure-rename window emits nothing
    assert(FactChangeFeed.window(spark, path, Seq("k"), Some(g0), g0 + 1)
      .count() == 0L, "a metadata-only nested rename window must be empty")
    // the spanning window: WITHOUT the nested translation every carried
    // row would surface as an update with a null-filled old value
    val w = FactChangeFeed.window(spark, path, Seq("k"), Some(g0), g2)
    val got = w.select(col("op"), col("k"), col("meta.points"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("update_pre", 3L, 30L), ("update_post", 3L, 999L)), got)
  }

  test("a window spanning a RENAME COLUMN commit is exact: unchanged " +
      "rows emit nothing, changes surface under the window-end name " +
      "with their true old values") {
    val wh = tmp()
    val path = s"$wh/t"
    val v0 = base(9)
    FactVersioned.upsert(spark, path, v0, Seq("k"), "p")
    // gen 1: metadata-only rename v → amount; gen 2: one update + one
    // insert, staged under the NEW name
    FactVersioned.renameColumns(spark, path, Map("v" -> "amount"))
    FactVersioned.upsert(spark, path,
      Seq((3L, 0, 999L), (100L, 1, 1L)).toDF("k", "p", "amount"),
      Seq("k"), "p")
    // the pure-rename window (0 → 1] declares no touched partitions
    // and emits NO change rows — a rename moves no data
    assert(FactChangeFeed.window(spark, path, Seq("k"), Some(0L), 1L)
      .count() == 0L,
      "a metadata-only rename window must be empty")
    // the spanning window (0 → 2]: the from side reads era-0 names
    // (v) and translates through the colmaps to the window-end name
    // (amount) — WITHOUT the translation every carried row of the
    // touched partitions would surface as an update with a null old
    // value
    val w = FactChangeFeed.window(spark, path, Seq("k"), Some(0L), 2L)
    assert(w.columns.contains("amount") && !w.columns.contains("v"),
      s"spanning window must emit window-end names, got ${w.columns.toSeq}")
    val got = w.select(col("op"), col("k"), col("p"), col("amount"))
      .as[(String, Long, Int, Long)].collect().toSet
    assert(got == Set(
      ("update_pre", 3L, 0, 30L),
      ("update_post", 3L, 0, 999L),
      ("insert", 100L, 1, 1L)), got)
  }

  test("a RENAMED KEY column spans a window: window-end key naming " +
      "resolves on both sides") {
    val wh = tmp()
    val path = s"$wh/t"
    FactVersioned.upsert(spark, path, base(6), Seq("k"), "p")
    FactVersioned.renameColumns(spark, path, Map("k" -> "id"))
    FactVersioned.upsert(spark, path,
      Seq((2L, 2, 222L)).toDF("id", "p", "v"), Seq("id"), "p")
    val w = FactChangeFeed.window(spark, path, Seq("id"), Some(0L), 2L)
    val got = w.select(col("op"), col("id"), col("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("update_pre", 2L, 20L), ("update_post", 2L, 222L)), got)
  }

  test("a bookmark older than retention fails loudly, never silently skips") {
    val wh = tmp()
    val path = s"$wh/t"
    val bm = s"$wh/feed.bookmark"
    FactVersioned.upsert(spark, path, base(9), Seq("k"), "p", retain = 1)
    FactChangeFeed.poll(spark, path, Seq("k"), bm)(_.changes.count())
    // two retain=1 commits expire gen 0
    FactVersioned.upsert(spark, path,
      Seq((3L, 0, 1L)).toDF("k", "p", "v"), Seq("k"), "p", retain = 1)
    FactVersioned.upsert(spark, path,
      Seq((3L, 0, 2L)).toDF("k", "p", "v"), Seq("k"), "p", retain = 1)
    val e = intercept[IllegalArgumentException] {
      FactChangeFeed.poll(spark, path, Seq("k"), bm)(_ => ())
    }
    assert(e.getMessage.contains("retention"))
  }

  test("the change feed works over MULTI-COLUMN partitioned tables: " +
      "windows diff exactly the touched leaf dirs") {
    val wh = tmp()
    val path = s"$wh/mc"
    def rows2(n: Int) = (1 to n).map(i =>
      (i.toLong, 2000 + i % 2, if (i % 4 < 2) "A" else "B", i * 10L))
      .toDF("k", "y", "s", "v")
    FactVersioned.upsertBy(spark, path, rows2(40), Seq("k"), Seq("y", "s"))
    // update one (y, s) leaf + insert into another
    FactVersioned.upsertBy(spark, path,
      Seq((4L, 2000, "A", 999L), (100L, 2001, "B", 1L))
        .toDF("k", "y", "s", "v"),
      Seq("k"), Seq("y", "s"))
    val w = FactChangeFeed.window(spark, path, Seq("k"), Some(0L), 1L)
    val got = w.select(col("op"), col("k"), col("y"), col("s"), col("v"))
      .as[(String, Long, Int, String, Long)].collect().toSet
    assert(got == Set(
      ("update_pre", 4L, 2000, "A", 40L),
      ("update_post", 4L, 2000, "A", 999L),
      ("insert", 100L, 2001, "B", 1L)), got)
  }
}
