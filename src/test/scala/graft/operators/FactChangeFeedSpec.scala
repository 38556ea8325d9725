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
}
