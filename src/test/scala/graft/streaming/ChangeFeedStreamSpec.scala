package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FactVersioned

/** [[ChangeFeedProvider]]: a plain `readStream` over a FactVersioned
  * table receives exactly the change windows the poll loop computes —
  * generation-numbered offsets, checkpointed across restarts, no
  * redelivery of committed windows. */
class ChangeFeedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def base(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, i % 3, i * 10L)).toDF("k", "p", "v")

  test("streaming change feed delivers each generation window, " +
      "checkpointed across restarts, with poll-loop-identical rows " +
      "and bit-identical replays") {
    val wh = Files.createTempDirectory("graft_cfstream_").toString
    val path = s"$wh/t"
    val ckpt = s"$wh/ckpt"
    // retention sized above consumer lag (the documented contract):
    // a restart may exactly-replay the checkpoint's uncommitted tail
    // batch, whose from-generation must still exist
    def commit(df: DataFrame): Unit = {
      FactVersioned.upsert(spark, path, df, Seq("k"), "p", retain = 10)
      ()
    }
    commit(base(30))

    // batchId -> window rows; a REDELIVERED batchId (the at-least-once
    // tail replay after stop-before-commit-log) must carry the
    // IDENTICAL rows — generations are immutable
    val got = mutable.LinkedHashMap.empty[Long, Set[(Long, Int, Long, String)]]
    def startStream() = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("path", path)
      .option("keys", "k")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val rows = df.select(col("k"), col("p"), col("v"),
          col("op")).as[(Long, Int, Long, String)].collect().toSet
        got.synchronized {
          got.get(batchId) match {
            case Some(prev) => assert(prev == rows,
              s"replayed batch $batchId diverged")
            case None => got(batchId) = rows
          }
        }
        ()
      }
      .start()

    // batch 0: the from-empty window — every row an insert
    val q1 = startStream()
    q1.processAllAvailable()
    assert(got.keySet == Set(0L))
    assert(got(0L) ==
      (1 to 30).map(i => (i.toLong, i % 3, i * 10L, "insert")).toSet)

    // a one-partition upsert commits generation 1 → exactly the diff
    // window, matching the batch poll's computation
    commit(Seq((3L, 0, 999L), (100L, 1, 1000L)).toDF("k", "p", "v"))
    q1.processAllAvailable()
    assert(got.keySet == Set(0L, 1L))
    val polled = graft.operators.FactChangeFeed
      .window(spark, path, Seq("k"), Some(0L), 1L)
      .select(col("k"), col("p"), col("v"), col("op"))
      .as[(Long, Int, Long, String)].collect().toSet
    assert(got(1L) == polled)
    assert(got(1L) == Set(
      (3L, 0, 30L, "update_pre"), (3L, 0, 999L, "update_post"),
      (100L, 1, 1000L, "insert")))
    q1.stop()

    // commits while the stream is DOWN, then restart on the same
    // checkpoint: processed windows never re-deliver NEW content (a
    // replayed tail batch re-asserts identical rows above), and the
    // two offline commits coalesce into one new window
    commit(Seq((6L, 0, 777L)).toDF("k", "p", "v"))
    commit(Seq((6L, 0, 778L)).toDF("k", "p", "v"))
    val q2 = startStream()
    q2.processAllAvailable()
    assert(got.keySet == Set(0L, 1L, 2L),
      s"expected exactly batches 0,1,2; got ${got.keySet}")
    assert(got(2L) == Set(
      (6L, 0, 60L, "update_pre"), (6L, 0, 778L, "update_post")))

    // caught up: restart delivers no new window
    q2.stop()
    val q3 = startStream()
    q3.processAllAvailable()
    assert(got.keySet == Set(0L, 1L, 2L))
    q3.stop()
  }

  test("missing options fail loudly") {
    intercept[IllegalArgumentException] {
      spark.readStream
        .format(classOf[ChangeFeedProvider].getName)
        .option("keys", "k")
        .load()
    }
  }

  test("additive schema evolution mid-stream: the running query keeps " +
      "its pinned schema, a restart picks up the widened schema, and " +
      "the crossing window null-fills the from side") {
    val wh = Files.createTempDirectory("graft_cfevolve_").toString
    val path = s"$wh/t"
    val ckpt = s"$wh/ckpt"
    def commit(df: DataFrame): Unit = {
      FactVersioned.upsert(spark, path, df, Seq("k"), "p", retain = 10)
      ()
    }
    commit(base(10))
    val cols = mutable.LinkedHashMap.empty[Long, Seq[String]]
    val rows = mutable.LinkedHashMap.empty[Long, Set[Seq[Any]]]
    def start() = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("path", path)
      .option("keys", "k")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        val r = df.collect().map(_.toSeq).toSet
        cols.synchronized { cols(id) = df.columns.toSeq; rows(id) = r }
        ()
      }
      .start()
    val q1 = start()
    q1.processAllAvailable()
    assert(cols(0L) == Seq("k", "p", "v", "op"))
    // widen the schema and commit widened data WHILE the query runs:
    // the running query's source pinned the narrow schema — deliveries
    // keep exactly those columns (the fixed-schema contract)
    FactVersioned.addColumns(spark, path,
      Seq(org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType)), retain = 10)
    commit(Seq((3L, 0, 999L, 5L)).toDF("k", "p", "v", "w"))
    q1.processAllAvailable()
    val live = cols.keys.max
    assert(live > 0L && cols(live) == Seq("k", "p", "v", "op"),
      s"running query must keep its pinned schema, got ${cols(live)}")
    assert(rows.values.flatten.exists(_ ==
      Seq(3L, 0, 999L, "update_post")),
      "the widened commit's update must deliver (narrow projection)")
    q1.stop()
    // a commit while down, then restart: the NEW source pins the
    // widened schema; its window crosses generations on both sides of
    // the evolution, so the from side null-fills `w`
    commit(Seq((4L, 1, 444L, 7L)).toDF("k", "p", "v", "w"))
    val q2 = start()
    q2.processAllAvailable()
    val last = cols.keys.max
    assert(last > live && cols(last) == Seq("k", "p", "v", "w", "op"),
      s"restart must pick up the widened schema, got ${cols(last)}")
    assert(rows(last).contains(Seq(4L, 1, 40L, null, "update_pre")),
      s"from-side rows must null-fill the evolved column: ${rows(last)}")
    assert(rows(last).contains(Seq(4L, 1, 444L, 7L, "update_post")))
    q2.stop()
  }
}
