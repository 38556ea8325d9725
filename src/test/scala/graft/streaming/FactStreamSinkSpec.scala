package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{FactChangeFeed, FactVersioned}

class FactStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_fss_$tag").toString

  test("applyBatch commits with the batch marker; redelivery skips") {
    val root = tmp("redeliver") + "/t"
    val b0 = Seq((1L, "a", 2020), (2L, "b", 2020), (3L, "c", 2021))
      .toDF("id", "v", "year")
    val c0 = FactStreamSink.applyBatch(spark, root, b0, Seq("id"), "year",
      sinkId = "s1", batchId = 0L)
    assert(c0.nonEmpty && c0.get.gen === 0L)
    assert(FactStreamSink.lastBatch(spark, root, "s1").contains(0L))

    val b1 = Seq((2L, "b2", 2020), (4L, "d", 2021)).toDF("id", "v", "year")
    val c1 = FactStreamSink.applyBatch(spark, root, b1, Seq("id"), "year",
      sinkId = "s1", batchId = 1L)
    assert(c1.nonEmpty && c1.get.gen === 1L)

    // redelivery of batch 1 (crash before checkpoint commit): SKIP —
    // no new generation, table content unchanged
    val redo = FactStreamSink.applyBatch(spark, root, b1, Seq("id"), "year",
      sinkId = "s1", batchId = 1L)
    assert(redo.isEmpty)
    assert(FactVersioned.generations(spark, root) === Seq(0L, 1L))
    val rows = FactVersioned.read(spark, root).as[(Long, String, Int)]
      .collect().toSet
    assert(rows === Set((1L, "a", 2020), (2L, "b2", 2020),
      (3L, "c", 2021), (4L, "d", 2021)))
    // a stale batchId (0) is also a redelivery — skipped
    assert(FactStreamSink.applyBatch(spark, root, b0, Seq("id"), "year",
      "s1", 0L).isEmpty)
    // an independent sink identity is not confused by s1's marker
    assert(FactStreamSink.lastBatch(spark, root, "s2").isEmpty)
  }

  test("change feed sees zero rows across a skipped redelivery") {
    val root = tmp("cdc") + "/t"
    val bm = tmp("cdc_bm") + "/bookmark"
    val b0 = Seq((1L, "a", 2020), (2L, "b", 2021)).toDF("id", "v", "year")
    FactStreamSink.applyBatch(spark, root, b0, Seq("id"), "year", "s", 0L)
    var seen = 0L
    FactChangeFeed.poll(spark, root, Seq("id"), bm) { w =>
      seen = w.changes.count()
    }
    assert(seen === 2L) // initial snapshot as inserts

    // redelivered batch: no generation, so the feed is caught up —
    // poll returns None and the handler never fires
    FactStreamSink.applyBatch(spark, root, b0, Seq("id"), "year", "s", 0L)
    val polled = FactChangeFeed.poll(spark, root, Seq("id"), bm) { w =>
      fail(s"handler must not fire on a skipped redelivery: ${w.fromGen}")
    }
    assert(polled.isEmpty)
  }

  test("end-to-end through a real streaming query with checkpoint") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("e2e") + "/t"
    val ckpt = tmp("e2e_ckpt")
    val input = MemoryStream[(Long, String, Int)]
    val q = FactStreamSink.start(
      input.toDF().toDF("id", "v", "year"), root, Seq("id"), "year",
      checkpointDir = ckpt, sinkId = "e2e")
    try {
      input.addData((1L, "a", 2020), (2L, "b", 2020))
      q.processAllAvailable()
      input.addData((2L, "b2", 2020), (3L, "c", 2021))
      q.processAllAvailable()
    } finally q.stop()
    val rows = FactVersioned.read(spark, root).as[(Long, String, Int)]
      .collect().toSet
    assert(rows === Set((1L, "a", 2020), (2L, "b2", 2020), (3L, "c", 2021)))
    // two non-empty batches → two generations, markers recorded
    assert(FactVersioned.generations(spark, root).size === 2)
    assert(FactStreamSink.lastBatch(spark, root, "e2e").contains(1L))

    // RESTART from the same checkpoint: no data pending → no new
    // generation (the checkpoint replays nothing; were a batch
    // redelivered, the marker would skip it)
    val q2 = FactStreamSink.start(
      input.toDF().toDF("id", "v", "year"), root, Seq("id"), "year",
      checkpointDir = ckpt, sinkId = "e2e")
    try q2.processAllAvailable() finally q2.stop()
    assert(FactVersioned.generations(spark, root).size === 2)
  }

  test("commit properties round-trip and reject newlines") {
    val root = tmp("props") + "/t"
    val df = Seq((1L, 2020)).toDF("id", "year")
    FactVersioned.replacePartitions(spark, root, df, "year", Seq(2020),
      properties = Map("graft.stream.s.batch" -> "7", "who" -> "spec"))
    assert(FactVersioned.commitProperties(spark, root, 0L) ===
      Map("graft.stream.s.batch" -> "7", "who" -> "spec"))
    // generations without properties read as empty
    FactVersioned.replacePartitions(spark, root, df, "year", Seq(2020))
    assert(FactVersioned.commitProperties(spark, root, 1L) === Map.empty)
    intercept[IllegalArgumentException] {
      FactVersioned.replacePartitions(spark, root, df, "year", Seq(2020),
        properties = Map("bad\nkey" -> "v"))
    }
  }

  test("maintainAnnCols keeps the fact ANN index live across stream " +
      "batches; without it the head generation is un-queryable") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.FactAnnIndex
    val root = tmp("ann") + "/t"
    val ckpt = tmp("ann_ckpt")
    def vec(i: Int): Seq[Double] =
      (0 until 8).map(j => math.sin(i * 17 + j * 5) + (if (j % 4 == i % 4) 3.0 else 0.0))
    val seed = (1 to 40).map(i => (i.toLong, i % 2, vec(i)))
      .toDF("id", "p", "vec")
    FactVersioned.replacePartitions(spark, root, seed, "p", Seq(0, 1))
    FactAnnIndex.writeIndex(spark, root, "id", "vec", nLists = 4)

    val input = MemoryStream[(Long, Int, Seq[Double])]
    val q = FactStreamSink.start(
      input.toDF().toDF("id", "p", "vec"), root, Seq("id"), "p",
      checkpointDir = ckpt, sinkId = "ann",
      maintainAnnCols = Seq("vec"))
    try {
      input.addData((100L, 0, vec(100)), (101L, 1, vec(101)))
      q.processAllAvailable()
      // index caught up: the head generation answers, and the streamed
      // rows are part of the searchable corpus
      val out = FactAnnIndex.topK(spark, root, "vec", k = 3, nProbe = 4)
      val ids = out.select("query_id").distinct()
        .as[Long].collect().toSet
      assert(ids.contains(100L) && ids.contains(101L))
    } finally q.stop()

    // counterfactual: a commit without maintenance leaves the head
    // un-indexed and topK fails loudly rather than answering stale
    FactStreamSink.applyBatch(spark, root,
      Seq((200L, 0, vec(200))).toDF("id", "p", "vec"),
      Seq("id"), "p", "ann", batchId = 99L)
    val e = intercept[IllegalArgumentException] {
      FactAnnIndex.topK(spark, root, "vec", k = 3).collect()
    }
    assert(e.getMessage.contains("un-indexed"))
  }

  test("marker aged out of retention degrades to idempotent replay") {
    val root = tmp("aged") + "/t"
    val b0 = Seq((1L, "a", 2020), (2L, "b", 2021)).toDF("id", "v", "year")
    FactStreamSink.applyBatch(spark, root, b0, Seq("id"), "year", "s", 0L,
      retain = 1)
    // foreign commits (no marker) expire the marker generation
    (1 to 3).foreach { i =>
      FactVersioned.upsert(spark, root,
        Seq((10L + i, "x", 2021)).toDF("id", "v", "year"),
        Seq("id"), "year", retain = 1)
    }
    assert(FactStreamSink.lastBatch(spark, root, "s").isEmpty)
    val before = FactVersioned.read(spark, root)
      .as[(Long, String, Int)].collect().toSet
    // redelivery now RE-APPLIES (marker gone) but converges: content
    // identical, so downstream diffs are empty
    val c = FactStreamSink.applyBatch(spark, root, b0, Seq("id"), "year",
      "s", 0L, retain = 1)
    assert(c.nonEmpty)
    val after = FactVersioned.read(spark, root)
      .as[(Long, String, Int)].collect().toSet
    assert(after === before)
  }

  test("exactly-once streaming into a MULTI-COLUMN partitioned table: " +
      "markers skip redeliveries, commits touch only the batch's " +
      "leaf dirs") {
    val root = tmp("mc") + "/t"
    val b0 = Seq((1L, "a", 2020, "X"), (2L, "b", 2020, "Y"),
        (3L, "c", 2021, "X"))
      .toDF("id", "v", "year", "src")
    val c0 = FactStreamSink.applyBatchBy(spark, root, b0, Seq("id"),
      Seq("year", "src"), sinkId = "m1", batchId = 0L)
    assert(c0.nonEmpty && c0.get.gen === 0L)
    // batch 1 touches exactly one (year, src) leaf
    val b1 = Seq((2L, "b2", 2020, "Y")).toDF("id", "v", "year", "src")
    val c1 = FactStreamSink.applyBatchBy(spark, root, b1, Seq("id"),
      Seq("year", "src"), sinkId = "m1", batchId = 1L)
    assert(c1.nonEmpty && c1.get.rewrittenDirs === Seq("year=2020/src=Y"))
    // redelivery skipped; content exact
    assert(FactStreamSink.applyBatchBy(spark, root, b1, Seq("id"),
      Seq("year", "src"), "m1", 1L).isEmpty)
    assert(FactVersioned.read(spark, root)
      .as[(Long, String, Int, String)].collect().toSet ===
      Set((1L, "a", 2020, "X"), (2L, "b2", 2020, "Y"),
        (3L, "c", 2021, "X")))
    // the change feed sees zero rows for the skipped redelivery window
    assert(FactVersioned.generations(spark, root) === Seq(0L, 1L))
  }
}
