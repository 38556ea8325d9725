package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventAggregates._

class EventAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked hourly windowed aggregation over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Update()).start()
    input.addData(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:55:00"), 2, "click", 2.0),
      Event(3, ts("2024-01-01 11:05:00"), 1, "view", 3.0))
    q.processAllAvailable()
    val out = spark.table("hourly")
      .select("window_start", "event_type", "n_events")
      .as[(Timestamp, String, Long)].collect().toSet
    q.stop()
    assert(out.contains((ts("2024-01-01 10:00:00"), "click", 2L)))
    assert(out.contains((ts("2024-01-01 11:00:00"), "view", 1L)))
  }

  test("watermark drops events later than the lateness bound") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = hourlyCounts(input.toDF(), lateness = "30 minutes")
      .writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append()).start()
    input.addData(Event(1, ts("2024-01-01 10:10:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // advance watermark far past the first window
    input.addData(Event(2, ts("2024-01-01 13:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // straggler for the long-closed 10:00 window → must be dropped
    input.addData(Event(3, ts("2024-01-01 10:20:00"), 1, "click", 9.0))
    q.processAllAvailable()
    val out = spark.table("late")
      .select("window_start", "n_events")
      .as[(Timestamp, Long)].collect().toMap
    q.stop()
    assert(out(ts("2024-01-01 10:00:00")) === 1L) // straggler excluded
  }

  test("streaming dedup drops re-delivered event ids within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = dedupEvents(input.toDF(), lateness = "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0)) // in-batch dup
    q.processAllAvailable()
    input.addData( // cross-batch re-delivery of id 1
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:05:00"), 1, "view", 2.0))
    q.processAllAvailable()
    val n = spark.table("deduped").count()
    q.stop()
    assert(n === 2) // ids 1 and 2, each exactly once
  }

  test("streaming near-dup suppression drops same-signature texts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TextEvent]
    val q = dedupNearText(input.toDF(), "text", lateness = "1 hour")
      .writeStream.format("memory").queryName("neardedup")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      TextEvent(1, ts("2024-01-01 10:00:00"), "the quick brown fox"),
      TextEvent(2, ts("2024-01-01 10:01:00"), "the quick brown fox"))
    q.processAllAvailable()
    input.addData( // cross-batch duplicate text + one genuinely new text
      TextEvent(3, ts("2024-01-01 10:02:00"), "the quick brown fox"),
      TextEvent(4, ts("2024-01-01 10:03:00"), "a completely different doc"))
    q.processAllAvailable()
    val kept = spark.table("neardedup").as[TextEvent].collect()
      .map(_.event_id).sorted
    q.stop()
    assert(kept === Array(1L, 4L)) // one per distinct signature
  }

  test("near-dup suppression: null texts bypass the dedup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TextEvent]
    val q = dedupNearText(input.toDF(), "text", lateness = "1 hour")
      .writeStream.format("memory").queryName("neardedup_null")
      .outputMode(OutputMode.Append()).start()
    input.addData( // two null-text events: NOT duplicates of each other
      TextEvent(1, ts("2024-01-01 10:00:00"), null),
      TextEvent(2, ts("2024-01-01 10:01:00"), null),
      TextEvent(3, ts("2024-01-01 10:02:00"), "real text"))
    q.processAllAvailable()
    val kept = spark.table("neardedup_null").as[TextEvent].collect()
      .map(_.event_id).sorted
    q.stop()
    assert(kept === Array(1L, 2L, 3L)) // both nulls kept
  }

  test("streaming embedding near-dup: pair crossing micro-batches " +
      "suppressed via ANY-table collision; state bounded; nulls bypass") {
    implicit val sqlCtx = spark.sqlContext
    val dim = 8; val bits = 6; val tables = 3
    // deterministically FIND a near-dup pair agreeing in ≥1 but NOT all
    // tables (exercises the any-single-table suppression path, not just
    // scale-invariance) — rhpSignature is hash-seeded, so this search
    // is stable run to run
    import org.apache.spark.sql.functions.col
    val a = (0 until dim).map(j => math.sin(j * 3 + 1) + 1.5)
    val cands = (1 to 400).map { k =>
      val amp = 0.1 * (k % 16 + 1) // sweep noise amplitudes
      (k.toLong, a.zipWithIndex.map { case (x, j) =>
        x + amp * math.sin(k * 17 + j * 5) })
    }
    val sigsOf = {
      val df = ((0L, a) +: cands).toDF("id", "vec")
      val sigCols = (0 until tables).map(t =>
        graft.functions.VectorFunctions
          .rhpSignature(col("vec"), bits, dim, 1000L + t).as(s"s$t"))
      df.select(col("id") +: sigCols: _*).collect()
        .map(r => r.getLong(0) -> (1 until tables + 1).map(r.getLong).toSeq)
        .toMap
    }
    val aSig = sigsOf(0L)
    val partial = cands.find { case (k, _) =>
      val s = sigsOf(k)
      val agree = s.zip(aSig).count { case (x, y) => x == y }
      agree >= 1 && agree < tables
    }
    assert(partial.nonEmpty,
      "no partial-agreement candidate found — widen the search")
    val (pk, pvec) = partial.get
    val opposite = a.map(-_) // flips every projection: disjoint buckets

    val input = MemoryStream[VecEvent]
    val q = dedupNearEmbedding(input.toDF(), "vec",
        lateness = "1 hour", bits = bits, tables = tables, dim = dim)
      .writeStream.format("memory").queryName("vec_neardedup")
      .outputMode(OutputMode.Append()).start()
    input.addData(VecEvent(1, ts("2024-01-01 10:00:00"), a))
    q.processAllAvailable()
    input.addData( // cross-batch: scaled copy (all tables agree),
      // partial-agreement near-dup (≥1 table), opposite (novel), null
      VecEvent(2, ts("2024-01-01 10:01:00"), a.map(_ * 2.0)),
      VecEvent(pk + 100, ts("2024-01-01 10:02:00"), pvec),
      VecEvent(3, ts("2024-01-01 10:03:00"), opposite),
      VecEvent(4, ts("2024-01-01 10:04:00"), null))
    q.processAllAvailable()
    val kept = spark.table("vec_neardedup")
      .select("event_id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L, 4L),
      s"expected scaled + partial near-dups suppressed, got ${kept.toSeq}")
    // state bounded: L dedup operators, each ≤ one row per EMITTED
    // hashed event (suppressed events never seed later stages)
    val stateRows = q.lastProgress.stateOperators
      .map(_.numRowsTotal).sum
    val emittedHashed = 2 // ids 1 and 3 (null bypasses hashing)
    assert(stateRows <= tables.toLong * emittedHashed,
      s"state rows $stateRows exceed tables×emitted = " +
        s"${tables * emittedHashed}")
    q.stop()
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    // two sessions for user 1 in ONE batch (gap > 30 min closes first)
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 1, "view", 2.0),
      Event(3, ts("2024-01-01 12:00:00"), 1, "click", 4.0))
    q.processAllAvailable()
    val closed = spark.table("sessions").as[SessionOut].collect()
    assert(closed.length === 1)
    assert(closed(0).n_events === 2)
    assert(closed(0).total_value === 3.0)
    assert(closed(0).session_start_us ===
      ts("2024-01-01 10:00:00").getTime * 1000)

    // advance the watermark via another user → user 1's trailing
    // session times out on event time and emits
    input.addData(Event(4, ts("2024-01-01 15:00:00"), 2, "click", 1.0))
    q.processAllAvailable()
    input.addData(Event(5, ts("2024-01-01 15:00:01"), 2, "click", 1.0))
    q.processAllAvailable()
    val all = spark.table("sessions").as[SessionOut].collect()
    q.stop()
    val trailing = all.filter(s => s.user_id == 1 &&
      s.session_start_us == ts("2024-01-01 12:00:00").getTime * 1000)
    assert(trailing.length === 1)
    assert(trailing(0).n_events === 1)
  }

  test("sessionize is provider-agnostic: RocksDB state store ≡ default") {
    implicit val sqlCtx = spark.sqlContext
    val (k, v) = EventAggregates.RocksDbStateStoreConf
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try {
      val input = MemoryStream[Event]
      val q = sessionize(input.toDS(), gapMs = 30 * 60 * 1000)
        .writeStream.format("memory").queryName("sessions_rocks")
        .outputMode(OutputMode.Append()).start()
      // same shape as the default-provider case: an in-batch gap closes
      // one session, a cross-batch watermark advance flushes the trailer
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "view", 2.0),
        Event(3, ts("2024-01-01 12:00:00"), 1, "click", 4.0))
      q.processAllAvailable()
      input.addData(Event(4, ts("2024-01-01 15:00:00"), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(5, ts("2024-01-01 15:00:01"), 2, "click", 1.0))
      q.processAllAvailable()
      // the RocksDB provider actually backed the state store
      val usedRocks = q.lastProgress.stateOperators.isEmpty ||
        Option(q.lastProgress.stateOperators(0).customMetrics)
          .exists(m => !m.isEmpty)
      val all = spark.table("sessions_rocks").as[SessionOut].collect()
      q.stop()
      val user1 = all.filter(_.user_id == 1).sortBy(_.session_start_us)
      assert(user1.length === 2)
      assert(user1(0).n_events === 2 && user1(0).total_value === 3.0)
      assert(user1(1).n_events === 1 && user1(1).total_value === 4.0)
      assert(usedRocks) // rocksdb custom metrics present in progress
    } finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }
}
