package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventAggregates._

/** Out-of-order semantics of the stateful sessionizer: in-watermark
  * stray events older than the open session's reach form their own
  * sessions; near-boundary out-of-order events extend the session start
  * backward. */
class SessionizeOrderSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stray chain becomes its own session; backward extension works") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMs = 30 * 60 * 1000,
        lateness = "12 hours") // wide watermark so strays are in-bounds
      .writeStream.format("memory").queryName("ooo")
      .outputMode(OutputMode.Append()).start()

    // batch 1: open session at 12:00
    input.addData(Event(1, ts("2024-01-01 12:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: two chained strays at 9:00/9:10 (can never join 12:00),
    // plus an out-of-order 11:45 (within 30min of 12:00 → extends
    // session start BACKWARD), plus 12:10 continuing the session
    input.addData(
      Event(2, ts("2024-01-01 09:00:00"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 09:10:00"), 1, "click", 3.0),
      Event(4, ts("2024-01-01 11:45:00"), 1, "view", 4.0),
      Event(5, ts("2024-01-01 12:10:00"), 1, "view", 5.0))
    q.processAllAvailable()

    val closed = spark.table("ooo").as[SessionOut].collect()
    // the stray chain closed immediately as ONE session of 2 events
    assert(closed.length === 1)
    assert(closed(0).n_events === 2)
    assert(closed(0).session_start_us === ts("2024-01-01 09:00:00").getTime * 1000)
    assert(closed(0).session_end_us === ts("2024-01-01 09:10:00").getTime * 1000)

    // close the live session via watermark advance from another user
    input.addData(Event(6, ts("2024-01-02 09:00:00"), 2, "click", 1.0))
    q.processAllAvailable()
    input.addData(Event(7, ts("2024-01-02 09:00:01"), 2, "click", 1.0))
    q.processAllAvailable()
    val all = spark.table("ooo").as[SessionOut].collect()
    q.stop()
    val main = all.filter(s => s.user_id == 1 && s.n_events == 3)
    assert(main.length === 1) // 11:45 + 12:00 + 12:10 merged
    assert(main(0).session_start_us ===
      ts("2024-01-01 11:45:00").getTime * 1000) // backward extension
  }
}
