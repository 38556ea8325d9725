package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long)
  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join attributes clicks inside the window") {
    implicit val sqlCtx = spark.sqlContext
    val signups = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = StreamJoins
      .attributedClicks(signups.toDF(), clicks.toDF(), "1 hour")
      .writeStream.format("memory").queryName("attributed")
      .outputMode(OutputMode.Append()).start()

    signups.addData(Ev(100, ts("2024-01-01 10:00:00"), 1))
    clicks.addData(
      Ev(200, ts("2024-01-01 10:30:00"), 1), // inside window → match
      Ev(201, ts("2024-01-01 12:30:00"), 1), // outside window
      Ev(202, ts("2024-01-01 09:00:00"), 1), // before signup
      Ev(203, ts("2024-01-01 10:30:00"), 2)) // other user
    q.processAllAvailable()
    val out = spark.table("attributed")
      .select("signup_id", "click_id").as[(Long, Long)].collect().toSet
    q.stop()
    assert(out === Set((100L, 200L)))
  }
}
