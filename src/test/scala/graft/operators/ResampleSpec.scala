package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("gaps fill with the last observed value; counts mark real buckets") {
    // key 1: buckets 0 (two events), 3 (one) — gaps at 1, 2
    // key 2: single bucket — no gaps
    val ev = Seq(
      (1L, ts(10), 5.0), (1L, ts(50), 7.0), // bucket 0, last = 7
      (1L, ts(190), 9.0),                   // bucket 3
      (2L, ts(70), 4.0)                     // bucket 1
    ).toDF("user_id", "t", "value")
    val out = Resample.resampleFfill(ev, "user_id", "t",
        col("value"), intervalSec = 60)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 0L, 2L, 7L), (1L, 1L, 0L, 7L), (1L, 2L, 0L, 7L),
      (1L, 3L, 1L, 9L),
      (2L, 1L, 1L, 4L)))
  }

  test("pre-1970 timestamps floor-divide into buckets (no fold at epoch)") {
    // truncating division would put both -10s and +10s in bucket 0,
    // folding two intervals around the epoch; floor division buckets
    // -10s at -1 — the semantics DuckDB's `//` mirror uses
    val ev = Seq(
      (1L, ts(-10), 1.0),  // bucket -1 under floor division
      (1L, ts(10), 2.0),   // bucket 0
      (1L, ts(-60), 3.0),  // exact boundary: bucket -1
      (1L, ts(-61), 4.0)   // bucket -2
    ).toDF("user_id", "t", "value")
    val out = Resample.resampleFfill(ev, "user_id", "t",
        col("value"), intervalSec = 60)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, -2L, 1L, 4L), (1L, -1L, 2L, 1L), (1L, 0L, 1L, 2L)))
  }

  test("within-bucket last is (ts desc, value desc); layout-invariant") {
    val ev = Seq(
      (1L, ts(10), 3.0), (1L, ts(20), 8.0), (1L, ts(20), 2.0)
    ).toDF("user_id", "t", "value")
    val out = Resample.resampleFfill(ev, "user_id", "t",
        col("value"), intervalSec = 60)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 3L, 8L))) // latest ts wins, higher value on tie
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    def run(df: org.apache.spark.sql.DataFrame) =
      Resample.resampleFfill(df, "user_id", "ts",
          round(col("value") * 100, 0), intervalSec = 3600)
        .as[(Long, Long, Long, Long)].collect().toSet
    val a = run(events)
    assert(a.nonEmpty && a.exists(_._3 == 0L), "expect some filled gaps")
    assert(run(events.repartition(7)) === a)
  }
}
