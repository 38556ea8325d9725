package graft.operators

import graft.SparkSpec

/** Staging→main promote semantics (ref: src/db/load.py:193-235) —
  * the late-data gate, retry on next cycle, and conservation. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("gate: only rows with an arrived parent promote; rest stay parked") {
    val staging = Seq(("r1", "m1", 100L), ("r2", "m2", 200L))
      .toDF("id", "muuid", "size")
    val meetings = Seq(("m1", "t1")).toDF("uuid", "topic")
    val main = staging.limit(0)
    val res = Merge.promote(staging, meetings, "muuid", "uuid", main, Seq("id"))
    assert(res.main.as[(String, String, Long)].collect() ===
      Array(("r1", "m1", 100L)))
    assert(res.staging.as[(String, String, Long)].collect() ===
      Array(("r2", "m2", 200L)))
  }

  test("retry: parked row promotes once its parent arrives") {
    val staging = Seq(("r2", "m2", 200L)).toDF("id", "muuid", "size")
    val meetingsLater = Seq(("m1", "t1"), ("m2", "t2")).toDF("uuid", "topic")
    val main = Seq(("r1", "m1", 100L)).toDF("id", "muuid", "size")
    val res = Merge.promote(staging, meetingsLater, "muuid", "uuid", main, Seq("id"))
    assert(res.main.count() === 2)
    assert(res.staging.isEmpty)
  }

  test("redelivery is idempotent: re-promoting same row updates, not dups") {
    val staging = Seq(("r1", "m1", 999L)).toDF("id", "muuid", "size")
    val meetings = Seq(("m1", "t1")).toDF("uuid", "topic")
    val main = Seq(("r1", "m1", 100L)).toDF("id", "muuid", "size")
    val res = Merge.promote(staging, meetings, "muuid", "uuid", main, Seq("id"))
    assert(res.main.as[(String, String, Long)].collect() ===
      Array(("r1", "m1", 999L)))
  }

  test("conservation: promoted ∪ remaining covers original staging keys") {
    val staging = Seq(("r1", "m1", 1L), ("r2", "m2", 2L), ("r3", "m1", 3L))
      .toDF("id", "muuid", "size")
    val meetings = Seq(("m1", "t")).toDF("uuid", "topic")
    val res = Merge.promote(staging, meetings, "muuid", "uuid",
      staging.limit(0), Seq("id"))
    val covered = res.main.select("id").union(res.staging.select("id"))
    assert(covered.exceptAll(staging.select("id")).isEmpty)
    assert(staging.select("id").exceptAll(covered).isEmpty)
  }
}
