package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of: latest right at-or-before, null when none") {
    val events = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u1", 50L),
      (4L, "u2", 500L)).toDF("event_id", "user_id", "ts")
    val versions = Seq(("u1", 100L, "vA"), ("u1", 200L, "vB"),
      ("u2", 600L, "vC")).toDF("user_id", "vt", "version")
    val out = AsOfJoin.asofBackward(events, versions, "user_id", "ts", "vt",
        Seq("version"))
      .select("event_id", "asof_version")
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("vA")) // tie at 100 → inclusive (>=)
    assert(out(2L) === Some("vB"))
    assert(out(3L) === None)       // before any version
    assert(out(4L) === None)       // u2's version is later
  }

  test("matched row's NULL payload surfaces — never backfilled from older rows") {
    // Right row at t=200 has version=NULL, weight=7. An independent
    // per-column sweep would take version from the OLDER t=100 row and
    // weight from t=200 — a combined row that never existed. DuckDB
    // ASOF returns the matched row as-is: version must be NULL.
    val events = Seq((1L, "u1", 250L)).toDF("event_id", "user_id", "ts")
    val versions = Seq(
      ("u1", 100L, Some("vA"), Some(3)),
      ("u1", 200L, None: Option[String], Some(7)))
      .toDF("user_id", "vt", "version", "weight")
    val out = AsOfJoin.asofBackward(events, versions, "user_id", "ts", "vt",
        Seq("version", "weight"))
      .select("asof_version", "asof_weight")
      .as[(Option[String], Option[Int])].collect()
    assert(out === Array((None, Some(7))))
  }

  test("each left row emitted exactly once, left payload preserved") {
    val events = Seq((1L, "u1", 100L, "x"), (2L, "u1", 100L, "y"))
      .toDF("event_id", "user_id", "ts", "payload")
    val versions = Seq(("u1", 90L, "v1")).toDF("user_id", "vt", "version")
    val out = AsOfJoin.asofBackward(events, versions, "user_id", "ts", "vt",
      Seq("version"))
    assert(out.count() === 2)
    assert(out.select("payload").as[String].collect().sorted === Array("x", "y"))
  }
}
