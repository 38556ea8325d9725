package graft.operators

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("uniqueViolations finds duplicate keys, exempts NULLs") {
    val df = Seq(("m1", "u1"), ("m1", "u1"), ("m1", "u2"),
      ("m2", null), ("m2", null)).toDF("muuid", "uid")
    val v = Constraints.uniqueViolations(df, Seq("muuid", "uid"))
      .as[(String, String, Long)].collect()
    assert(v === Array(("m1", "u1", 2L))) // null pair NOT a violation
  }

  test("referentialViolations reports orphans, ignores null fks") {
    val child = Seq(("r1", "m1"), ("r2", "mX"), ("r3", null))
      .toDF("id", "muuid")
    val parent = Seq(("m1", "t")).toDF("uuid", "topic")
    val v = Constraints.referentialViolations(child, "muuid", parent, "uuid")
      .select("id").as[String].collect()
    assert(v === Array("r2"))
  }

  test("requireFields splits valid vs dead-letter with diagnostics") {
    val df = Seq(("m1", "topic", "h@x"), ("m2", null, "h@x"),
      ("m3", null, null)).toDF("uuid", "topic", "host_email")
    val (valid, dead) = Constraints.requireFields(df,
      Seq("uuid", "topic", "host_email"))
    assert(valid.select("uuid").as[String].collect() === Array("m1"))
    val d = dead.select("uuid", "missing_fields")
      .as[(String, Seq[String])].collect().toMap
    assert(d("m2") === Seq("topic"))
    assert(d("m3") === Seq("topic", "host_email"))
  }
}
