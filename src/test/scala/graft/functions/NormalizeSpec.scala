package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("T1: ISO-8601 Z parse → UTC; invalid → null, not failure") {
    val df = Seq("2025-01-01T01:20:50Z", "2025-06-30 12:00:00",
      "not a date", null).toDF("s")
    val out = df.select(
      Normalize.parseTimestampUtc($"s").cast("string").as("t"))
      .as[Option[String]].collect()
    assert(out(0) === Some("2025-01-01 01:20:50"))
    assert(out(1) === Some("2025-06-30 12:00:00"))
    assert(out(2) === None)
    assert(out(3) === None)
  }

  test("T2: sanitize replaces illegal chars, truncates, defaults unknown") {
    val df = Seq("""a/b\c:d*e?f"g<h>i|j""", "", "   ", null, "ok name")
      .toDF("s")
    val out = df.select(Normalize.sanitizeName($"s").as("n"))
      .as[String].collect()
    assert(out(0) === "a_b_c_d_e_f_g_h_i_j")
    assert(out(1) === "unknown")
    assert(out(2) === "unknown")
    assert(out(3) === "unknown")
    assert(out(4) === "ok name")
  }

  test("T8: double URL-encode matches the reference's quote(quote(id))") {
    // ref extract.py:141 double-encodes meeting UUIDs starting with '/'
    // or containing '//' (Zoom API path quirk): '/' → %2F → %252F
    val df = Seq("/aB1==", "x//y", "plain").toDF("s")
    val out = df.select(Normalize.doubleUrlEncode($"s").as("e"))
      .as[String].collect()
    assert(out(0) === "%252FaB1%253D%253D")
    assert(out(1) === "x%252F%252Fy")
    assert(out(2) === "plain")
  }

  test("T2: truncation to 255 chars") {
    val long = "x" * 300
    val out = Seq(long).toDF("s")
      .select(Normalize.sanitizeName($"s").as("n")).as[String].head()
    assert(out.length === 255)
  }
}
