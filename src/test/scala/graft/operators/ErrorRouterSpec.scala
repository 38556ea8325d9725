package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ErrorRouterSpec extends SparkSpec {
  import spark.implicits._

  test("first-match routing splits clean vs typed errors") {
    val df = Seq(
      ("r1", "ok@x.com", 200), ("r2", null, 200),
      ("r3", "x@x.com", 429), ("r4", "y@y.com", 404))
      .toDF("id", "email", "status")
    val (clean, errors) = ErrorRouter.route(df, Seq(
      (col("email").isNull, "VALIDATION", lit("missing email")),
      (col("status") === 429, "RATE_LIMIT",
        concat(lit("status="), col("status"))),
      (col("status") === 404, "NOT_FOUND", lit("gone"))))
    assert(clean.select("id").as[String].collect() === Array("r1"))
    val errs = errors.select("id", "error_type")
      .as[(String, String)].collect().toMap
    assert(errs === Map("r2" -> "VALIDATION", "r3" -> "RATE_LIMIT",
      "r4" -> "NOT_FOUND"))
  }

  test("unknown error types are rejected at build time") {
    val df = Seq(("a", 1)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      ErrorRouter.route(df, Seq((col("v") > 0, "BOGUS", lit(""))))
    }
  }

  test("dead-letter write round-trips through JSON") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dl").toString
    val df = Seq(("r2", 429)).toDF("id", "status")
    val (_, errors) = ErrorRouter.route(df, Seq(
      (col("status") === 429, "RATE_LIMIT", lit("throttled"))))
    ErrorRouter.deadLetter(errors, s"$dir/errors")
    val back = spark.read.json(s"$dir/errors")
    assert(back.count() === 1)
    assert(back.select("error_type").as[String].head() === "RATE_LIMIT")
  }
}
