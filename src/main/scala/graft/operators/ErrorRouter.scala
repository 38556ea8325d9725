package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error taxonomy + routing (ref: src/errors/error_types.py:4-12,
  * error_handler.py:107-148): the reference classifies failures into a
  * fixed enum and routes them to an admin notification; the engine's
  * equivalent is an error-channel DataFrame — rows that fail validation
  * carry an `error_type` + `error_detail` and flow to a dead-letter sink
  * instead of killing the job (alerting stays out of scope, as in the
  * reference where notification is a logged stub, error_handler.py:174-177).
  */
object ErrorRouter {

  /** The reference's taxonomy (error_types.py). */
  val ErrorTypes: Seq[String] = Seq(
    "AUTHENTICATION", "AUTHORIZATION", "RATE_LIMIT", "NOT_FOUND",
    "VALIDATION", "NETWORK", "UNEXPECTED")

  /** Classify rows by a list of (condition → error_type[, detail])
    * rules, first match wins; rows matching no rule are clean.
    * Returns (clean, errors) where errors carry error_type/error_detail. */
  def route(
      df: DataFrame,
      rules: Seq[(Column, String, Column)]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "at least one routing rule")
    rules.foreach { case (_, t, _) =>
      require(ErrorTypes.contains(t), s"unknown error type $t") }
    val errType = rules.foldRight(lit(null).cast("string")) {
      case ((cond, t, _), acc) => when(cond, lit(t)).otherwise(acc)
    }
    val errDetail = rules.foldRight(lit(null).cast("string")) {
      case ((cond, _, d), acc) => when(cond, d).otherwise(acc)
    }
    val tagged = df.withColumn("error_type", errType)
      .withColumn("error_detail", errDetail)
    (tagged.where(col("error_type").isNull)
        .drop("error_type", "error_detail"),
      tagged.where(col("error_type").isNotNull))
  }

  /** Append the error channel to a dead-letter directory (JSON, so the
    * payload stays human-inspectable) — the streaming path's dead-letter
    * write uses the same shape. */
  def deadLetter(errors: DataFrame, dir: String): Unit =
    errors.write.mode("append").json(dir)
}
