package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative-constraint replacements (SURVEY §1.4).
  *
  * Postgres enforced PK/UNIQUE/FK/NOT NULL declaratively
  * (ref: sql/create_tables.sql:5-6,19,32,42-44,60); Spark enforces none,
  * so the engine exposes them as explicit check operators that run as part
  * of load. Each returns the VIOLATING rows (empty ⇒ constraint holds) so
  * callers can fail, dead-letter, or report.
  */
object Constraints {

  /** UNIQUE/PK check: key groups with >1 row. NULL keys are exempt,
    * mirroring Postgres unique-constraint NULL-distinctness (ref K3,
    * SURVEY §2.5: two guests with NULL user_id never conflict). */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame = {
    val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
    df.where(nonNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("row_count"))
      .where(col("row_count") > 1)
  }

  /** FK check: child rows whose non-null fk has no parent (left-anti).
    * Ref FKs: meeting.host_id→user.id, participant.meeting_uuid→
    * meeting.uuid, recording.meeting_uuid→meeting.uuid
    * (create_tables.sql:27,42-43,60). */
  def referentialViolations(
      child: DataFrame,
      fk: String,
      parent: DataFrame,
      parentKey: String): DataFrame =
    child
      .where(col(fk).isNotNull)
      .join(parent.select(col(parentKey).as(fk)), Seq(fk), "left_anti")

  /** Required-field validation (ref T9, handler.py:46-52): split into
    * (valid, deadLetter); dead-letter rows carry a `missing_fields`
    * diagnostic column naming the absent fields. */
  def requireFields(
      df: DataFrame,
      required: Seq[String]): (DataFrame, DataFrame) = {
    val allPresent: Column = required.map(col(_).isNotNull).reduce(_ && _)
    val missing = array_compact(array(required.map(f =>
      when(col(f).isNull, lit(f))): _*))
    val valid = df.where(allPresent)
    val dead = df.where(!allPresent).withColumn("missing_fields", missing)
    (valid, dead)
  }
}
