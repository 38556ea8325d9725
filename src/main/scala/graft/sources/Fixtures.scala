package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.model.Schemas

/** Offline stand-ins for the reference's REST sources (S1-S7): JSON
  * fixture readers with the Zoom-API schemas. In the reference these are
  * paginated HTTP pulls (src/zoom/extract.py); offline, the same rows
  * arrive as JSON files, and the source-level concerns map as:
  *  - pagination/chunking (S1, T6)   → file partitioning, Spark-native
  *  - column pruning at source       → Catalyst column pruning
  *  - from/to predicate pushdown (S5)→ partition/file pruning + filters
  *  - retry/backoff/token plumbing   → not a dataflow concern offline
  *    (documented in SURVEY §2.1 S11; spark.task.maxFailures covers task
  *    retry)
  */
object Fixtures {

  def readUsers(spark: SparkSession, path: String): DataFrame =
    normalizeUsers(spark.read.schema(Schemas.userSchema).json(path))

  /** T1 + T3 normalization of raw user docs: timestamps parsed UTC
    * null-on-error, group_names defaulted to [] (ref load.py:106). */
  def normalizeUsers(raw: DataFrame): DataFrame =
    raw.select(
      col("id"), col("email"), col("first_name"), col("last_name"),
      col("dept"), col("role_name"),
      Normalize.parseTimestampUtc(col("created_at")).as("created_at"),
      Normalize.parseTimestampUtc(col("last_login_time")).as("last_login_time"),
      Normalize.withDefault(col("group_names"),
        array().cast("array<string>")).as("group_names"))

  def readMeetings(spark: SparkSession, path: String): DataFrame =
    normalizeMeetings(spark.read.schema(Schemas.meetingSchema).json(path))

  /** Meeting normalization incl. the S6 webinar-fallback shape: docs
    * missing uuid (webinar responses carry only id) get uuid injected
    * from id, end_time/participants_count stay null
    * (ref extract.py:164-166). */
  def normalizeMeetings(raw: DataFrame): DataFrame =
    raw.select(
      col("id"),
      coalesce(col("uuid"), col("id").cast("string")).as("uuid"),
      col("host_id"), col("topic"),
      Normalize.parseTimestampUtc(col("start_time")).as("start_time"),
      Normalize.parseTimestampUtc(col("end_time")).as("end_time"),
      col("duration"), col("participants_count"), col("type"))

  def readParticipants(spark: SparkSession, path: String): DataFrame =
    normalizeParticipants(
      spark.read.schema(Schemas.participantSchema).json(path))

  /** Participant normalization: internal_user defaults false
    * (ref load.py:187); guests keep NULL id/user_id/user_email. */
  def normalizeParticipants(raw: DataFrame): DataFrame =
    raw.select(
      col("meeting_uuid"), col("id"), col("user_id"), col("name"),
      col("user_email"),
      Normalize.parseTimestampUtc(col("join_time")).as("join_time"),
      Normalize.parseTimestampUtc(col("leave_time")).as("leave_time"),
      col("duration"),
      Normalize.withDefault(col("internal_user"), lit(false))
        .as("internal_user"))

  /** Webhook events batch reader (streaming variant in
    * RecordingStream.readStream). */
  def readWebhookEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.webhookSchema).json(path)
}
