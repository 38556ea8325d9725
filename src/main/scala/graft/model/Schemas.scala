package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's in-flight JSON documents
  * (SURVEY §1.2-1.3): the Zoom-API-shaped batch docs consumed by the
  * loaders (src/db/load.py:96-190) and the webhook event shape from the
  * committed fixture (lambda/zoom_webhook/event.json:1-70). Schema-on-read
  * with null-filling: every field nullable, defaults applied downstream
  * (Normalize.withDefault).
  */
object Schemas {

  /** User detail doc (ref load.py:96-109; DDL create_tables.sql:4-14). */
  val userSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("email", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("dept", StringType),
    StructField("role_name", StringType),
    StructField("created_at", StringType),       // ISO-8601, parsed by T1
    StructField("last_login_time", StringType),
    StructField("group_names", ArrayType(StringType))))

  /** Meeting detail doc (ref load.py:137-150; DDL :17-28). Webinar
    * fallback docs (extract.py:164-166) share this shape with nulled
    * end_time/participants_count. */
  val meetingSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("uuid", StringType),
    StructField("host_id", StringType),
    StructField("topic", StringType),
    StructField("start_time", StringType),
    StructField("end_time", StringType),
    StructField("duration", IntegerType),
    StructField("participants_count", IntegerType),
    StructField("type", IntegerType)))

  /** Participant doc (ref load.py:178-190; DDL :31-45). */
  val participantSchema: StructType = StructType(Seq(
    StructField("meeting_uuid", StringType),
    StructField("id", StringType),
    StructField("user_id", StringType),
    StructField("name", StringType),
    StructField("user_email", StringType),
    StructField("join_time", StringType),
    StructField("leave_time", StringType),
    StructField("duration", IntegerType),
    StructField("internal_user", BooleanType)))

  /** One recording file inside a webhook payload
    * (event.json `recording_files[]`). */
  val recordingFileSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("meeting_id", StringType),
    StructField("recording_start", StringType),
    StructField("recording_end", StringType),
    StructField("recording_type", StringType),
    StructField("file_type", StringType),
    StructField("file_size", LongType),
    StructField("file_extension", StringType),
    StructField("play_url", StringType),
    StructField("download_url", StringType),
    StructField("status", StringType)))

  /** Webhook `recording.completed` event (event.json:1-70). */
  val webhookSchema: StructType = StructType(Seq(
    StructField("event", StringType),
    StructField("event_ts", LongType),
    StructField("payload", StructType(Seq(
      StructField("account_id", StringType),
      StructField("object", StructType(Seq(
        StructField("id", LongType),
        StructField("uuid", StringType),
        StructField("host_id", StringType),
        StructField("topic", StringType),
        StructField("type", IntegerType),
        StructField("start_time", StringType),
        StructField("host_email", StringType),
        StructField("duration", IntegerType),
        StructField("total_size", LongType),
        StructField("recording_count", IntegerType),
        StructField("recording_files", ArrayType(recordingFileSchema))))))))))
}
