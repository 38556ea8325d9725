package graft.pipeline

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Constraints, Upsert}
import graft.sources.{Bookmark, Fixtures}
import graft.streaming.RecordingStream

/** The reference's batch DAG (SURVEY §3.1, airflow/dags/etl_process.py:
  * 35-238) collapsed into one Spark driver program.
  *
  * The Airflow machinery dissolves by design: dynamic task mapping
  * (.expand over 1000-user/200-meeting chunks) IS Spark partition
  * parallelism; the XCom List[Dict] hops ARE DataFrames; the flatten
  * barrier IS a shuffle; Celery workers ARE executors. What remains is
  * the semantic ordering the reference enforces (etl_process.py:233-236):
  *
  *   users → meetings → participants → recording merge → bookmark commit
  *
  * (participants AFTER meetings because of the FK; the watermark commits
  * LAST so failures reprocess. Keyed rows are safe under replay — the
  * upserts are idempotent on their keys. NULL-keyed guest participants
  * would bypass the keyed upsert (Postgres NULL-distinctness, same as
  * the reference), so the participant load enables dedupNullKeyed:
  * replaying a batch after a mid-run failure does not re-append guests).
  */
object BatchEtl {

  final case class Paths(
      usersJson: String,
      meetingsJson: String,
      participantsJson: String,
      warehouse: String) {
    def users: String = s"$warehouse/user"
    def meetings: String = s"$warehouse/meeting"
    def participants: String = s"$warehouse/participant"
    def recordings: String = s"$warehouse/recording"
    def recordingStaging: String = s"$warehouse/recording_staging"
    def bookmark: String = s"$warehouse/_bookmark"
  }

  final case class LoadReport(
      users: Long, meetings: Long, participants: Long,
      uniqueViolations: Long, fkViolations: Long, watermark: Instant)

  /** One full incremental run. `since` filters source docs against the
    * bookmark (the reference pushes from/to into the API request; here
    * the predicate lands on the scan and is partition-prunable). */
  def run(spark: SparkSession, paths: Paths,
      now: Instant = Instant.now()): LoadReport = {
    val bookmark = new Bookmark(spark, paths.bookmark)
    val since = bookmark.read(default = Instant.EPOCH)

    // ---- extract + normalize (S2-S7 offline analogs) ----
    val users = Fixtures.readUsers(spark, paths.usersJson)
    val meetings = Fixtures.readMeetings(spark, paths.meetingsJson)
      .where(col("start_time").isNull ||
        col("start_time") >= lit(java.sql.Timestamp.from(since)))
    val participants = Fixtures.readParticipants(spark, paths.participantsJson)

    // ---- constraint surface Postgres enforced declaratively ----
    val userDupes = Constraints.uniqueViolations(users, Seq("id")).count()

    // ---- ordered loads (K1-K3) ----
    val newUsers = upsertSnapshot(spark, paths.users, users, Seq("id"))
    val newMeetings =
      upsertSnapshot(spark, paths.meetings, meetings, Seq("uuid"))
    val newParts = upsertSnapshot(spark, paths.participants, participants,
      Seq("meeting_uuid", "user_id"), dedupNullKeyed = true)

    // FK check runs against the MERGED meeting snapshot — checking the
    // since-filtered increment would flag every participant of a
    // previously-loaded meeting as an orphan on incremental runs
    val meetingsNow = spark.read.parquet(paths.meetings)
    val orphanParts = Constraints.referentialViolations(
      participants, "meeting_uuid", meetingsNow, "uuid").count()

    // ---- staging→main recording merge (J1+K5+J2), after meetings ----
    if (Upsert.snapshotExists(spark, paths.recordingStaging))
      RecordingStream.promote(spark, paths.recordingStaging, meetingsNow,
        paths.recordings)

    // ---- watermark commit LAST (S8 ordering) ----
    bookmark.commit(now)
    LoadReport(newUsers, newMeetings, newParts, userDupes, orphanParts, now)
  }

  private def upsertSnapshot(spark: SparkSession, path: String,
      updates: DataFrame, keys: Seq[String],
      dedupNullKeyed: Boolean = false): Long = {
    val target = Upsert.readSnapshot(spark, path).getOrElse(updates.limit(0))
    val merged = Upsert.upsert(target, updates, keys,
      dedupNullKeyed = dedupNullKeyed)
    Upsert.writeSnapshot(merged, path)
    spark.read.parquet(path).count()
  }
}
