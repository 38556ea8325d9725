package graft.pipeline

import java.nio.file.{Files, Paths => JPaths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup
import graft.streaming.RecordingStream

/** SURVEY §7's minimum end-to-end slice as one test: webhook fixture →
  * R1 select → staged upsert → batch meeting load → promote → analytic
  * aggregation over the final recording table, asserted against a
  * hand-computed golden. Exercises source → normalize → upsert → join →
  * agg through every layer, plus rerun idempotence across the whole
  * slice.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvent(dir: String, name: String, uuid: String,
      files: Seq[(String, String, Long, String)]): Unit = {
    val fjson = files.map { case (id, ftype, size, ext) =>
      s"""{"id":"$id","meeting_id":"m","recording_start":"2021-07-13T21:44:51Z",
         |"recording_end":"2021-07-13T23:39:22Z","recording_type":"t",
         |"file_type":"$ftype","file_size":$size,"file_extension":"$ext",
         |"play_url":"p","download_url":"d","status":"completed"}"""
        .stripMargin.replace("\n", "")
    }.mkString(",")
    val ev =
      s"""{"event":"recording.completed","event_ts":1626230691572,
         |"payload":{"account_id":"A","object":{"id":1,"uuid":"$uuid",
         |"host_id":"h1","topic":"T","type":4,
         |"start_time":"2021-07-13T21:44:51Z","host_email":"h@x.com",
         |"duration":60,"total_size":1,"recording_count":${files.size},
         |"recording_files":[$fjson]}}}""".stripMargin.replace("\n", "")
    Files.write(JPaths.get(dir, name), ev.getBytes("UTF-8"))
  }

  test("minimum slice: stream → stage → batch → promote → analytics") {
    val root = Files.createTempDirectory("graft_e2e").toString
    val in = s"$root/in"; Files.createDirectories(JPaths.get(in))
    val staging = s"$root/staging"; val main = s"$root/main"

    // webhook events: two meetings, multiple file variants each
    writeEvent(in, "e1.json", "mA", Seq(
      ("fA_v", "shared_screen_with_speaker_view", 1000L, "MP4"),
      ("fA_a", "audio_only", 100L, "M4A"),
      ("fA_c", "chat_file", 10L, "TXT")))
    writeEvent(in, "e2.json", "mB", Seq(
      ("fB_g", "gallery_view", 2000L, "MP4"),
      ("fB_a", "audio_only", 200L, "M4A")))

    val q = RecordingStream.start(spark, in, staging, s"$root/ckpt")
    q.processAllAvailable(); q.stop()

    // batch path delivers only meeting A first (B is late)
    val meetingsBatch1 = Seq(("mA", "Topic A")).toDF("uuid", "topic")
    RecordingStream.promote(spark, staging, meetingsBatch1, main)

    // storage-by-type analytics over the PROMOTED table (golden):
    // only meeting A's winners are live
    val byType = spark.read.parquet(main)
      .groupBy(col("file_type"))
      .agg(sum(col("file_size")).as("bytes"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byType === Map(
      "shared_screen_with_speaker_view" -> ((1000L, 1L)),
      "audio_only" -> ((100L, 1L)),
      "chat_file" -> ((10L, 1L))))

    // late meeting B arrives → promote drains staging; totals update
    val meetingsBatch2 = Seq(("mA", "Topic A"), ("mB", "Topic B"))
      .toDF("uuid", "topic")
    RecordingStream.promote(spark, staging, meetingsBatch2, main)
    val total = spark.read.parquet(main)
      .agg(sum("file_size")).as[Long].head()
    assert(total === 1000L + 100L + 10L + 2000L + 200L)
    assert(spark.read.parquet(staging).isEmpty)

    // replay the whole slice (at-least-once) → byte-identical state
    val q2 = RecordingStream.start(spark, in, staging, s"$root/ckpt2")
    q2.processAllAvailable(); q2.stop()
    RecordingStream.promote(spark, staging, meetingsBatch2, main)
    val total2 = spark.read.parquet(main)
      .agg(sum("file_size")).as[Long].head()
    assert(total2 === total)
    // exact-dedup operator confirms no duplicate recordings survived
    assert(Dedup.exactGroups(spark.read.parquet(main), "id", "file_size")
      .where(col("n_copies") > 1).isEmpty)
  }
}
