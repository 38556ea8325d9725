package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** R1 golden test derived from the reference's only committed fixture
  * (lambda/zoom_webhook/event.json:1-70): two video-category files
  * (shared_screen_with_speaker_view, audio_only) plus a participant
  * audio file; the handler's preference lists (handler.py:18-24) must
  * pick shared_screen_with_speaker_view for video and audio_only for
  * audio_fallback, with last-write-wins on duplicate types. */
class PrioritySelectSpec extends SparkSpec {
  import spark.implicits._

  private val prefs = Map(
    "video" -> Seq("shared_screen_with_speaker_view", "shared_screen",
      "active_speaker", "gallery_view"),
    "audio_fallback" -> Seq("audio_only"),
    "transcript" -> Seq("audio_transcript", "closed_caption"),
    "chat" -> Seq("chat_file"))

  test("event.json golden: speaker view beats audio_only for video") {
    val files = Seq(
      ("f1", "m1", "shared_screen_with_speaker_view", 1L),
      ("f2", "m1", "audio_only", 2L),
      ("f3", "m1", "chat_file", 3L))
      .toDF("id", "muuid", "file_type", "arrival")
    val prio = PrioritySelect.priorityTable(spark, prefs)
    val out = PrioritySelect.top1ByPriority(files, prio, "file_type",
        Seq("muuid"), Seq(col("arrival").desc))
      .select("category", "id")
      .as[(String, String)].collect().toMap
    assert(out("video") === "f1")
    assert(out("audio_fallback") === "f2")
    assert(out("chat") === "f3")
    assert(!out.contains("transcript")) // no transcript file present
  }

  test("fallback within a category: next preference when first absent") {
    val files = Seq(("f1", "m1", "gallery_view", 1L),
      ("f2", "m1", "active_speaker", 2L))
      .toDF("id", "muuid", "file_type", "arrival")
    val prio = PrioritySelect.priorityTable(spark, prefs)
    val out = PrioritySelect.top1ByPriority(files, prio, "file_type",
        Seq("muuid"), Seq(col("arrival").desc))
      .select("category", "id").as[(String, String)].collect().toMap
    assert(out("video") === "f2") // active_speaker ranks above gallery_view
  }

  test("duplicate file_type resolves last-write-wins (handler.py:26)") {
    val files = Seq(("old", "m1", "audio_only", 1L),
      ("new", "m1", "audio_only", 2L))
      .toDF("id", "muuid", "file_type", "arrival")
    val prio = PrioritySelect.priorityTable(spark, prefs)
    val out = PrioritySelect.top1ByPriority(files, prio, "file_type",
        Seq("muuid"), Seq(col("arrival").desc))
      .select("category", "id").as[(String, String)].collect().toMap
    assert(out("audio_fallback") === "new")
  }

  test("selection is per-group: two meetings select independently") {
    val files = Seq(("f1", "m1", "audio_only", 1L),
      ("f2", "m2", "shared_screen", 1L))
      .toDF("id", "muuid", "file_type", "arrival")
    val prio = PrioritySelect.priorityTable(spark, prefs)
    val out = PrioritySelect.top1ByPriority(files, prio, "file_type",
        Seq("muuid"), Seq(col("arrival").desc))
      .select("muuid", "category", "id")
      .as[(String, String, String)].collect().toSet
    assert(out === Set(("m1", "audio_fallback", "f1"), ("m2", "video", "f2")))
  }
}
