package graft.sinks

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class ObjectStoreSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmpBase(): String =
    "file:" + Files.createTempDirectory("graft_sink_").toString

  private def payload(n: Int): Array[Byte] =
    Array.tabulate(n)(i => (i % 251).toByte)

  private def files = Seq(
    (1L, "recordings/alice/standup/2026-01-01/video.mp4", payload(1024)),
    (2L, "recordings/bob/retro/2026-01-02/audio.m4a", payload(77)),
    (3L, "recordings/bob/retro/2026-01-02/chat.txt", payload(0))
  ).toDF("media_id", "s3_key", "content")

  private def readBack(base: String, key: String): Array[Byte] =
    Files.readAllBytes(Paths.get(base.stripPrefix("file:"), key))

  test("uploads land at templated keys in primary AND secondary") {
    val (p, s) = (tmpBase(), tmpBase())
    val m = ObjectStoreSink.upload(files, "media_id", "s3_key", "content",
      p, Some(s)).collect().sortBy(_.id)
    assert(m.length === 3)
    assert(m.forall(_.status == "ok"))
    assert(m.map(_.n_bytes).toSeq === Seq(1024L, 77L, 0L))
    m.foreach { r =>
      assert(r.primary_uri === s"$p/${r.key}")
      assert(r.secondary_uri === Some(s"$s/${r.key}"))
      assert(readBack(p, r.key).toSeq === readBack(s, r.key).toSeq)
    }
    assert(readBack(p, m.head.key).length === 1024)
    // no stranded tmp files after the rename commit
    assert(!Files.walk(Paths.get(p.stripPrefix("file:")))
      .anyMatch(q => q.toString.endsWith(".__tmp")))
  }

  test("replay is idempotent: existing keys are skipped, not rewritten") {
    val p = tmpBase()
    val first = ObjectStoreSink.upload(files, "media_id", "s3_key",
      "content", p).collect()
    assert(first.forall(_.status == "ok"))
    // replay with DIFFERENT bytes: originals must survive
    val changed = files.withColumn("content",
      org.apache.spark.sql.functions.lit(payload(5)))
    val second = ObjectStoreSink.upload(changed, "media_id", "s3_key",
      "content", p).collect()
    assert(second.forall(_.status == "exists"))
    assert(readBack(p, "recordings/alice/standup/2026-01-01/video.mp4")
      .length === 1024)
  }

  test("overwrite=true replaces via tmp+rename") {
    val p = tmpBase()
    ObjectStoreSink.upload(files, "media_id", "s3_key", "content", p)
      .collect()
    val changed = files.withColumn("content",
      org.apache.spark.sql.functions.lit(payload(5)))
    val m = ObjectStoreSink.upload(changed, "media_id", "s3_key",
      "content", p, overwrite = true).collect()
    assert(m.forall(_.status == "ok"))
    assert(readBack(p, "recordings/bob/retro/2026-01-02/audio.m4a")
      .length === 5)
  }

  test("secondary failure is tolerated: link nulled, row still ok") {
    val p = tmpBase()
    // secondary base is a regular FILE — creating children under it
    // fails, which is the Dropbox-down scenario (handler.py:90-95)
    val blocked = Files.createTempFile("graft_sink_blocked_", "")
    val m = ObjectStoreSink.upload(files, "media_id", "s3_key", "content",
      p, Some("file:" + blocked.toString)).collect()
    assert(m.forall(_.status == "ok"))
    assert(m.forall(_.secondary_uri.isEmpty))
    assert(readBack(p, "recordings/bob/retro/2026-01-02/chat.txt")
      .length === 0)
  }

  test("primary failure is NOT tolerated: status carries the error") {
    val blocked = Files.createTempFile("graft_sink_blocked_", "")
    val m = ObjectStoreSink.upload(files, "media_id", "s3_key", "content",
      "file:" + blocked.toString).collect()
    assert(m.forall(_.status.startsWith("error")))
    assert(m.forall(_.primary_uri == null))
  }
}
