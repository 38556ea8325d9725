package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: schema/partitioning/batch shape are real; the
  * decode is a clearly-marked deterministic stub (no codecs in this
  * container). */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDs = {
    val df = Seq(
      (1L, "alpha bytes payload"), (2L, "beta bytes payload"),
      (3L, "gamma bytes payload")).toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("bytes"))
    Media.fromBytes(df, "id", "bytes", "image")
  }

  test("fromBytes preserves ids and binary payloads distributed") {
    val files = mediaDs.repartition(3)
    assert(files.rdd.getNumPartitions === 3)
    val rows = files.collect()
    assert(rows.map(_.media_id).toSet === Set(1L, 2L, 3L))
    assert(rows.forall(_.content.nonEmpty))
  }

  test("image feature extraction: fixed width, deterministic across runs") {
    val f1 = Media.imageFeatures(mediaDs, dim = 16).collect()
      .sortBy(_.media_id)
    val f2 = Media.imageFeatures(mediaDs.repartition(2), dim = 16).collect()
      .sortBy(_.media_id)
    assert(f1.forall(_.features.length === 16))
    assert(f1.map(_.features.toSeq) === f2.map(_.features.toSeq))
    assert(f1.forall(f => f.width >= 64 && f.channels === 3))
  }

  test("audio features: schema and determinism") {
    val a = Media.audioFeatures(mediaDs, dim = 8).collect()
    assert(a.forall(_.mfcc_like.length === 8))
    assert(a.forall(_.sample_rate === 16000))
  }

  test("resize: metadata updated, bytes transformed deterministically") {
    val out1 = Media.resizeImages(mediaDs, 224, 224).collect()
      .sortBy(_.media_id)
    val out2 = Media.resizeImages(mediaDs.repartition(2), 224, 224)
      .collect().sortBy(_.media_id)
    assert(out1.forall(f => f.width === Some(224) && f.height === Some(224)))
    assert(out1.map(_.content.toSeq) === out2.map(_.content.toSeq))
    assert(out1.forall(_.content.nonEmpty))
  }

  test("metadata queries prune the binary column at the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    mediaDs.toDF().write.mode("overwrite").parquet(s"$dir/media")
    val metaOnly = spark.read.parquet(s"$dir/media")
      .select("media_id", "kind", "path")
    val scan = metaOnly.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("content"),
      readSchema) // blob column skipped entirely by the columnar reader
  }

  test("frameSamplePlan: every-nth-frame metadata, capped") {
    val vids = mediaDs.map(f => f.copy(kind = "video",
      duration_ms = Some(10000L)))
    val plan = Media.frameSamplePlan(vids, everyMs = 1000, maxFrames = 5)
    val perVid = plan.groupBy("media_id").count().as[(Long, Long)]
      .collect().toMap
    assert(perVid.values.toSet === Set(5L)) // capped at 5, not 11
    val ts = plan.where(col("media_id") === 1L)
      .select("frame_ts_ms").as[Long].collect().sorted
    assert(ts === Array(0L, 1000L, 2000L, 3000L, 4000L))
  }
}
