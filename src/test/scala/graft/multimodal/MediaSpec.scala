package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing with REAL JDK-only codecs: javax.imageio for
  * image decode/resize (a committed 64×48 RGB gradient PNG/JPEG) and
  * javax.sound.sampled for audio (a committed 440Hz sine WAV) — true
  * pixel/PCM-derived metadata and features, distributed, with
  * dead-letter routing for undecodable bytes. */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing test fixture $name")
    try in.readAllBytes() finally in.close()
  }

  /** 2 real images (PNG + JPEG of the same gradient) + 1 garbage blob. */
  private def mediaDs = {
    val rows = Seq(
      (1L, fixtureBytes("gradient.png")),
      (2L, fixtureBytes("gradient.jpg")),
      (3L, "definitely not an image".getBytes("UTF-8")))
    val df = rows.toDF("id", "bytes")
    Media.fromBytes(df, "id", "bytes", "image")
  }

  test("fromBytes preserves ids and binary payloads distributed") {
    val files = mediaDs.repartition(3)
    assert(files.rdd.getNumPartitions === 3)
    val rows = files.collect()
    assert(rows.map(_.media_id).toSet === Set(1L, 2L, 3L))
    assert(rows.forall(_.content.nonEmpty))
  }

  test("real decode: committed PNG fixture yields true pixel metadata") {
    val feats = Media.imageFeatures(mediaDs, dim = 16).collect()
      .sortBy(_.media_id)
    // garbage blob (id 3) is excluded from the success channel
    assert(feats.map(_.media_id).toSeq === Seq(1L, 2L))
    feats.foreach { f =>
      assert(f.width === 64 && f.height === 48 && f.channels === 3)
      assert(f.features.length === 16)
      assert(f.features.forall(v => v >= 0f && v <= 1f))
    }
    // the fixture brightens left→right (red ramp) and top→bottom (green
    // ramp): each 4×4 grid row must be monotonically increasing, and so
    // must the column means — real pixels, not a hash fake.
    val g = feats.head.features.grouped(4).toArray
    g.foreach(row => assert(row.sliding(2).forall(p => p(1) > p(0)),
      row.mkString(",")))
    val colMeans = (0 until 4).map(c => g.map(_(c)).sum / 4)
    assert(colMeans.sliding(2).forall(p => p(1) > p(0)))
    // PNG and JPEG of the same image decode to nearly identical features
    val Array(png, jpg) = feats
    png.features.zip(jpg.features).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.02f)
    }
  }

  test("decode is deterministic across repartitioning") {
    val f1 = Media.imageFeatures(mediaDs, dim = 16).collect()
      .sortBy(_.media_id)
    val f2 = Media.imageFeatures(mediaDs.repartition(2), dim = 16).collect()
      .sortBy(_.media_id)
    assert(f1.map(_.features.toSeq) === f2.map(_.features.toSeq))
  }

  test("undecodable bytes route to the VALIDATION dead-letter channel") {
    val (ok, dead) = Media.imageFeaturesWithDeadLetter(mediaDs, dim = 16)
    assert(ok.collect().map(_.media_id).toSet === Set(1L, 2L))
    val d = dead.collect()
    assert(d.length === 1)
    val row = d.head
    assert(row.getAs[Long]("media_id") === 3L)
    assert(row.getAs[String]("error_type") === "VALIDATION")
    assert(row.getAs[String]("error_detail").contains("undecodable"))
  }

  test("real resize: output re-decodes at the target geometry") {
    val out = Media.resizeImages(mediaDs, 16, 12).collect()
      .sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L)) // garbage dropped
    assert(out.forall(f => f.width === Some(16) && f.height === Some(12)))
    // the resized bytes are themselves a decodable PNG of that size
    out.foreach { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.content))
      assert(img != null && img.getWidth === 16 && img.getHeight === 12)
    }
    // and the gradient survives the resample: left edge darker than right
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.head.content))
    def luma(rgb: Int): Double =
      0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
    assert(luma(img.getRGB(0, 6)) < luma(img.getRGB(15, 6)))
  }

  test("real audio decode: committed WAV fixture yields true PCM features") {
    // 0.25s of a 440Hz sine at 8kHz mono 16-bit, amplitude 12000/32768
    val rows = Seq(
      (10L, fixtureBytes("tone.wav")),
      (11L, "not audio at all".getBytes("UTF-8")))
    val ds = Media.fromBytes(rows.toDF("id", "bytes"), "id", "bytes", "audio")
    val (ok, dead) = Media.audioFeaturesWithDeadLetter(ds, dim = 8)
    val a = ok.collect()
    assert(a.map(_.media_id).toSeq === Seq(10L))
    val t = a.head
    assert(t.sample_rate === 8000)   // true header rate, not a fake
    assert(t.n_frames === 2000)      // true frame count
    assert(t.features.length === 8)
    // RMS of a sine at amplitude 0.366 is ~0.259 in every window
    t.features.foreach(v => assert(v > 0.2f && v < 0.32f, v))
    assert(t.features.max - t.features.min < 0.05f) // steady tone
    val d = dead.collect()
    assert(d.length === 1 && d.head.getAs[Long]("media_id") === 11L)
    assert(d.head.getAs[String]("error_detail").contains("undecodable"))
  }

  test("real log-mel features: the committed 440 Hz fixture peaks in " +
      "the mel bin whose center is nearest 440 Hz") {
    val rows = Seq(
      (10L, fixtureBytes("tone.wav")),
      (11L, "not audio at all".getBytes("UTF-8")))
    val ds = Media.fromBytes(rows.toDF("id", "bytes"), "id", "bytes", "audio")
    val (ok, dead) = Media.melFeaturesWithDeadLetter(ds, nMels = 26)
    val a = ok.collect()
    assert(a.map(_.media_id).toSeq === Seq(10L))
    val t = a.head
    assert(t.sample_rate === 8000 && t.n_frames === 2000)
    assert(t.features.length === 26)
    val centers = Dsp.melFilterCentersHz(26, 8000.0)
    val peak = t.features.indexOf(t.features.max)
    val nearest = centers.indices.minBy(i => math.abs(centers(i) - 440.0))
    // REAL spectral analysis: the tone lands in the physically correct
    // filter, not just "some features came out"
    assert(peak === nearest,
      s"peak bin $peak (${centers(peak)} Hz) should be $nearest " +
        s"(${centers(nearest)} Hz)")
    assert(dead.collect().map(_.getAs[Long]("media_id")).toSeq === Seq(11L))
  }

  test("real mfcc features: finite, 13 coefficients, repartition-" +
      "invariant; sub-window audio dead-letters") {
    val ds = Media.fromBytes(
      Seq((10L, fixtureBytes("tone.wav"))).toDF("id", "bytes"),
      "id", "bytes", "audio")
    val f1 = Media.mfccFeaturesWithDeadLetter(ds)._1.collect().head
    assert(f1.features.length === 13)
    assert(f1.features.forall(v => !v.isNaN && !v.isInfinite))
    val f2 = Media.mfccFeaturesWithDeadLetter(ds.repartition(2))._1
      .collect().head
    assert(f1.features.toSeq === f2.features.toSeq)
    // audio shorter than one 25 ms analysis window cannot be framed:
    // VALIDATION dead letter, not an exception or a NaN vector
    val shortWav = {
      val n = 50 // 50 samples @ 8 kHz = 6.25 ms
      val data = new Array[Byte](n * 2)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true,
        false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val tiny = Media.fromBytes(
      Seq((12L, shortWav)).toDF("id", "bytes"), "id", "bytes", "audio")
    val (ok, dead) = Media.mfccFeaturesWithDeadLetter(tiny)
    assert(ok.collect().isEmpty)
    val d = dead.collect()
    assert(d.length === 1 &&
      d.head.getAs[String]("error_detail").contains("25 ms"))
  }

  test("audio decode is deterministic across repartitioning") {
    val ds = Media.fromBytes(
      Seq((10L, fixtureBytes("tone.wav"))).toDF("id", "bytes"),
      "id", "bytes", "audio")
    val f1 = Media.audioFeatures(ds, dim = 8).collect().head
    val f2 = Media.audioFeatures(ds.repartition(2), dim = 8).collect().head
    assert(f1.features.toSeq === f2.features.toSeq)
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

  test("real video container parse: committed MP4 fixture yields " +
      "parsed duration/dims/codec; garbage dead-letters") {
    val rows = Seq(
      (20L, fixtureBytes("tiny.mp4")),
      (21L, "definitely not a video".getBytes("UTF-8")))
    val ds = Media.fromBytes(rows.toDF("id", "bytes"), "id", "bytes", "video")
    val (ok, dead) = Media.videoMetadataWithDeadLetter(ds)
    val v = ok.collect()
    assert(v.map(_.media_id).toSeq === Seq(20L))
    val m = v.head
    // parsed CONTAINER truth, not path metadata: mvhd duration at
    // timescale 1000, tkhd 16.16 dims, stsd sample-entry fourcc
    assert(m.brand === Some("isom"))
    assert(m.duration_ms === Some(5000L))
    assert(m.width === Some(320) && m.height === Some(240))
    assert(m.codec === Some("avc1"))
    val d = dead.collect()
    assert(d.length === 1 && d.head.getAs[Long]("media_id") === 21L)
    assert(d.head.getAs[String]("error_type") === "VALIDATION")
    assert(d.head.getAs[String]("error_detail").contains("undecodable"))
  }

  test("withParsedVideoMeta feeds parsed duration into frameSamplePlan") {
    val ds = Media.fromBytes(
      Seq((20L, fixtureBytes("tiny.mp4"))).toDF("id", "bytes"),
      "id", "bytes", "video")
    // no caller-supplied duration: the plan can only come from the parse
    assert(ds.collect().head.duration_ms === None)
    val enriched = Media.withParsedVideoMeta(ds)
    val e = enriched.collect().head
    assert(e.duration_ms === Some(5000L))
    assert(e.width === Some(320) && e.height === Some(240))
    val plan = Media.frameSamplePlan(enriched, everyMs = 1000, maxFrames = 10)
    val ts = plan.select("frame_ts_ms").as[Long].collect().sorted
    assert(ts === Array(0L, 1000L, 2000L, 3000L, 4000L, 5000L))
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
