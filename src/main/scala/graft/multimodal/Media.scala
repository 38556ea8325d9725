package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ErrorRouter

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition.
  *
  * Image decode/resize and audio decode are REAL, JDK-only:
  * `javax.imageio` (PNG/JPEG/GIF/BMP) for [[decodeImage]] — true
  * width/height/channels plus a grid-pooled luminance feature vector —
  * and [[resizeImage]] re-rendering through `Graphics2D`;
  * `javax.sound.sampled` (WAV/AIFF/AU PCM) for the audio decoders —
  * true sample rate/frame count, with three feature extractors over
  * the same PCM decode: per-window RMS energy ([[decodeAudio]], the
  * cheap amplitude profile), log-mel spectral energies
  * ([[decodeAudioMel]]) and MFCC ([[decodeAudioMfcc]]) — the last two
  * through the pure-JVM FFT + mel filterbank + DCT-II in [[Dsp]], so
  * real spectral features need no native DSP stack.
  * Video containers parse structurally through [[Mp4Meta]]
  * ([[videoMetadata]]): duration, pixel dimensions and codec fourcc
  * from the ISO-BMFF box tree — parsed container truth without a
  * frame codec.
  * Bytes that are not decodable (garbage, or compressed codecs the JDK
  * does not ship: mp3/aac) become dead-letter rows (VALIDATION)
  * instead of killing the job — the same error-channel shape as
  * [[graft.operators.ErrorRouter]]. Nothing here is stubbed.
  *
  * Scale posture: bytes never leave executors (mapPartitions, no
  * collect); metadata-only queries prune the binary column at the parquet
  * scan (columnar storage makes the blob column free to skip); decode
  * parallelism = partition count, controlled by repartition on media_id.
  * `ImageIO.setUseCache(false)` keeps decode in-memory — no surprise
  * temp-file I/O on executor-local disk for every image.
  */
object Media {

  final case class MediaFile(
      media_id: Long,
      kind: String,            // image | audio | video
      path: String,
      content: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long])

  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      features: Array[Float])

  /** Decode envelope: exactly one of (features-carrying fields, error)
    * is populated — the per-row analog of ErrorRouter's (clean, errors)
    * split, kept in one Dataset so a single mapPartitions pass covers
    * both channels. */
  final case class ImageDecodeResult(
      media_id: Long,
      path: String,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      features: Option[Array[Float]],
      error: Option[String])

  final case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      n_frames: Int,
      features: Array[Float])

  /** Audio analog of [[ImageDecodeResult]]. */
  final case class AudioDecodeResult(
      media_id: Long,
      path: String,
      sample_rate: Option[Int],
      n_frames: Option[Int],
      features: Option[Array[Float]],
      error: Option[String])

  /** Read a directory of binary files through Spark's binaryFile source
    * (the offline analog of the webhook's S10 binary transfer). */
  def readBinaryDir(spark: SparkSession, dir: String, kind: String):
      Dataset[MediaFile] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(
        abs(xxhash64(col("path"))).as("media_id"),
        lit(kind).as("kind"),
        col("path"),
        col("content"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("bigint").as("duration_ms"))
      .as[MediaFile]
  }

  /** Wrap an arbitrary DataFrame with (id, bytes) columns as MediaFiles. */
  def fromBytes(df: DataFrame, idCol: String, bytesCol: String,
      kind: String): Dataset[MediaFile] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("bigint").as("media_id"),
      lit(kind).as("kind"),
      concat(lit("mem://"), col(idCol).cast("string")).as("path"),
      col(bytesCol).as("content"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("bigint").as("duration_ms"))
      .as[MediaFile]
  }

  private def readImage(bytes: Array[Byte]): Either[String, BufferedImage] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) Left("undecodable: not a supported image format")
      else Right(img)
    } catch {
      case NonFatal(e) => Left(s"decode failed: ${e.getMessage}")
    }

  /** REAL image decode (javax.imageio — PNG/JPEG/GIF/BMP/WBMP). The
    * feature vector is grid-pooled luminance: the image is divided into
    * a ceil(sqrt(dim))² cell grid and each cell contributes its mean
    * luma (0.299R+0.587G+0.114B, normalized to [0,1]); the first `dim`
    * cells, row-major. Deterministic, pixel-derived, and cheap — the
    * classic pre-embedding thumbnail signature. */
  def decodeImage(dim: Int = 16)(f: MediaFile): Either[String, ImageFeatures] =
    readImage(f.content).map { img =>
      ImageFeatures(
        media_id = f.media_id,
        width = img.getWidth,
        height = img.getHeight,
        channels = img.getColorModel.getNumComponents,
        features = gridLuminance(img, dim))
    }

  private def gridLuminance(img: BufferedImage, dim: Int): Array[Float] = {
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt.max(1)
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](g * g)
    val counts = new Array[Long](g * g)
    var y = 0
    while (y < h) {
      val cy = math.min(y * g / h, g - 1)
      var x = 0
      while (x < w) {
        val cx = math.min(x * g / w, g - 1)
        val rgb = img.getRGB(x, y)
        val luma = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        val cell = cy * g + cx
        sums(cell) += luma / 255.0
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(math.min(dim, g * g)) { i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat
    }
  }

  /** REAL image resize: decode, re-render through Graphics2D with
    * bilinear interpolation, re-encode as PNG. Undecodable input ⇒ Left. */
  def resizeImage(w: Int, h: Int)(f: MediaFile): Either[String, MediaFile] =
    readImage(f.content).map { img =>
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g2 = out.createGraphics()
      try {
        g2.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(img, 0, 0, w, h, null)
      } finally g2.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      f.copy(content = bos.toByteArray, width = Some(w), height = Some(h))
    }

  /** Decode per partition into the success/error envelope: one decoder
    * setup per partition (ImageIO cache off — in-memory decode), bytes
    * stay distributed. */
  def decodeImages(files: Dataset[MediaFile], dim: Int = 16):
      Dataset[ImageDecodeResult] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      ImageIO.setUseCache(false) // per-partition init point
      val decode = decodeImage(dim) _
      it.map { f =>
        decode(f) match {
          case Right(feat) => ImageDecodeResult(f.media_id, f.path,
            Some(feat.width), Some(feat.height), Some(feat.channels),
            Some(feat.features), None)
          case Left(err) => ImageDecodeResult(f.media_id, f.path,
            None, None, None, None, Some(err))
        }
      }
    }
  }

  /** Successful decodes only (the common fast path). */
  def imageFeatures(files: Dataset[MediaFile], dim: Int = 16):
      Dataset[ImageFeatures] = {
    import files.sparkSession.implicits._
    decodeImages(files, dim)
      .flatMap(r => r.features.map(fs => ImageFeatures(
        r.media_id, r.width.get, r.height.get, r.channels.get, fs)))
  }

  /** Dead-letter projection of a decode envelope: error_type=VALIDATION
    * + the decoder's detail, same schema the streaming dead-letter sink
    * consumes (error taxonomy: [[ErrorRouter.ErrorTypes]]). */
  private def deadLetterOf(decoded: DataFrame): DataFrame = decoded
    .where(col("error").isNotNull)
    .select(col("media_id"), col("path"),
      lit("VALIDATION").as("error_type"),
      col("error").as("error_detail"))

  /** ErrorRouter-shaped split: (features, dead-letter). Both channels
    * derive lazily from one envelope — same contract as
    * [[ErrorRouter.route]]: consuming both in separate actions re-runs
    * the decode pass; callers writing both at scale should persist
    * [[decodeImages]]' output themselves and split it. */
  def imageFeaturesWithDeadLetter(files: Dataset[MediaFile], dim: Int = 16):
      (Dataset[ImageFeatures], DataFrame) = {
    import files.sparkSession.implicits._
    val decoded = decodeImages(files, dim)
    val ok = decoded.flatMap(r => r.features.map(fs => ImageFeatures(
      r.media_id, r.width.get, r.height.get, r.channels.get, fs)))
    (ok, deadLetterOf(decoded.toDF()))
  }

  /** Per-partition resize pass (same distributed shape as decode);
    * undecodable inputs are dropped here — use [[decodeImages]] first if
    * the dead-letter channel matters for the resize pass. */
  def resizeImages(files: Dataset[MediaFile], w: Int, h: Int):
      Dataset[MediaFile] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      ImageIO.setUseCache(false)
      val resize = resizeImage(w, h) _
      it.flatMap(f => resize(f).toOption)
    }
  }

  /** REAL audio decode (javax.sound.sampled — WAV/AIFF/AU PCM, JDK
    * built-in): signed 16-bit PCM, channel-averaged to mono samples in
    * [-1,1], plus the true header sample rate. Compressed codecs
    * (mp3/aac) are not in the JDK ⇒ Left ⇒ dead-letter, same contract
    * as undecodable images. */
  private def readPcmMono(content: Array[Byte])
      : Either[String, (Array[Double], Int)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(content))
      val src = in.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        src.getChannels * 2, src.getSampleRate, false)
      val pcm = javax.sound.sampled.AudioSystem
        .getAudioInputStream(target, in)
      val bytes = try pcm.readAllBytes() finally pcm.close()
      val ch = target.getChannels
      val nFrames = bytes.length / (2 * ch)
      if (nFrames == 0) Left("undecodable: empty audio stream")
      else {
        val samples = new Array[Double](nFrames)
        var i = 0
        while (i < nFrames) {
          var c = 0
          var acc = 0.0
          while (c < ch) {
            val off = (i * ch + c) * 2
            val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
            acc += s / 32768.0
            c += 1
          }
          samples(i) = acc / ch
          i += 1
        }
        Right((samples, src.getSampleRate.toInt))
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException =>
        Left("undecodable: not a supported audio format")
      case NonFatal(e) => Left(s"decode failed: ${e.getMessage}")
    }

  /** RMS-energy features: the signal pooled into `dim` equal windows
    * of RMS (each in [0,1]) — the audio analog of [[decodeImage]]'s
    * luminance grid, cheapest amplitude profile. */
  def decodeAudio(dim: Int = 8)(f: MediaFile): Either[String, AudioFeatures] =
    readPcmMono(f.content).map { case (samples, sr) =>
      val nFrames = samples.length
      val feats = Array.tabulate(dim) { w =>
        val lo = (w.toLong * nFrames / dim).toInt
        val hi = ((w + 1).toLong * nFrames / dim).toInt.max(lo + 1)
          .min(nFrames)
        var ss = 0.0
        var j = lo
        while (j < hi) { ss += samples(j) * samples(j); j += 1 }
        math.sqrt(ss / (hi - lo)).toFloat
      }
      AudioFeatures(f.media_id, sr, nFrames, feats)
    }

  /** REAL log-mel spectral features: the PCM decode above →
    * [[Dsp.logMelSpectrogram]] (Hamming frames, FFT, triangular mel
    * filterbank) → time-mean pooled to one `nMels` vector per file.
    * Peak bin index maps to a physical frequency via
    * [[Dsp.melFilterCentersHz]]. */
  def decodeAudioMel(nMels: Int = 26)(f: MediaFile)
      : Either[String, AudioFeatures] =
    readPcmMono(f.content).flatMap { case (samples, sr) =>
      val mel = Dsp.logMelSpectrogram(samples, sr.toDouble, nMels)
      if (mel.isEmpty)
        Left("undecodable: shorter than one 25 ms analysis window")
      else Right(AudioFeatures(f.media_id, sr, samples.length,
        Dsp.meanPool(mel)))
    }

  /** REAL MFCC features: log-mel frames → DCT-II, first `nCoef`
    * coefficients (c0 = overall log energy), time-mean pooled — the
    * standard compact audio signature for dedup/quality filtering. */
  def decodeAudioMfcc(nMels: Int = 26, nCoef: Int = 13)(f: MediaFile)
      : Either[String, AudioFeatures] =
    readPcmMono(f.content).flatMap { case (samples, sr) =>
      val m = Dsp.mfcc(samples, sr.toDouble, nMels, nCoef)
      if (m.isEmpty)
        Left("undecodable: shorter than one 25 ms analysis window")
      else Right(AudioFeatures(f.media_id, sr, samples.length,
        Dsp.meanPool(m)))
    }

  /** Decode per partition into the success/error envelope with any of
    * the audio feature extractors. */
  private def audioEnvelope(files: Dataset[MediaFile],
      decode: MediaFile => Either[String, AudioFeatures])
      : Dataset[AudioDecodeResult] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.map { f =>
        decode(f) match {
          case Right(a) => AudioDecodeResult(f.media_id, f.path,
            Some(a.sample_rate), Some(a.n_frames), Some(a.features), None)
          case Left(err) => AudioDecodeResult(f.media_id, f.path,
            None, None, None, Some(err))
        }
      }
    }
  }

  private def audioOk(decoded: Dataset[AudioDecodeResult])
      : Dataset[AudioFeatures] = {
    import decoded.sparkSession.implicits._
    decoded.flatMap(r => r.features.map(fs =>
      AudioFeatures(r.media_id, r.sample_rate.get, r.n_frames.get, fs)))
  }

  /** Decode per partition into the success/error envelope (RMS). */
  def decodeAudioFiles(files: Dataset[MediaFile], dim: Int = 8):
      Dataset[AudioDecodeResult] =
    audioEnvelope(files, decodeAudio(dim))

  /** Successful audio decodes only (RMS features). */
  def audioFeatures(files: Dataset[MediaFile], dim: Int = 8):
      Dataset[AudioFeatures] =
    audioOk(decodeAudioFiles(files, dim))

  /** ErrorRouter-shaped split for audio: (features, dead-letter); same
    * one-envelope/two-lazy-channels contract as
    * [[imageFeaturesWithDeadLetter]]. */
  def audioFeaturesWithDeadLetter(files: Dataset[MediaFile], dim: Int = 8):
      (Dataset[AudioFeatures], DataFrame) = {
    val decoded = decodeAudioFiles(files, dim)
    (audioOk(decoded), deadLetterOf(decoded.toDF()))
  }

  /** Log-mel features with the dead-letter channel. */
  def melFeaturesWithDeadLetter(files: Dataset[MediaFile], nMels: Int = 26):
      (Dataset[AudioFeatures], DataFrame) = {
    val decoded = audioEnvelope(files, decodeAudioMel(nMels))
    (audioOk(decoded), deadLetterOf(decoded.toDF()))
  }

  /** MFCC features with the dead-letter channel. */
  def mfccFeaturesWithDeadLetter(files: Dataset[MediaFile],
      nMels: Int = 26, nCoef: Int = 13):
      (Dataset[AudioFeatures], DataFrame) = {
    val decoded = audioEnvelope(files, decodeAudioMfcc(nMels, nCoef))
    (audioOk(decoded), deadLetterOf(decoded.toDF()))
  }

  /** Video analog of [[ImageDecodeResult]]: parsed ISO-BMFF container
    * truth (no frame decode — see [[Mp4Meta]]). */
  final case class VideoMetaResult(
      media_id: Long,
      path: String,
      brand: Option[String],
      duration_ms: Option[Long],
      width: Option[Int],
      height: Option[Int],
      codec: Option[String],
      frame_count: Option[Long],
      fps: Option[Double],
      media_timescale: Option[Long],
      language: Option[String],
      error: Option[String])

  /** REAL video container parse per partition ([[Mp4Meta]]): duration,
    * dimensions and codec fourcc from the MP4 box structure — parsed
    * metadata, not path metadata. Non-BMFF bytes get the same
    * VALIDATION dead-letter contract as undecodable images/audio. */
  def videoMetadata(files: Dataset[MediaFile]): Dataset[VideoMetaResult] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.map { f =>
        Mp4Meta.parse(f.content) match {
          case Right(m) => VideoMetaResult(f.media_id, f.path,
            Some(m.brand), Some(m.duration_ms), m.width, m.height,
            m.codec, m.frame_count, m.fps, m.media_timescale,
            m.language, None)
          case Left(err) => VideoMetaResult(f.media_id, f.path,
            None, None, None, None, None, None, None, None, None,
            Some(err))
        }
      }
    }
  }

  /** ErrorRouter-shaped split for video metadata. */
  def videoMetadataWithDeadLetter(files: Dataset[MediaFile]):
      (Dataset[VideoMetaResult], DataFrame) = {
    import files.sparkSession.implicits._
    val decoded = videoMetadata(files)
    (decoded.filter((r: VideoMetaResult) => r.error.isEmpty),
      deadLetterOf(decoded.toDF()))
  }

  /** Enrich video MediaFiles with PARSED duration/dimensions so the
    * frame-sample plan runs on container truth instead of caller-
    * supplied values; unparseable files keep their original metadata
    * (and surface on [[videoMetadata]]'s dead-letter channel). */
  def withParsedVideoMeta(files: Dataset[MediaFile]): Dataset[MediaFile] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.map { f =>
        if (f.kind != "video") f
        else Mp4Meta.parse(f.content) match {
          case Right(m) => f.copy(
            width = m.width.orElse(f.width),
            height = m.height.orElse(f.height),
            duration_ms = Some(m.duration_ms))
          case Left(_) => f
        }
      }
    }
  }

  /** Frame sampling plan for video: every nth frame index up to a cap —
    * pure metadata computation (decoding each sampled frame is the image
    * path above once frames are extracted). */
  def frameSamplePlan(files: Dataset[MediaFile], everyMs: Long,
      maxFrames: Int): DataFrame = {
    files.toDF()
      .where(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L),
          least((col("duration_ms") / everyMs).cast("long"),
            lit(maxFrames.toLong - 1)))).as("frame_idx"))
      .withColumn("frame_ts_ms", col("frame_idx") * everyMs)
  }
}
