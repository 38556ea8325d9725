package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, the
  * `binaryFile` source — is real and tested; the actual codec work is
  * STUBBED with deterministic fakes (this container ships no image/audio
  * libraries), clearly marked below. Swap `decodeImageStub` /
  * `extractAudioFeaturesStub` for real codecs on a cluster with the
  * native libs installed; nothing else changes.
  *
  * Scale posture: bytes never leave executors (mapPartitions, no
  * collect); metadata-only queries prune the binary column at the parquet
  * scan (columnar storage makes the blob column free to skip); decode
  * parallelism = partition count, controlled by repartition on media_id.
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

  final case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      n_frames: Int,
      mfcc_like: Array[Float])

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

  /** STUB — deterministic fake image decode. A real implementation
    * would JNI/FFI into an image codec here; the fake derives a stable
    * pseudo-decode from the bytes so the pipeline shape (per-partition
    * batching, fixed feature width, nullability) is fully exercised. */
  def decodeImageStub(dim: Int = 16)(f: MediaFile): ImageFeatures = {
    val h = java.util.Arrays.hashCode(f.content)
    val rnd = new scala.util.Random(h)
    ImageFeatures(
      media_id = f.media_id,
      width = 64 + rnd.nextInt(1024),
      height = 64 + rnd.nextInt(1024),
      channels = 3,
      features = Array.fill(dim)(rnd.nextFloat()))
  }

  /** STUB — deterministic fake image resize: produces a new MediaFile
    * whose bytes are a stable function of (input bytes, target size) and
    * whose metadata reflects the target dimensions. A real
    * implementation swaps only the byte transform. */
  def resizeImageStub(w: Int, h: Int)(f: MediaFile): MediaFile = {
    val seed = java.util.Arrays.hashCode(f.content) ^ (w * 31 + h)
    val rnd = new scala.util.Random(seed)
    val resized = Array.fill(math.max(16, f.content.length / 4))(
      rnd.nextInt().toByte)
    f.copy(content = resized, width = Some(w), height = Some(h))
  }

  /** Per-partition resize pass (same distributed shape as decode). */
  def resizeImages(files: Dataset[MediaFile], w: Int, h: Int):
      Dataset[MediaFile] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      val resize = resizeImageStub(w, h) _
      it.map(resize)
    }
  }

  /** STUB — deterministic fake audio feature extraction. */
  def extractAudioFeaturesStub(dim: Int = 8)(f: MediaFile): AudioFeatures = {
    val h = java.util.Arrays.hashCode(f.content)
    val rnd = new scala.util.Random(h ^ 0x5bd1e995)
    AudioFeatures(
      media_id = f.media_id,
      sample_rate = 16000,
      n_frames = 1 + rnd.nextInt(100000),
      mfcc_like = Array.fill(dim)(rnd.nextFloat()))
  }

  /** Decode/feature-extract per partition: one decoder instance per
    * partition (the executor-singleton pattern — codecs are expensive to
    * init), bytes stay distributed. */
  def imageFeatures(files: Dataset[MediaFile], dim: Int = 16):
      Dataset[ImageFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      val decode = decodeImageStub(dim) _ // per-partition init point
      it.map(decode)
    }
  }

  def audioFeatures(files: Dataset[MediaFile], dim: Int = 8):
      Dataset[AudioFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      val extract = extractAudioFeaturesStub(dim) _
      it.map(extract)
    }
  }

  /** Frame sampling plan for video: every nth frame index up to a cap —
    * pure metadata computation (the decode of each frame is the stub
    * above on a real cluster). */
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
