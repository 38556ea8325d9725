package graft.sinks

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Object-store sink for binary payload columns (K6/K7) — the engine
  * analog of the reference's recording uploads
  * (lambda/zoom_webhook/handler.py:69-95): each file lands at its
  * templated key in a PRIMARY store, then best-effort in an optional
  * SECONDARY store whose failure is tolerated (handler.py:90-95 logs
  * and nulls the Dropbox link); every file yields a manifest row with
  * the resulting links (the reference's metadata row, handler.py:85,93).
  *
  * Spark-first shape:
  *  - uploads run per PARTITION on executors (`mapPartitions`) — bytes
  *    never visit the driver, parallelism = partition count;
  *  - the store is addressed through the Hadoop FileSystem API, the
  *    same call surface for file://, hdfs://, and s3a:// — offline
  *    tests drive a local directory, a cluster points at a bucket;
  *  - one FileSystem handle per (partition, scheme) — the
  *    executor-singleton discipline (codecs/clients are expensive);
  *  - idempotent by default: an existing object is SKIPPED (`status =
  *    "exists"`), so a replayed micro-batch or retried task cannot
  *    re-upload or corrupt; `overwrite = true` opts out;
  *  - crash-safe visibility: bytes stream to `<key>.__tmp` and RENAME
  *    onto the final key, so a killed task never leaves a partial
  *    object at a readable key (on S3A rename is copy+delete — still
  *    safe, just not O(1); a committer-style multipart upload is the
  *    cluster upgrade path).
  *
  * The returned manifest is a small DataFrame (one row per input file,
  * no bytes) — join it back to metadata exactly like the reference's
  * `insert_to_rds(metadata)` step (handler.py:97).
  */
object ObjectStoreSink {

  final case class UploadManifest(
      id: Long,
      key: String,
      primary_uri: String,
      secondary_uri: Option[String],
      n_bytes: Long,
      status: String)

  /** Upload `bytesCol` of every row to `primaryBase/<keyCol>` (and
    * best-effort to `secondaryBase/<keyCol>`), returning the manifest.
    *
    * @param df rows carrying at least (idCol: long, keyCol: string,
    *           bytesCol: binary); other columns are ignored
    * @param primaryBase base URI of the required store
    *                    (e.g. "file:/data/out", "s3a://bucket")
    * @param secondaryBase optional second store; failures there do NOT
    *                      fail the row (status stays "ok"/"exists",
    *                      secondary_uri is null) — reference semantics
    * @param overwrite false ⇒ existing keys are skipped (idempotent
    *                  replay); true ⇒ replaced via tmp+rename
    */
  def upload(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      bytesCol: String,
      primaryBase: String,
      secondaryBase: Option[String] = None,
      overwrite: Boolean = false): Dataset[UploadManifest] = {
    val spark = df.sparkSession
    import spark.implicits._
    // Hadoop conf captured on the driver as a plain serializable map
    // (fs.s3a.* creds etc.); a fresh Configuration() on the executor
    // would miss every spark.hadoop.* setting
    val confMap = spark.sparkContext.hadoopConfiguration
      .asScala.map(e => e.getKey -> e.getValue).toMap
    val primary = stripTrailingSlash(primaryBase)
    val secondary = secondaryBase.map(stripTrailingSlash)

    df.select(
        col(idCol).cast("long").as("id"),
        col(keyCol).cast("string").as("key"),
        col(bytesCol).cast("binary").as("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confMap.foreach { case (k, v) => conf.set(k, v) }
        // one FS per (scheme, authority) for the whole partition —
        // scheme alone would alias s3a://bucketA and s3a://bucketB to
        // whichever store resolved first (Hadoop then throws "Wrong FS"
        // on the other's paths)
        val fsCache = scala.collection.mutable.Map.empty[String, FileSystem]
        def fsFor(uri: String): FileSystem = {
          val u = new java.net.URI(uri)
          val cacheKey = u.getScheme + "://" +
            Option(u.getAuthority).getOrElse("")
          fsCache.getOrElseUpdate(cacheKey, new Path(uri).getFileSystem(conf))
        }
        it.map { case (id, key, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          val primaryUri = s"$primary/$key"
          val status =
            try putObject(fsFor(primary), primaryUri, bytes, overwrite)
            catch {
              case scala.util.control.NonFatal(e) =>
                s"error: ${e.getMessage}"
            }
          // secondary is best-effort (handler.py:90-95): any failure
          // nulls the link and the row still succeeds
          val secondaryUri = secondary.flatMap { base =>
            val uri = s"$base/$key"
            try {
              putObject(fsFor(base), uri, bytes, overwrite)
              Some(uri)
            } catch { case scala.util.control.NonFatal(_) => None }
          }
          UploadManifest(id, key,
            if (status.startsWith("error")) null else primaryUri,
            if (status.startsWith("error")) None else secondaryUri,
            n, status)
        }
      }
  }

  /** Write bytes at `uri` via tmp+rename; returns "ok" or "exists".
    *
    * The tmp path carries a per-attempt UUID suffix so speculative or
    * retried tasks uploading the same key never interleave writes on a
    * shared tmp object or race each other's rename. With
    * `overwrite = true` the delete-then-rename leaves a window where no
    * object exists at the key — that is the documented trade for
    * replaceability; `overwrite = false` (the default) has no such
    * window because an existing key is never touched. */
  private def putObject(
      fs: FileSystem, uri: String, bytes: Array[Byte],
      overwrite: Boolean): String = {
    val target = new Path(uri)
    if (!overwrite && fs.exists(target)) return "exists"
    val tmp = new Path(uri + ".__tmp-" + java.util.UUID.randomUUID())
    val out = fs.create(tmp, true)
    try {
      try out.write(if (bytes == null) Array.emptyByteArray else bytes)
      finally out.close()
      if (fs.exists(target)) fs.delete(target, false)
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"rename failed for $uri")
      "ok"
    } finally {
      // a failed attempt must not strand its uniquely-named tmp object
      try if (fs.exists(tmp)) fs.delete(tmp, false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  private def stripTrailingSlash(s: String): String =
    if (s.endsWith("/")) s.dropRight(1) else s
}
