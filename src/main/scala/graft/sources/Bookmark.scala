package graft.sources

import java.nio.charset.StandardCharsets
import java.time.Instant

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Incremental-scan watermark (S8, ref src/zoom/extract.py:196-211):
  * a one-row bookmark controlling how far the batch pipeline has read.
  *
  * Reference semantics replicated exactly:
  *  - read defaults to NOW on first run or unreadable state ("no
  *    backfill", extract.py:200,203);
  *  - commit happens only AFTER the full load succeeds (DAG ordering
  *    etl_process.py:236) — at-least-once reprocessing on failure, safe
  *    because all sinks are idempotent upserts.
  *
  * Storage is a tiny file (atomic tmp+rename) — driver-side metadata,
  * never a distributed dataset.
  */
class Bookmark(spark: SparkSession, path: String) {
  private val hPath = new Path(path)
  private def fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val bakPath = new Path(path + ".bak")

  /** Last committed watermark, or `default` (ref: now) if absent/corrupt.
    * Falls back to the previous generation (`.bak`) if the primary is
    * missing — covers a crash mid-commit, so a committed watermark is
    * never silently lost. */
  def read(default: Instant = Instant.now()): Instant =
    readFile(hPath).orElse(readFile(bakPath)).getOrElse(default)

  private def readFile(p: Path): Option[Instant] =
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val bytes = new Array[Byte](256)
          val n = in.read(bytes)
          Some(Instant.parse(new String(bytes, 0, math.max(n, 0),
            StandardCharsets.UTF_8).trim))
        } finally in.close()
      }
    } catch { case _: Exception => None }

  /** Commit a new watermark. Crash-safe without atomic-overwrite rename:
    * tmp is fully written first, the old primary is preserved as `.bak`
    * until the new primary lands — at every instant at least one of
    * (primary, bak) holds a committed watermark. Call ONLY after the
    * downstream load has fully succeeded. */
  def commit(ts: Instant): Unit = {
    val tmp = new Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(ts.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(bakPath)) fs.delete(bakPath, false)
    if (fs.exists(hPath)) fs.rename(hPath, bakPath)
    fs.rename(tmp, hPath)
  }
}
