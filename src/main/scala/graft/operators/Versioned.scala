package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generational snapshot tables with time travel: every commit writes a
  * NEW `gen=<k>` directory and old generations stay readable until
  * retention removes them — the lakehouse version-travel idea
  * (Delta/Iceberg snapshots) on plain parquet directories. Where
  * [[Upsert.writeSnapshot]] keeps exactly one current generation
  * (atomic swap, minimal storage), this keeps `retain` of them:
  * debugging a pipeline regression, reproducing a training run against
  * the exact corpus version it saw, and auditing "what changed" all
  * need yesterday's table, which a swap destroys.
  *
  * Crash safety via commit markers, not pointer files: a generation
  * directory is visible ONLY once its `_graft_committed` marker exists,
  * and the marker is written LAST — a crash mid-write leaves an
  * uncommitted dir that readers never resolve (and the next commit
  * reuses the next free number; stray uncommitted dirs are cleaned by
  * retention). Resolving "latest" = max committed generation needs one
  * root listing plus one marker probe per candidate — metadata-scale,
  * no rename races, no shared pointer FILE to read-modify-write.
  *
  * SINGLE WRITER per table, like every snapshot committer here (the
  * same contract Upsert's partitioned commits state): generation
  * numbering is list-then-write, so two CONCURRENT committers could
  * pick the same number. The marker write guards the publish — a
  * second committer landing on a number whose marker already exists
  * fails loudly instead of double-publishing — but coordination of
  * concurrent writers belongs to the caller (readers are always safe:
  * they only ever resolve fully-committed generations).
  *
  * Scale: each commit writes the FULL dataframe — this is the
  * versioned analog of the flat snapshot, sized for dimension/curated
  * tables. Fact tables at 100 TB version per PARTITION instead
  * (partition-scoped commits already leave untouched dirs
  * byte-identical; pair them with a manifest per generation if full
  * fact-table travel is ever needed). */
object Versioned {

  val CommitMarker = "_graft_committed"

  final case class Commit(gen: Long, path: String)

  private def genDir(root: Path, g: Long) = new Path(root, s"gen=$g")

  /** Committed generation numbers, ascending. */
  def generations(spark: SparkSession, tablePath: String): Seq[Long] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root)
      .filter(_.isDirectory)
      .map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (!n.startsWith("gen=")) None
        else n.stripPrefix("gen=").toLongOption
          .filter(_ => fs.exists(new Path(p, CommitMarker)))
      }
      .sorted.toSeq
  }

  /** Write `df` as the next generation; visible to readers only after
    * the commit marker lands. Old generations beyond `retain` (and any
    * uncommitted leftovers below the retention floor) are removed. */
  def commit(df: DataFrame, tablePath: String, retain: Int = 3): Commit = {
    require(retain >= 1, "retain must keep at least the new generation")
    val spark = df.sparkSession
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) fs.mkdirs(root)
    // next free number past every dir present — committed or not, so a
    // crashed writer's leftover is never overwritten concurrently
    val present = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .flatMap(n => if (n.startsWith("gen="))
        n.stripPrefix("gen=").toLongOption else None)
    val next = if (present.isEmpty) 0L else present.max + 1L
    val dir = genDir(root, next)
    df.write.mode("overwrite").parquet(dir.toString)
    val marker = new Path(dir, CommitMarker)
    require(!fs.exists(marker),
      s"Versioned.commit: generation $next at $tablePath was committed " +
        "concurrently — this table requires a single writer")
    fs.create(marker, true).close()
    // retention: committed gens beyond the window, and uncommitted
    // debris older than the retention floor
    val committed = generations(spark, tablePath)
    val floor = committed.takeRight(retain).headOption.getOrElse(next)
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("gen=")) // NEVER delete foreign dirs
      .foreach { p =>
        p.getName.stripPrefix("gen=").toLongOption.foreach { g =>
          if (g < floor) fs.delete(p, true)
        }
      }
    Commit(next, dir.toString)
  }

  /** Read a specific generation (must be committed) or, with None, the
    * latest committed one. Fails loudly on a never-committed table or
    * an uncommitted/evicted generation — never resolves half-written
    * data. */
  def read(
      spark: SparkSession,
      tablePath: String,
      gen: Option[Long] = None): DataFrame = {
    val gens = generations(spark, tablePath)
    require(gens.nonEmpty, s"no committed generations at $tablePath")
    val g = gen.getOrElse(gens.max)
    require(gens.contains(g),
      s"generation $g is not committed at $tablePath (have ${gens.mkString(",")})")
    spark.read.parquet(genDir(new Path(tablePath), g).toString)
  }
}
