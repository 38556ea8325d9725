package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-scoped snapshot upsert/promote (the at-scale write path):
  * MERGE semantics must equal the flat [[Upsert.upsert]], while on disk
  * only the touched partition directories change — untouched partitions
  * stay byte-identical (same files, same lengths, same mtimes). */
class PartitionedUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_pupsert_").toString

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def seed = Seq(
    (1L, d("2024-01-01"), "a", 10),
    (2L, d("2024-01-01"), "b", 20),
    (3L, d("2024-01-02"), "c", 30),
    (4L, d("2024-01-03"), "d", 40))
    .toDF("id", "p_date", "name", "v")

  /** (relative file path, length, mtime) of every data file under a
    * partition dir — the byte-identity witness. */
  private def fileState(root: String, dir: String): Seq[(String, Long, Long)] = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(root, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isFile)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1)
  }

  private def writeSeed(path: String, df: DataFrame = seed): Unit = {
    val touched = df.select("p_date").distinct().collect().map(_.get(0)).toSeq
    Upsert.writeSnapshotsPartitioned(Seq(
      Upsert.PartitionedWrite(df, path, "p_date", touched)))
    ()
  }

  test("upsertPartitioned matches flat upsert semantics") {
    val path = tmpDir() + "/t"
    writeSeed(path)
    val updates = Seq(
      (2L, d("2024-01-01"), "b2", 200), // update in touched partition
      (9L, d("2024-01-02"), "i", 90))   // insert into another partition
      .toDF("id", "p_date", "name", "v")
    Upsert.upsertPartitioned(spark, path, updates, Seq("id"), "p_date")
    val got = Upsert.readPartitionedSnapshot(spark, path, seed.schema).get
    val want = Upsert.upsert(seed, updates, Seq("id"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("untouched partition dirs are byte-identical after an upsert") {
    val path = tmpDir() + "/t"
    writeSeed(path)
    val before02 = fileState(path, "p_date=2024-01-02")
    val before03 = fileState(path, "p_date=2024-01-03")
    assert(before02.nonEmpty && before03.nonEmpty)
    Thread.sleep(5) // make an accidental rewrite visible in mtimes
    val updates = Seq((1L, d("2024-01-01"), "a2", 11))
      .toDF("id", "p_date", "name", "v")
    val commit =
      Upsert.upsertPartitioned(spark, path, updates, Seq("id"), "p_date")
    assert(commit.rewritten === Seq("p_date=2024-01-01"))
    assert(commit.deleted.isEmpty)
    assert(fileState(path, "p_date=2024-01-02") === before02)
    assert(fileState(path, "p_date=2024-01-03") === before03)
    // and the touched partition DID change
    val got = Upsert.readPartitionedSnapshot(spark, path, seed.schema).get
    assert(got.where($"id" === 1L).select("name").as[String].head() === "a2")
    assert(got.count() === 4)
  }

  test("partition-pruned scan: untouched partitions are not read") {
    val path = tmpDir() + "/t"
    writeSeed(path)
    val updates = Seq((1L, d("2024-01-01"), "a2", 11))
      .toDF("id", "p_date", "name", "v")
    val pruned = Upsert.readPartitionedSnapshot(spark, path, seed.schema).get
      .where(Upsert.touchedFilter("p_date", Seq(d("2024-01-01"))))
    // static partition pruning must reach the file index: of the three
    // partition dirs only the touched one's file is scanned (executed
    // numFiles metric — inputFiles reports the pre-pruning relation)
    assert(pruned.collect().length === 2) // ids 1,2 live there
    assert(updates.count() === 1)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .find(_.metrics.contains("numFiles")).get
    assert(scan.metrics("numFiles").value === 1)
  }

  test("emptied partitions are deleted; others untouched") {
    val path = tmpDir() + "/t"
    writeSeed(path)
    val before03 = fileState(path, "p_date=2024-01-03")
    // rewrite 01-01 (keep one row) and empty 01-02 entirely
    val replacement = Seq((1L, d("2024-01-01"), "only", 1))
      .toDF("id", "p_date", "name", "v")
    val commits = Upsert.writeSnapshotsPartitioned(Seq(
      Upsert.PartitionedWrite(replacement, path, "p_date",
        Seq(d("2024-01-01"), d("2024-01-02")))))
    assert(commits.head.rewritten === Seq("p_date=2024-01-01"))
    assert(commits.head.deleted === Seq("p_date=2024-01-02"))
    assert(fileState(path, "p_date=2024-01-02").isEmpty)
    assert(fileState(path, "p_date=2024-01-03") === before03)
    val got = Upsert.readPartitionedSnapshot(spark, path, seed.schema).get
    assert(got.select("id").as[Long].collect().sorted === Array(1L, 4L))
  }

  test("string (escaped), int and null partition values round-trip") {
    val path = tmpDir() + "/t"
    val df = Seq(
      (1L, "plain", 1), (2L, "with space:colon", 2), (3L, null, 3))
      .toDF("id", "p", "v")
    val touched = df.select("p").distinct().collect().map(_.get(0)).toSeq
    Upsert.writeSnapshotsPartitioned(Seq(
      Upsert.PartitionedWrite(df, path, "p", touched)))
    val got = Upsert.readPartitionedSnapshot(spark, path, df.schema).get
    assert(got.exceptAll(df).isEmpty && df.exceptAll(got).isEmpty)
    // dir-name derivation matches what Spark's writer actually produced:
    // rewriting the escaped-string partition must swap in place, not
    // duplicate it under a differently-escaped name
    val up = Seq((2L, "with space:colon", 22)).toDF("id", "p", "v")
    val commit = Upsert.upsertPartitioned(spark, path, up, Seq("id"), "p")
    assert(commit.rewritten.size === 1 && commit.deleted.isEmpty)
    val after = Upsert.readPartitionedSnapshot(spark, path, df.schema).get
    assert(after.count() === 3)
    assert(after.where($"id" === 2L).select("v").as[Int].head() === 22)
    // null partition upsert lands in the Hive default partition
    val upNull = Seq((3L, null.asInstanceOf[String], 33)).toDF("id", "p", "v")
    Upsert.upsertPartitioned(spark, path, upNull, Seq("id"), "p")
    val after2 = Upsert.readPartitionedSnapshot(spark, path, df.schema).get
    assert(after2.where($"p".isNull).select("v").as[Int].head() === 33)
    assert(after2.count() === 3)
  }

  test("mid-swap crash: _prev without a primary is restored on read") {
    val path = tmpDir() + "/t"
    writeSeed(path)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: primary renamed away, replacement not
    // yet in place
    assert(fs.rename(new Path(path, "p_date=2024-01-02"),
      new Path(path, "_prev.p_date=2024-01-02")))
    val got = Upsert.readPartitionedSnapshot(spark, path, seed.schema).get
    assert(got.count() === 4) // repaired: old generation restored
    assert(got.where($"p_date" === d("2024-01-02")).count() === 1)
    assert(!fs.exists(new Path(path, "_prev.p_date=2024-01-02")))
  }

  test("completed-swap leftovers (_prev with primary, _del) are cleaned") {
    val path = tmpDir() + "/t"
    writeSeed(path)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(path, "_prev.p_date=2024-01-01"))
    fs.mkdirs(new Path(path, "_del.p_date=2024-01-03"))
    val got = Upsert.readPartitionedSnapshot(spark, path, seed.schema).get
    assert(got.count() === 4) // hidden dirs never double-read
    assert(!fs.exists(new Path(path, "_prev.p_date=2024-01-01")))
    assert(!fs.exists(new Path(path, "_del.p_date=2024-01-03")))
    assert(fs.exists(new Path(path, "p_date=2024-01-01")))
  }

  test("promotePartitioned: only promoted partitions rewritten, " +
      "semantics match flat promote within touched partitions") {
    val root = tmpDir()
    val stagingPath = s"$root/staging"
    val mainPath = s"$root/main"
    // staging: children across 3 date partitions; parents exist only
    // for ids 1 and 2 (both in 2024-01-01) — 01-02/01-03 stay parked
    val staging = Seq(
      (1L, d("2024-01-01"), 100L, "x"),
      (2L, d("2024-01-01"), 200L, "y"),
      (3L, d("2024-01-02"), 999L, "z"),
      (4L, d("2024-01-03"), 888L, "w"))
      .toDF("id", "p_date", "fk", "payload")
    writeSeed(stagingPath, staging)
    val before02 = fileState(stagingPath, "p_date=2024-01-02")
    val parent = Seq(100L, 200L).toDF("pk")
    val res = Merge.promotePartitioned(spark, stagingPath, parent,
      "fk", "pk", mainPath, Seq("id"), "p_date", staging.schema).get
    assert(res.main.rewritten === Seq("p_date=2024-01-01"))
    // staging's 01-01 partition emptied (both rows promoted)
    assert(res.staging.deleted === Seq("p_date=2024-01-01"))
    assert(fileState(stagingPath, "p_date=2024-01-02") === before02)
    val main = Upsert.readPartitionedSnapshot(
      spark, mainPath, staging.schema).get
    assert(main.select("id").as[Long].collect().sorted === Array(1L, 2L))
    val parked = Upsert.readPartitionedSnapshot(
      spark, stagingPath, staging.schema).get
    assert(parked.select("id").as[Long].collect().sorted === Array(3L, 4L))
    // nothing gated ⇒ no write at all
    assert(Merge.promotePartitioned(spark, stagingPath,
      Seq(777L).toDF("pk"), "fk", "pk", mainPath, Seq("id"), "p_date",
      staging.schema).isEmpty)
  }

  test("vanished staging aborts the swap — live partitions are never " +
      "interpreted as deletes") {
    val path = tmpDir() + "/t"
    writeSeed(path)
    val before = Upsert.readPartitionedSnapshot(spark, path, seed.schema)
      .get.collect().toSet
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val parent = new Path(path).getParent
    val baseName = new Path(path).getName
    val updates = Seq((1L, d("2024-01-01"), "a2", 11))
      .toDF("id", "p_date", "name", "v")
    // simulate a concurrent repair reclaiming the staging dir while
    // phase 1 outlived the staleness TTL: delete __ptmp_* under the
    // swap lock, right before the swap would run
    intercept[java.util.ConcurrentModificationException] {
      Upsert.writeSnapshotsPartitioned(
        Seq(Upsert.PartitionedWrite(updates, path, "p_date",
          Seq(d("2024-01-01")))),
        preSwapCheck = () =>
          fs.listStatus(parent).map(_.getPath)
            .filter(_.getName.startsWith(baseName + "__ptmp_"))
            .foreach(fs.delete(_, true)))
    }
    val after = Upsert.readPartitionedSnapshot(spark, path, seed.schema)
      .get.collect().toSet
    assert(after == before,
      "aborted swap must leave every live partition untouched")
  }

  test("touched-partition guard fails loudly on a mis-chosen column") {
    val path = tmpDir() + "/t"
    val updates = (1 to 50).map(i => (i.toLong, i, "x"))
      .toDF("id", "p", "name")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsertPartitioned(spark, path, updates, Seq("id"), "p",
        maxTouchedPartitions = 10)
    }
    assert(e.getMessage.contains("partitions"))
  }
}
