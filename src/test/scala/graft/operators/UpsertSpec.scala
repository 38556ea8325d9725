package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** K1-K4 upsert semantics (ref: src/db/load.py:71-191) — insert path,
  * update path, composite keys, Postgres NULL-distinctness, last-write-
  * wins within a batch, idempotence. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    ("u1", "a@x.com", 1), ("u2", "b@x.com", 2), ("u3", "c@x.com", 3))
    .toDF("id", "email", "v")

  test("insert-new and update-existing in one batch") {
    val updates = Seq(("u2", "b2@x.com", 20), ("u9", "new@x.com", 9))
      .toDF("id", "email", "v")
    val out = Upsert.upsert(target, updates, Seq("id"))
      .as[(String, String, Int)].collect().sortBy(_._1)
    assert(out === Array(
      ("u1", "a@x.com", 1), ("u2", "b2@x.com", 20),
      ("u3", "c@x.com", 3), ("u9", "new@x.com", 9)))
  }

  test("last-write-wins among conflicting rows in one batch") {
    val updates = Seq(("u2", "first@x", 1), ("u2", "last@x", 2))
      .toDF("id", "email", "v")
    val out = Upsert.upsert(target, updates, Seq("id"),
      orderBy = Some(col("v")))
    val u2 = out.where($"id" === "u2").as[(String, String, Int)].collect()
    assert(u2 === Array(("u2", "last@x", 2)))
  }

  test("composite key upsert") {
    val t = Seq(("m1", "u1", 10), ("m1", "u2", 20)).toDF("muuid", "uid", "d")
    val u = Seq(("m1", "u2", 99), ("m2", "u1", 5)).toDF("muuid", "uid", "d")
    val out = Upsert.upsert(t, u, Seq("muuid", "uid"))
      .as[(String, String, Int)].collect().sortBy(r => (r._1, r._2))
    assert(out === Array(("m1", "u1", 10), ("m1", "u2", 99), ("m2", "u1", 5)))
  }

  test("NULL keys never conflict (Postgres distinct-NULL semantics, K3)") {
    // two guests (null uid) in one meeting must BOTH survive, and a
    // null-key update must not collapse an existing null-key row
    val t = Seq(("m1", null, 1), ("m1", "u1", 2))
      .toDF("muuid", "uid", "d")
    val u = Seq(("m1", null, 3), ("m1", null, 4)).toDF("muuid", "uid", "d")
    val out = Upsert.upsert(t, u, Seq("muuid", "uid"))
    assert(out.count() === 4) // u1 row + original null + two new nulls
    assert(out.where($"uid".isNull).count() === 3)
  }

  test("idempotence: upsert(upsert(t,b),b) == upsert(t,b)") {
    val b = Seq(("u2", "x@x", 7), ("u7", "y@y", 8)).toDF("id", "email", "v")
    val once = Upsert.upsert(target, b, Seq("id"), orderBy = Some(col("v")))
    val twice = Upsert.upsert(once, b, Seq("id"), orderBy = Some(col("v")))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("dedupNullKeyed makes guest replay idempotent, keeps distinct guests") {
    // replaying the same batch must not re-append the null-keyed guest,
    // but a guest differing in any column is a genuine new row
    val t = Seq(("m1", null, 1), ("m1", "u1", 2)).toDF("muuid", "uid", "d")
    val b = Seq(("m1", null, 1), ("m1", null, 9)).toDF("muuid", "uid", "d")
    val once = Upsert.upsert(t, b, Seq("muuid", "uid"), dedupNullKeyed = true)
    // (m1,null,1) already in target → skipped; (m1,null,9) new → inserted
    assert(once.count() === 3)
    val twice = Upsert.upsert(once, b, Seq("muuid", "uid"),
      dedupNullKeyed = true)
    assert(twice.count() === 3)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("recovery write from a __prev-only state commits before cleanup") {
    // after a mid-swap crash only __prev exists; the next write must
    // land the new primary FIRST and delete __prev after — deleting
    // first would open a window with NO generation on disk
    val dir = java.nio.file.Files.createTempDirectory("graft_rec").toString
    val path = s"$dir/tbl"
    Upsert.writeSnapshot(Seq(("old", 1)).toDF("k", "v"), path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__prev"))
    // recovery-cycle write (reads would have come from __prev)
    Upsert.writeSnapshot(Seq(("new", 2)).toDF("k", "v"), path)
    assert(spark.read.parquet(path).as[(String, Int)].collect()
      === Array(("new", 2)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__prev")))
  }

  test("readSnapshot falls back to __prev in the mid-swap crash window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val path = s"$dir/tbl"
    Upsert.writeSnapshot(Seq(("a", 1)).toDF("k", "v"), path)
    Upsert.writeSnapshot(Seq(("b", 2)).toDF("k", "v"), path) // creates __prev
    // simulate a crash between rename(dst, __prev) and rename(tmp, dst):
    // the primary is gone and the last committed generation sits in __prev
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path + "__prev"), true)
    fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__prev"))
    assert(Upsert.snapshotExists(spark, path))
    val recovered = Upsert.readSnapshot(spark, path).get
      .as[(String, Int)].collect()
    assert(recovered === Array(("b", 2))) // old snapshot, not empty
    assert(Upsert.readSnapshot(spark, s"$dir/never_written").isEmpty)
  }

  test("upsertEvolve adds new columns, nulls old rows, rejects type drift") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val updates = Seq((2L, "B", 25.0, "X"), (3L, "c", 30.0, "Y"))
      .toDF("k", "s", "v", "flag")
    val out = Upsert.upsertEvolve(target, updates, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "s", "v", "flag"))
    val byKey = out.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getDouble(2), Option(r.getString(3)))).toMap
    assert(byKey(1L) == (("a", 10.0, None)), "old row gets NULL new col")
    assert(byKey(2L) == (("B", 25.0, Some("X"))))
    assert(byKey(3L) == (("c", 30.0, Some("Y"))))
    // a column the updates DROP survives as null on updated rows
    val narrow = Seq((2L, 99.0)).toDF("k", "v")
    val out2 = Upsert.upsertEvolve(target, narrow, Seq("k"))
    val r2 = out2.where(col("k") === 2).head()
    assert(r2.isNullAt(out2.columns.indexOf("s")) &&
      r2.getDouble(out2.columns.indexOf("v")) == 99.0)
    // shared-column type drift fails loudly
    val drift = Seq((2L, 5, 25.0)).toDF("k", "s", "v") // s: int, was string
    val e = intercept[IllegalArgumentException] {
      Upsert.upsertEvolve(target, drift, Seq("k"))
    }
    assert(e.getMessage.contains("changes type"))
  }

  test("partitionDirName renders TIMESTAMP values byte-identical to " +
      "Spark's own partitioned-write layout (fractions included)") {
    val vals = Seq(
      java.sql.Timestamp.valueOf("2024-01-03 07:30:00"),
      java.sql.Timestamp.valueOf("2024-01-03 07:30:00.123456"),
      java.sql.Timestamp.valueOf("2024-01-03 07:30:00.5"))
    val out = java.nio.file.Files
      .createTempDirectory("graft_tsdir_").toString + "/t"
    vals.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("k", "ts").write.partitionBy("ts").parquet(out)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val written = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("ts=")).toSet
    val derived = vals.map(Upsert.partitionDirName("ts", _)).toSet
    assert(derived == written,
      s"derived $derived must equal Spark's layout $written")
    // the java.time.Instant form (datetime.java8API sessions) agrees
    assert(Upsert.partitionDirName("ts", vals.head.toInstant) ==
      Upsert.partitionDirName("ts", vals.head))
    // TIMESTAMP_NTZ (LocalDateTime) renders the wall clock verbatim
    assert(Upsert.partitionDirName("ts",
        java.time.LocalDateTime.parse("2024-01-03T07:30:00"))
      .contains("2024-01-03 07%3A30%3A00"))
  }
}
