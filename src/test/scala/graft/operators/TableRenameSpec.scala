package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `ALTER TABLE ... RENAME TO` at the store level
  * ([[FactVersioned.renameTable]] / [[Versioned.renameTable]]): one
  * claim-serialized directory move — everything the table owns rides
  * along, the old path keeps a loud guidance tombstone, and racing
  * committers serialize through the claim protocol. */
class TableRenameSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_trename_").toString

  private def fsOf(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def base(n: Int) =
    (1 to n).map(i => (i.toLong, i % 3, i * 10L)).toDF("k", "p", "v")

  test("fact rename moves the WHOLE tree in one O(1) move: reads, time " +
      "travel, colmap, tombstones and default keys all follow; the old " +
      "path rejects commits with guidance") {
    val root = tmp()
    val a = s"$root/ta"
    val b = s"$root/tb"
    FactVersioned.upsert(spark, a, base(30), Seq("k"), "p", retain = 10)
    // give the table history worth carrying: a column rename (colmap +
    // tombstone) and a second data generation
    FactVersioned.renameColumns(spark, a, Map("v" -> "amount"), retain = 10)
    FactVersioned.upsert(spark, a,
      Seq((3L, 0, 999L)).toDF("k", "p", "amount"), Seq("k"), "p",
      retain = 10)
    val before = FactVersioned.read(spark, a)
      .select(col("k"), col("p"), col("amount"))
      .as[(Long, Int, Long)].collect().toSet
    val gensBefore = FactVersioned.generations(spark, a)

    FactVersioned.renameTable(spark, a, b)

    // identical table under the new path: rows, generations, colmap
    assert(FactVersioned.read(spark, b)
      .select(col("k"), col("p"), col("amount"))
      .as[(Long, Int, Long)].collect().toSet == before)
    assert(FactVersioned.generations(spark, b) == gensBefore)
    assert(FactVersioned.read(spark, b, Some(0L)).columns.contains("v"),
      "time travel must keep the pre-column-rename era")
    // tombstones moved too: re-adding the renamed-away name still fails
    val e = intercept[IllegalArgumentException] {
      FactVersioned.addColumns(spark, b,
        Seq(org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType)), retain = 10)
    }
    assert(e.getMessage.contains("DROPPED"), e.getMessage)
    // recorded default merge keys followed (keyless upsert still works)
    assert(FactVersioned.recordedMergeKeys(spark, b).contains(Seq("k")))
    // the old path keeps ONLY the guidance tombstone
    val fs = fsOf(a)
    assert(fs.listStatus(new Path(a)).map(_.getPath.getName).toSeq ==
      Seq(Versioned.RenamedToMarker))
    assert(Versioned.renamedTo(spark, a).contains(b))
    // commits against the old path fail LOUDLY naming the new one —
    // never a silent fresh-table re-create
    val old = intercept[IllegalArgumentException] {
      FactVersioned.upsert(spark, a,
        Seq((1L, 0, 5L)).toDF("k", "p", "amount"), Seq("k"), "p")
    }
    assert(old.getMessage.contains("RENAMED") && old.getMessage.contains(b),
      old.getMessage)
    // the new table commits normally
    FactVersioned.upsert(spark, b,
      Seq((4L, 1, 444L)).toDF("k", "p", "amount"), Seq("k"), "p",
      retain = 10)
    assert(FactVersioned.read(spark, b).where(col("k") === 4L)
      .select(col("amount")).as[Long].head() == 444L)
    // destination-exists and missing-source rejections
    intercept[IllegalArgumentException] {
      FactVersioned.renameTable(spark, b, b)
    }
    intercept[IllegalArgumentException] {
      FactVersioned.renameTable(spark, s"$root/nope", s"$root/x")
    }
  }

  test("dimension rename: the full-copy store moves the same way") {
    val root = tmp()
    val a = s"$root/da"
    val b = s"$root/db"
    Versioned.commit(base(8), a, retain = 5)
    Versioned.commit(base(8).withColumn("v", col("v") + 1), a, retain = 5)
    val before = Versioned.read(spark, a)
      .as[(Long, Int, Long)].collect().toSet
    Versioned.renameTable(spark, a, b)
    assert(Versioned.read(spark, b)
      .as[(Long, Int, Long)].collect().toSet == before)
    assert(Versioned.generations(spark, b) == Seq(0L, 1L))
    assert(Versioned.renamedTo(spark, a).contains(b))
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(base(2), a)
    }
    assert(e.getMessage.contains("RENAMED"), e.getMessage)
  }

  test("interleaved TABLE RENAME + concurrent upserts: the move is " +
      "atomic, every surviving upsert lands exactly once at the final " +
      "path, old-path writers fail loudly and re-target") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val root = tmp()
    val a = s"$root/ta"
    val b = s"$root/tb"
    FactVersioned.upsert(spark, a, base(30), Seq("k"), "p")
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val landed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def currentPath(): String =
      Versioned.renamedTo(spark, a).getOrElse(a)
    def upsertRetry(key: Long): Unit = {
      var attempts = 0
      var done = false
      while (!done && attempts < 40) {
        attempts += 1
        try {
          FactVersioned.upsert(spark, currentPath(),
            Seq((key, 0, key * 100L)).toDF("k", "p", "v"),
            Seq("k"), "p", retain = 50)
          landed.add(key); done = true
        } catch {
          // the FULL retry contract: transient races surface as the
          // retryable CME, the loud renamed-away guidance (re-target),
          // an AnalysisException from a mid-read move, or Spark's
          // standard FAILED_READ_FILE when the tree moves under an
          // in-flight scan (FileNotFoundException in the cause chain —
          // the same shape any snapshot store shows a reader racing a
          // move/vacuum; re-resolve and retry)
          case _: java.util.ConcurrentModificationException => // retry
          case e: IllegalArgumentException
              if e.getMessage.contains("RENAMED") => // re-target
          case _: org.apache.spark.sql.AnalysisException => // moved mid-read
          case e: org.apache.spark.SparkException
              if Iterator.iterate[Throwable](e)(_.getCause)
                .takeWhile(_ != null).take(10)
                .exists(_.isInstanceOf[java.io.FileNotFoundException]) =>
            // scan raced the move
        }
      }
      assert(done, s"upsert $key starved after $attempts attempts")
    }
    def renameRetry(): Unit = {
      var attempts = 0
      var done = false
      while (!done && attempts < 40) {
        attempts += 1
        try {
          FactVersioned.renameTable(spark, a, b)
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException =>
            Thread.sleep(100) // an in-flight writer — retry
        }
      }
      assert(done, s"rename starved after $attempts attempts")
    }
    try {
      val fa = Future { (101L to 106L).foreach(upsertRetry) }
      val fb = Future { (201L to 206L).foreach(upsertRetry) }
      val fr = Future { Thread.sleep(150); renameRetry() }
      Await.result(Future.sequence(Seq(fa, fb, fr)), 5.minutes)
    } finally pool.shutdown()
    // the rename must have won: the table lives at b, a is a tombstone
    assert(Versioned.renamedTo(spark, a).contains(b))
    assert(FactVersioned.generations(spark, b).nonEmpty)
    // every upsert that reported success is visible at the final path
    val now = FactVersioned.read(spark, b)
      .select(col("k"), col("v")).as[(Long, Long)].collect().toMap
    landed.forEach { k =>
      assert(now.get(k).contains(k * 100L), s"upsert $k lost")
    }
    assert(landed.size == 12, s"only ${landed.size}/12 upserts landed")
  }
}
