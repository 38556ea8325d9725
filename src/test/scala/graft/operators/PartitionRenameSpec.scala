package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ALTER TABLE RENAME COLUMN over PARTITION columns (r14): the on-disk
  * dir tree and manifest `dir` strings keep the PHYSICAL spelling
  * forever — a rename never moves a partition tree — while every
  * user-facing seam (reads, upserts, MERGE scoping, OPTIMIZE WHERE,
  * TRUNCATE, pruning) speaks the new LOGICAL name and translates at
  * the dir-derivation boundary. */
class PartitionRenameSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_prename_").toString

  private def base(n: Int) =
    (1 to n).map(i => (i.toLong, i % 3, i * 10L)).toDF("k", "p", "v")

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("renaming a partition column is metadata-only: dirs keep the " +
      "physical spelling, the head reads the new name, history the " +
      "old, and a post-rename upsert stages into the SAME tree") {
    val path = tmp() + "/t"
    FactVersioned.upsert(spark, path, base(9), Seq("k"), "p", retain = 5)
    FactVersioned.renameColumns(spark, path, Map("p" -> "bucket"),
      retain = 5)
    // metadata-only: nothing staged under vgen=1
    assert(!fs(path).exists(new org.apache.hadoop.fs.Path(
      s"$path/${FactVersioned.DataDir}/${FactVersioned.VGenCol}=1")))
    // head reads the logical name; values intact
    val head = FactVersioned.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "bucket", "v"))
    assert(head.where(col("bucket") === 1).count() == 3)
    // history keeps its own era's name
    assert(FactVersioned.read(spark, path, Some(0L)).columns.contains("p"))
    // the user-facing partition columns are the logical spelling; the
    // physical (dir) spelling is unchanged
    assert(FactVersioned.logicalPartitionColumns(spark, path) ==
      Seq("bucket"))
    assert(FactVersioned.partitionColumns(spark, path) == Seq("p"))
    // a post-rename upsert speaks the NEW name and stages into the
    // SAME physical tree — no `bucket=` dir is ever created
    FactVersioned.upsert(spark, path,
      Seq((3L, 0, 999L), (100L, 1, 1L)).toDF("k", "bucket", "v"),
      Seq("k"), "bucket", retain = 5)
    val staged = fs(path).listStatus(new org.apache.hadoop.fs.Path(
        s"$path/${FactVersioned.DataDir}/${FactVersioned.VGenCol}=2"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(staged == Set("p=0", "p=1"),
      s"post-rename staging must use the physical dir spelling: $staged")
    val got = FactVersioned.read(spark, path)
      .select("k", "bucket", "v").as[(Long, Int, Long)].collect().toSet
    assert(got.contains((3L, 0, 999L)) && got.contains((100L, 1, 1L)))
    assert(got.size == 10)
    // write-amp: the upsert's touched set is the two scoped partitions
    assert(FactVersioned.touchedPartitions(spark, path, 2L).toSet ==
      Set("p=0", "p=1"))
  }

  test("the change feed, append, and TRUNCATE work across a partition " +
      "rename; dropping the renamed partition column is rejected " +
      "under either spelling") {
    val path = tmp() + "/t"
    FactVersioned.upsert(spark, path, base(9), Seq("k"), "p", retain = 10)
    FactVersioned.renameColumns(spark, path, Map("p" -> "bucket"),
      retain = 10)
    FactVersioned.append(spark, path,
      Seq((50L, 2, 500L)).toDF("k", "bucket", "v"), "bucket", retain = 10)
    val w = FactChangeFeed.window(spark, path, Seq("k"), Some(0L), 2L)
    assert(w.columns.contains("bucket"))
    assert(w.select("op", "k").as[(String, Long)].collect().toSet ==
      Set(("insert", 50L)))
    // the new name is guarded as a partition column; the old name is
    // simply gone from the schema (its own loud error)
    val nu = intercept[IllegalArgumentException] {
      FactVersioned.dropColumns(spark, path, Seq("bucket"))
    }
    assert(nu.getMessage.contains("partition column"), nu.getMessage)
    val old = intercept[IllegalArgumentException] {
      FactVersioned.dropColumns(spark, path, Seq("p"))
    }
    assert(old.getMessage.contains("does not exist"), old.getMessage)
  }

  test("interleaved PARTITION-COLUMN rename + concurrent upserts: the " +
      "rename is never lost, surviving upserts land, and the physical " +
      "tree never grows a new-name dir") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val path = tmp() + "/t"
    FactVersioned.upsert(spark, path, base(30), Seq("k"), "p", retain = 50)
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val landed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def upsertRetry(key: Long): Unit = {
      var attempts = 0
      var done = false
      while (!done && attempts < 30) {
        attempts += 1
        try {
          // the retry contract: re-resolve the CURRENT logical
          // partition column (the rename may have landed mid-flight)
          val pcol = FactVersioned.logicalPartitionColumns(spark, path).head
          FactVersioned.upsert(spark, path,
            Seq((key, 0, key * 100L)).toDF("k", pcol, "v"),
            Seq("k"), pcol, retain = 50)
          landed.add(key); done = true
        } catch {
          case _: java.util.ConcurrentModificationException => // retry
          case e: IllegalArgumentException
              if e.getMessage.contains("not compatible") ||
                e.getMessage.contains("partition column") => // stale name
          case _: org.apache.spark.sql.AnalysisException => // renamed mid-read
        }
      }
      assert(done, s"upsert $key starved after $attempts attempts")
    }
    def renameRetry(): Unit = {
      var attempts = 0
      var done = false
      while (!done && attempts < 30) {
        attempts += 1
        try {
          FactVersioned.renameColumns(spark, path, Map("p" -> "bucket"),
            retain = 50)
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException => // retry
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
    // the rename must never be lost to a racing data commit
    assert(FactVersioned.logicalPartitionColumns(spark, path) ==
      Seq("bucket"))
    // the physical tree NEVER grows a new-name dir — every commit of
    // the storm staged under the pinned physical spelling
    val dataRoot = new org.apache.hadoop.fs.Path(
      s"$path/${FactVersioned.DataDir}")
    val vgens = fs(path).listStatus(dataRoot).filter(_.isDirectory)
    vgens.foreach { g =>
      val dirs = fs(path).listStatus(g.getPath)
        .filter(_.isDirectory).map(_.getPath.getName)
      assert(dirs.forall(_.startsWith("p=")),
        s"physical dir spelling violated under ${g.getPath.getName}: " +
          dirs.mkString(","))
    }
    // every upsert that reported success is visible
    val now = FactVersioned.read(spark, path)
      .select(col("k"), col("v")).as[(Long, Long)].collect().toMap
    landed.forEach { k =>
      assert(now.get(k).contains(k * 100L), s"upsert $k lost")
    }
    assert(landed.size == 12, s"only ${landed.size}/12 upserts landed")
  }

  test("reads over a renamed partition column PRUNE at the file " +
      "level: a predicate on the new name scans only the matching " +
      "physical dir's files") {
    val wh = tmp()
    val path = s"$wh/t"
    FactVersioned.upsert(spark, path, base(30), Seq("k"), "p", retain = 5)
    FactVersioned.renameColumns(spark, path, Map("p" -> "bucket"),
      retain = 5)
    val s = spark
    s.conf.set("spark.sql.catalog.g3",
      classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.g3.root", wh)
    val q = s.table("g3.t").where(col("bucket") === 1)
    assert(q.count() == 10L)
    val finalPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val files = finalPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        // Spark 4 groups input partitions: Seq[Seq[InputPartition]]
        b.partitions.flatten.flatMap {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.urlEncodedPath).toSeq
          case _ => Nil
        }
    }.flatten
    assert(files.nonEmpty && files.forall(_.contains("/p=1/")),
      s"the renamed-pcol predicate must prune to the physical p=1 " +
        s"dir's files, got $files")
  }

  test("SQL lifecycle over a renamed partition column: ALTER, scoped " +
      "MERGE write-amp, OPTIMIZE WHERE, TRUNCATE, partitioning report") {
    val wh = tmp()
    val path = s"$wh/t"
    FactVersioned.upsert(spark, path, base(30), Seq("k"), "p", retain = 10)
    val s = graft.catalog.GraftDml.enable(spark)
    s.conf.set("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.g.root", wh)
    s.conf.set("spark.sql.catalog.g.retain", "10")
    try {
      s.sql("ALTER TABLE g.t RENAME COLUMN p TO bucket")
      // the table reports the LOGICAL partitioning
      assert(s.sql("DESCRIBE DETAIL g.t").select("partition_columns")
        .head().getSeq[String](0) == Seq("bucket"))
      // reads prune and filter under the new name
      assert(s.sql("SELECT count(*) FROM g.t WHERE bucket = 1")
        .head().getLong(0) == 10L)
      // MERGE under the new name: write-amp = the one scoped partition
      s.sql("CREATE OR REPLACE TEMPORARY VIEW pr_src AS " +
        "SELECT k, bucket, v * 2 AS v FROM g.t WHERE bucket = 1 AND k % 2 = 0")
      s.sql(
        """MERGE INTO g.t t USING pr_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      val staged = fs(path).listStatus(new org.apache.hadoop.fs.Path(
          s"$path/${FactVersioned.DataDir}/${FactVersioned.VGenCol}=2"))
        .filter(_.isDirectory).map(_.getPath.getName).toSet
      assert(staged == Set("p=1"),
        s"MERGE under the renamed column must stage only the scoped " +
          s"physical dir: $staged")
      assert(s.sql("SELECT v FROM g.t WHERE k = 4").head().getLong(0) ==
        80L)
      // OPTIMIZE WHERE speaks the new name and scopes the right dir
      val opt = s.sql("OPTIMIZE g.t WHERE bucket = 1").collect()
      assert(opt.head.getLong(1) == 1L,
        s"OPTIMIZE WHERE bucket=1 must compact exactly one partition")
      // a predicate on the OLD name fails loudly (not a silent no-op)
      val old = intercept[Exception] {
        s.sql("OPTIMIZE g.t WHERE p = 1").collect()
      }
      assert(old.getMessage.contains("not a partition column"),
        old.getMessage)
      // INSERT routes through appendBy under the logical name and
      // stages into the physical tree
      s.sql("INSERT INTO g.t BY NAME " +
        "SELECT 200L AS k, 2 AS bucket, 5L AS v")
      assert(s.sql("SELECT v FROM g.t WHERE k = 200").head().getLong(0) == 5L)
      assert(!fs(path).exists(new org.apache.hadoop.fs.Path(
          s"$path/${FactVersioned.DataDir}/${FactVersioned.VGenCol}=4/bucket=2")),
        "INSERT must stage under the physical dir spelling")
      // TRUNCATE selects the logical partition columns
      s.sql("TRUNCATE TABLE g.t")
      assert(s.table("g.t").count() == 0)
      assert(s.sql("SELECT count(*) FROM g.t VERSION AS OF 2")
        .head().getLong(0) == 30L)
    } finally s.conf.unset("spark.sql.catalog.g.retain")
  }
}
