package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{FactVersioned, Versioned}

/** SQL maintenance statements (OPTIMIZE / VACUUM / DESCRIBE HISTORY)
  * route through the stores' maintenance APIs; everything else still
  * parses through Spark's own parser unchanged. */
class GraftMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def factTable(): (SparkSession, String, String) = {
    val wh = Files.createTempDirectory("graft_maint_").toString
    val path = s"$wh/t"
    // three commits → three generations, multiple files per partition
    FactVersioned.upsert(spark,
      path, (1 to 60).map(i => (i.toLong, i % 3, i * 10L)).toDF("k", "p", "v"),
      Seq("k"), "p")
    FactVersioned.upsert(spark,
      path, (1 to 20).map(i => (i.toLong, i % 3, i * 11L)).toDF("k", "p", "v"),
      Seq("k"), "p")
    FactVersioned.upsert(spark,
      path, (61 to 80).map(i => (i.toLong, i % 3, i * 10L)).toDF("k", "p", "v"),
      Seq("k"), "p")
    val s = GraftDml.enable(spark)
    s.conf.set("spark.sql.catalog.g", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.g.root", wh)
    (s, wh, path)
  }

  test("OPTIMIZE commits one content-identical generation; ZORDER BY " +
      "records stats; time travel to the pre-compaction head holds") {
    val (s, _, path) = factTable()
    val before = FactVersioned.read(s, path)
      .select("k", "p", "v").as[(Long, Int, Long)].collect().toSet
    val out = s.sql("OPTIMIZE g.t ZORDER BY (k, v)").collect()
    assert(out.length == 1 && out.head.getLong(0) == 3L &&
      out.head.getLong(1) == 3L, out.mkString)
    // conf-or-preserve retention: depth was 3, so the commit keeps the
    // newest 3 (the INSERT posture — never silently widen either)
    assert(FactVersioned.generations(s, path) == Seq(1L, 2L, 3L))
    val after = FactVersioned.read(s, path)
      .select("k", "p", "v").as[(Long, Int, Long)].collect().toSet
    assert(after == before, "OPTIMIZE must preserve content exactly")
    // pre-compaction generation still readable and identical
    val prev = FactVersioned.read(s, path, Some(2L))
      .select("k", "p", "v").as[(Long, Int, Long)].collect().toSet
    assert(prev == before)
  }

  test("VACUUM RETAIN n expires exactly the generations beyond the " +
      "window and GCs their unshared vgen subtrees") {
    val (s, _, path) = factTable()
    val out = s.sql("VACUUM g.t RETAIN 1 GENERATIONS").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(FactVersioned.generations(s, path) == Seq(2L))
    // the expired generations' metadata is gone; head still reads
    assert(FactVersioned.read(s, path).count() == 80)
    intercept[Exception] { FactVersioned.read(s, path, Some(0L)).count() }
    // a VACUUM with nothing to expire returns no rows
    assert(s.sql("VACUUM g.t RETAIN 3 GENERATIONS").collect().isEmpty)
  }

  test("DESCRIBE HISTORY lists the commit log newest-first with " +
      "touched partitions matching the store's own record") {
    val (s, _, path) = factTable()
    val h = s.sql("DESCRIBE HISTORY g.t").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L))
    val touched1 = h.find(_.getLong(0) == 1L).get.getSeq[String](2)
    assert(touched1.toSet ==
      FactVersioned.touchedPartitions(s, path, 1L).toSet)
    assert(touched1.toSet == Set("p=0", "p=1", "p=2"))
    // timestamps ascend with generation
    val ts = h.map(_.getTimestamp(1).getTime).toSeq
    assert(ts == ts.sorted.reverse)
  }

  test("dimension tables: OPTIMIZE commits a content-identical " +
      "full-copy generation, VACUUM expires, HISTORY lists") {
    val wh = Files.createTempDirectory("graft_maint_dim_").toString
    val path = s"$wh/d"
    Versioned.commit((1 to 50).map(i => (i.toLong, s"n$i")).toDF("k", "name")
      .repartition(8), path)
    Versioned.commit((1 to 50).map(i => (i.toLong, s"m$i")).toDF("k", "name")
      .repartition(8), path)
    val s = GraftDml.enable(spark)
    s.conf.set("spark.sql.catalog.g", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.g.root", wh)
    val before = Versioned.read(s, path)
      .as[(Long, String)].collect().toSet
    s.sql("OPTIMIZE g.d")
    assert(Versioned.generations(s, path) == Seq(0L, 1L, 2L))
    assert(Versioned.read(s, path).as[(Long, String)].collect().toSet
      == before)
    assert(s.sql("DESCRIBE HISTORY g.d").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L))
    assert(s.sql("VACUUM g.d RETAIN 1 GENERATIONS").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(Versioned.generations(s, path) == Seq(2L))
  }

  test("OPTIMIZE WHERE scopes the compaction to matching partitions " +
      "only; non-partition predicates fail with guidance") {
    val (s, _, path) = factTable()
    val preFiles = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs
    }
    val out = s.sql("OPTIMIZE g.t WHERE p = 1").collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L,
      s"must compact exactly the one matching partition, got " +
        s"${out.mkString}")
    // the compaction generation staged ONLY p=1
    val vd = new org.apache.hadoop.fs.Path(
      s"$path/${FactVersioned.DataDir}/vgen=${out.head.getLong(0)}")
    val staged = preFiles.listStatus(vd).filter(_.isDirectory)
      .map(_.getPath.getName).toSet
    assert(staged == Set("p=1"), s"staged $staged")
    // content preserved
    assert(FactVersioned.read(s, path).count() == 80)
    // out-of-scope restriction: no partitions match → no commit
    val gens = FactVersioned.generations(s, path)
    assert(s.sql("OPTIMIZE g.t WHERE p = 99").collect().isEmpty)
    assert(FactVersioned.generations(s, path) == gens)
    // non-partition predicate fails loudly
    val e = intercept[Exception] { s.sql("OPTIMIZE g.t WHERE k = 3") }
    assert(e.getMessage.contains("not a partition column"), e.getMessage)
    // WHERE composes with ZORDER BY
    s.sql("OPTIMIZE g.t WHERE p = 0 ZORDER BY (k, v)")
    assert(FactVersioned.read(s, path).count() == 80)
  }

  test("non-maintenance SQL still parses through Spark's parser; " +
      "maintenance over a non-graft catalog fails with guidance") {
    val (s, _, _) = factTable()
    assert(s.sql("SELECT 1 AS one").collect().head.getInt(0) == 1)
    assert(s.sql("SELECT k FROM g.t WHERE k <= 2").count() == 2)
    val e = intercept[Exception] { s.sql("OPTIMIZE spark_catalog.x") }
    assert(e.getMessage.contains("not a GraftCatalog"))
    val e2 = intercept[Exception] { s.sql("VACUUM g.nosuch") }
    assert(e2.getMessage.toLowerCase.contains("nosuch"))
  }
}
