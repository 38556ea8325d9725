package graft.catalog

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FactVersioned

/** Transform partitioning (r17 — VERDICT r16 Next #3): `PARTITIONED BY
  * (days(ts))` / `bucket(n, col)` materialize a generated partition
  * column at write (commit-assigned — input values ignored) and
  * [[GraftTransformPruneRule]] maps source-column predicates to
  * partition pruning at read: the Iceberg hidden-partitioning contract
  * over the versioned store. */
class TransformPartitionSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_tp_").toString

  private def causeMessages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
      .flatMap(x => Option(x.getMessage)).toSeq

  test("days(ts): CTAS + INSERT derive ts_day (supplied values are " +
      "ignored); a WHERE ts range reads ONLY the matching day dirs; " +
      "results match the unpruned filter") {
    val wh = tmp()
    val s = GraftDml.enable(spark)
    s.conf.set("spark.sql.catalog.gtp", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gtp.root", wh)
    val path = s"$wh/ev"
    s.sql(
      """CREATE TABLE gtp.ev PARTITIONED BY (days(ts)) AS
        |SELECT id, CAST(v AS BIGINT) AS v,
        |  timestamp'2026-03-01 00:30:00' + make_interval(0,0,0,0,
        |    CAST(id % 96 AS INT), 0, 0) AS ts
        |FROM (SELECT explode(sequence(0, 499)) AS id),
        |     (SELECT 7 AS v)""".stripMargin)
    // dirs are readable day strings under the generated column
    val fs = new Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new Path(
        s"$path/${FactVersioned.DataDir}/${FactVersioned.VGenCol}=0"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("ts_day=2026-03-01", "ts_day=2026-03-02",
      "ts_day=2026-03-03", "ts_day=2026-03-04"),
      s"got $dirs")
    // INSERT derives ts_day; an explicitly-supplied WRONG value is
    // ignored (commit-assigned, the vgen posture)
    s.sql(
      """INSERT INTO gtp.ev BY NAME
        |SELECT 9999L AS id, 1L AS v,
        |  timestamp'2026-03-09 12:00:00' AS ts,
        |  '1999-01-01' AS ts_day,
        |  CAST(NULL AS BIGINT) AS vgen""".stripMargin)
    assert(s.sql("SELECT ts_day FROM gtp.ev WHERE id = 9999")
      .head.getString(0) == "2026-03-09",
      "the generated column must be derived, not taken from input")
    // hidden pruning: a ts range filter reads only matching day dirs
    val q = s.sql(
      """SELECT id FROM gtp.ev
        |WHERE ts >= timestamp'2026-03-02 00:00:00'
        |  AND ts < timestamp'2026-03-03 00:00:00'""".stripMargin)
    val readDirs = q.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
      .flatMap(f => "ts_day=[0-9-]+".r.findFirstIn(f)).toSet
    assert(readDirs == Set("ts_day=2026-03-02"),
      s"the scan must prune to the matching day, read: $readDirs")
    // and the pruned result equals the full-scan filter
    val expected = s.sql("SELECT id FROM gtp.ev").where(
      col("ts_day") === "2026-03-02").count()
    assert(q.count() > 0 && q.count() ==
      s.sql("SELECT count(*) FROM gtp.ev " +
        "WHERE ts >= timestamp'2026-03-02 00:00:00' " +
        "AND ts < timestamp'2026-03-03 00:00:00'").head.getLong(0))
    assert(expected == q.count())
  }

  test("bucket(8, id): equality and IN predicates prune to the " +
      "matching bucket dirs") {
    val wh = tmp()
    val s = GraftDml.enable(spark)
    s.conf.set("spark.sql.catalog.gtpb", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gtpb.root", wh)
    val path = s"$wh/kv"
    s.sql(
      """CREATE TABLE gtpb.kv PARTITIONED BY (bucket(8, id)) AS
        |SELECT CAST(x AS BIGINT) AS id
        |FROM (SELECT explode(sequence(1, 400)) AS x)""".stripMargin)
    val q = s.sql("SELECT id FROM gtpb.kv WHERE id = 37")
    val readDirs = q.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
      .flatMap(f => "id_bucket=[0-9]+".r.findFirstIn(f)).toSet
    assert(readDirs.size == 1,
      s"equality must prune to one bucket, read: $readDirs")
    assert(q.count() == 1)
    val qin = s.sql("SELECT id FROM gtpb.kv WHERE id IN (37, 41, 53)")
    val inDirs = qin.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
      .flatMap(f => "id_bucket=[0-9]+".r.findFirstIn(f)).toSet
    assert(inDirs.size <= 3 && qin.count() == 3,
      s"IN must prune to at most its buckets, read: $inDirs")
  }

  test("MERGE derives the generated column for insert-routed rows; " +
      "day-crossing updates and UPDATE of the source column are " +
      "rejected loudly") {
    val wh = tmp()
    val s = GraftDml.enable(spark)
    s.conf.set("spark.sql.catalog.gtpm", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gtpm.root", wh)
    val path = s"$wh/ev"
    s.sql(
      """CREATE TABLE gtpm.ev PARTITIONED BY (days(ts)) AS
        |SELECT CAST(x AS BIGINT) AS id,
        |  timestamp'2026-05-01 08:00:00' AS ts, 1L AS v
        |FROM (SELECT explode(sequence(1, 10)) AS x)""".stripMargin)
    // insert-routed rows: ts_day derived from the clause's ts
    s.sql(
      """MERGE INTO gtpm.ev t
        |USING (SELECT 99L AS id, timestamp'2026-05-03 09:00:00' AS ts,
        |       5L AS v) src
        |ON t.id = src.id
        |WHEN NOT MATCHED THEN INSERT (id, ts, v, ts_day, vgen)
        |  VALUES (src.id, src.ts, src.v, NULL, NULL)""".stripMargin)
    assert(s.sql("SELECT ts_day FROM gtpm.ev WHERE id = 99")
      .head.getString(0) == "2026-05-03")
    // same-day update: fine (v changes, ts untouched)
    s.sql(
      """MERGE INTO gtpm.ev t
        |USING (SELECT 1L AS id, 42L AS v) src ON t.id = src.id
        |WHEN MATCHED THEN UPDATE SET v = src.v""".stripMargin)
    assert(s.sql("SELECT v FROM gtpm.ev WHERE id = 1").head.getLong(0)
      == 42L)
    // day-crossing update: rejected after re-derivation
    val e = intercept[Throwable] {
      s.sql(
        """MERGE INTO gtpm.ev t
          |USING (SELECT 2L AS id,
          |       timestamp'2026-07-07 07:00:00' AS nts) src
          |ON t.id = src.id
          |WHEN MATCHED THEN UPDATE SET ts = src.nts""".stripMargin)
    }
    assert(causeMessages(e).exists(_.contains("partition-moving")),
      s"got: ${causeMessages(e)}")
    // UPDATE of the source column: rejected at resolution
    val u = intercept[Throwable] {
      s.sql("UPDATE gtpm.ev SET ts = timestamp'2027-01-01 00:00:00' " +
        "WHERE id = 3")
    }
    assert(causeMessages(u).exists(_.contains("partition transform")),
      s"got: ${causeMessages(u)}")
  }
}
