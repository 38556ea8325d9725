package graft.catalog

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkSpec
import graft.operators.FactVersioned

/** Scale posture of the SQL DML plans (VERDICT r11 Next #1): the MERGE
  * probe must be SIZE-ADAPTIVE — no unconditional broadcast of
  * source-derived frames. With the probe's size cap at 0 and AQE/plan
  * broadcasts disabled (the stand-in for "source above threshold": a
  * production CDC batch of 500M keys exceeds any broadcast ceiling),
  * every plan the MERGE executes must be broadcast-free AND the result
  * must stay hash-equal to the API twin; at default settings the small
  * probe is hinted broadcast under the size-estimate cap (the fast
  * small-batch path). */
class MergePostureSpec extends SparkSpec {
  import spark.implicits._

  private def capturePlans(s: SparkSession)(body: => Unit): Seq[String] = {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(
          funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        seen.add(qe.executedPlan.toString)
      override def onFailure(
          funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      body
      // the execution-listener bus is async: poll until quiescent
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val n = seen.size
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      seen.asScala.toSeq
    } finally s.listenerManager.unregister(listener)
  }

  private def rows(df: DataFrame): Set[(Long, Int, Long)] =
    df.select(col("k"), col("p"), col("v"))
      .as[(Long, Int, Long)].collect().toSet

  test("MERGE executes broadcast-free when broadcasts are off (the " +
      "large-CDC-source posture) and stays hash-equal to the API twin") {
    val wh = Files.createTempDirectory("graft_posture_").toString
    val path = s"$wh/t"
    val base = (1 to 3000).map(i => (i.toLong, i % 5, i * 10L))
      .toDF("k", "p", "v")
    FactVersioned.upsert(spark, path, base, Seq("k"), "p")
    val s = GraftDml.enable(spark)
    s.conf.set("spark.sql.catalog.g", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.g.root", wh)
    s.conf.set(GraftDml.ProbeBroadcastConf, "0") // source "above threshold"
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      s.range(0, 900)
        .selectExpr("id * 3 AS k", "CAST(id * 3 % 5 AS INT) AS p",
          "id + 100000 AS v")
        .createOrReplaceTempView("posture_src")
      val plans = capturePlans(s) {
        s.sql(
          """MERGE INTO g.t t USING posture_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      assert(plans.nonEmpty, "listener captured no executed plans")
      val offenders = plans.filter(_.contains("BroadcastExchange"))
      assert(offenders.isEmpty,
        s"MERGE must not force broadcasts above threshold; got:\n" +
          offenders.headOption.getOrElse(""))
      // hash-equal to the API twin (upsert covers this update+insert mix)
      val twin = s"$wh/twin"
      FactVersioned.upsert(spark, twin, base, Seq("k"), "p")
      FactVersioned.upsert(spark, twin,
        spark.range(0, 900).selectExpr("id * 3 AS k",
          "CAST(id * 3 % 5 AS INT) AS p", "id + 100000 AS v"),
        Seq("k"), "p")
      assert(rows(FactVersioned.read(s, path)) ==
        rows(FactVersioned.read(spark, twin)))
    } finally {
      s.conf.unset(GraftDml.ProbeBroadcastConf)
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    // at default settings the small probe IS broadcast — the hint
    // applies because the size estimate sits under the cap
    s.range(0, 20).selectExpr("id * 3 AS k", "CAST(id * 3 % 5 AS INT) AS p",
        "id AS v")
      .createOrReplaceTempView("posture_small")
    val plans2 = capturePlans(s) {
      s.sql(
        """MERGE INTO g.t t USING posture_small s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(plans2.exists(_.contains("BroadcastExchange")),
      "AQE should broadcast a tiny probe at default thresholds")
  }

  test("a key-MAPPED merge (differently-named ON sides) keeps the " +
      "broadcast-free posture above threshold") {
    val wh = Files.createTempDirectory("graft_posture_km_").toString
    val path = s"$wh/t"
    val base = (1 to 3000).map(i => (i.toLong, i % 5, i * 10L))
      .toDF("k", "p", "v")
    FactVersioned.upsert(spark, path, base, Seq("k"), "p")
    val s = GraftDml.enable(spark)
    s.conf.set("spark.sql.catalog.g", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.g.root", wh)
    s.conf.set(GraftDml.ProbeBroadcastConf, "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      s.range(0, 900)
        .selectExpr("id * 3 AS src_key", "CAST(id * 3 % 5 AS INT) AS sp",
          "id + 100000 AS nv")
        .createOrReplaceTempView("posture_km")
      val plans = capturePlans(s) {
        s.sql(
          """MERGE INTO g.t t USING posture_km s ON t.k = s.src_key
            |WHEN MATCHED THEN UPDATE SET v = s.nv
            |WHEN NOT MATCHED THEN INSERT (k, p, v)
            |  VALUES (s.src_key, s.sp, s.nv)""".stripMargin)
      }
      assert(plans.nonEmpty, "listener captured no executed plans")
      val offenders = plans.filter(_.contains("BroadcastExchange"))
      assert(offenders.isEmpty,
        s"key-mapped MERGE must not force broadcasts above threshold:\n" +
          offenders.headOption.getOrElse(""))
      val twin = s"$wh/twin"
      FactVersioned.upsert(spark, twin, base, Seq("k"), "p")
      FactVersioned.upsert(spark, twin,
        spark.range(0, 900).selectExpr("id * 3 AS k",
          "CAST(id * 3 % 5 AS INT) AS p", "id + 100000 AS v"),
        Seq("k"), "p")
      assert(rows(FactVersioned.read(s, path)) ==
        rows(FactVersioned.read(spark, twin)))
    } finally {
      s.conf.unset(GraftDml.ProbeBroadcastConf)
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("DELETE/UPDATE over a NULL partition value rewrite it without " +
      "losing keeper rows (null-safe partition scoping)") {
    val wh = Files.createTempDirectory("graft_nullpart_").toString
    val path = s"$wh/t"
    // partition column with a NULL value → __HIVE_DEFAULT_PARTITION__
    val base = (1 to 30).map(i =>
      (i.toLong, if (i % 3 == 0) None else Some(i % 3), i * 10L))
      .toDF("k", "p", "v")
    FactVersioned.upsert(spark, path, base, Seq("k"), "p")
    val s = GraftDml.enable(spark)
    s.conf.set("spark.sql.catalog.g", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.g.root", wh)
    // DELETE one key living in the null partition: the other null-
    // partition rows must SURVIVE the rewrite (SQL-3VL isin would have
    // filtered every keeper out and emptied the partition)
    s.sql("DELETE FROM g.t WHERE k = 3")
    val afterDelete = FactVersioned.read(s, path)
      .select("k", "p", "v").as[(Long, Option[Int], Long)].collect().toSet
    assert(!afterDelete.exists(_._1 == 3L))
    assert(afterDelete.count(_._2.isEmpty) == 9,
      s"null-partition keepers lost: ${afterDelete.filter(_._2.isEmpty)}")
    assert(afterDelete.size == 29)
    // UPDATE a key in the null partition: keepers intact, value updated
    s.sql("UPDATE g.t SET v = 999 WHERE k = 6")
    val afterUpdate = FactVersioned.read(s, path)
      .select("k", "p", "v").as[(Long, Option[Int], Long)].collect().toSet
    assert(afterUpdate.contains((6L, None, 999L)))
    assert(afterUpdate.count(_._2.isEmpty) == 9)
    assert(afterUpdate.size == 29)
    // a BY SOURCE sync can SCOPE the null partition via IS NULL — the
    // one leaf an equality literal can never name: the source keeps
    // key 6; every other null-partition row is deleted, typed
    // partitions untouched
    s.createDataset(Seq(6L)).toDF("k").createOrReplaceTempView("np_src")
    s.sql(
      """MERGE INTO g.t t USING np_src s ON t.k = s.k
        |WHEN NOT MATCHED BY SOURCE AND t.p IS NULL THEN DELETE
        |""".stripMargin)
    val afterSync = FactVersioned.read(s, path)
      .select("k", "p", "v").as[(Long, Option[Int], Long)].collect().toSet
    assert(afterSync.count(_._2.isEmpty) == 1 &&
      afterSync.contains((6L, None, 999L)),
      s"IS NULL scope must keep only the source-named null-partition " +
        s"row, got ${afterSync.filter(_._2.isEmpty)}")
    assert(afterSync.count(_._2.nonEmpty) == 20,
      "typed partitions must be untouched by the null-scoped sync")
  }
}
