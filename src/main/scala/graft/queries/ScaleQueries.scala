package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bucketing, Merge, Skew, Upsert}

/** Driver gates for the SCALE-POSTURE operators (SURVEY §4) that were
  * previously covered only by unit tests (VERDICT r6 "What's missing" #3
  * and "Next" #1/#2): the correctness of each now flows through the
  * DuckDB hash gate, and the scale property each exists for is asserted
  * INSIDE the gated query — a plan regression fails the gate loudly
  * rather than silently shipping a shuffle.
  *
  *  - q83: star-join aggregate over bucketed tables — the whole plan
  *    (scan → join → agg on the bucket key) must contain ZERO shuffle
  *    exchanges, enforced via [[Bucketing.isShuffleFree]].
  *  - q84: [[Skew.saltedJoin]] ≡ plain equi-join — the salt scatter /
  *    replicate / join pipeline must be value-transparent.
  *  - q85: partition-scoped upsert ([[Upsert.upsertPartitioned]]) —
  *    MERGE semantics through the partitioned snapshot path, with the
  *    commit report asserting only the touched year was rewritten.
  *  - q86: partition-scoped promote transaction
  *    ([[Merge.promotePartitioned]]) — both sides of the staging→main
  *    transaction read back from DISK after partition-dir swaps.
  */
object ScaleQueries extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bucketed fact-fact join + aggregation on the bucket key: bucketed
    // writes pre-shuffle both sides, so join AND agg need no exchange.
    "q83_bucketed_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_quantity",
        "l_extendedprice")
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderstatus",
        "o_totalprice")
      Bucketing.writeBucketed(l, "graft_q83_lineitem", Seq("l_orderkey"), 8)
      Bucketing.writeBucketed(o, "graft_q83_orders", Seq("o_orderkey"), 8)
      val res = s.table("graft_q83_lineitem")
        .join(s.table("graft_q83_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .where(col("o_orderstatus") === "F")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          max(dec(col("o_totalprice"))).cast("double").as("o_total"))
      // the scale property IS the gate: bucketed join + bucket-key agg
      // must be exchange-free end to end
      require(Bucketing.isShuffleFree(res),
        "q83: bucketed star join plan contains a shuffle exchange")
      res
    }),

    // Salted skew join must be value-transparent vs the plain join.
    "q84_salted_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(col("value") * 100, 0).as("cents"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      Skew.saltedJoin(ev, cust, "user_id", salt = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("cents")).cast("long").as("total_cents"))
    }),

    // Partition-scoped upsert: orders snapshotted by order year; the
    // update batch touches ONE of the seven year partitions; the other
    // six are never read, never rewritten (PartitionedUpsertSpec proves
    // byte-identity; here the commit report is asserted and the merged
    // VALUES are hash-gated).
    "q85_upsert_partitioned" -> ((s, dir) => {
      val wh = Files.createTempDirectory("graft_q85_").toString
      val path = s"$wh/orders_by_year"
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          year(col("o_orderdate")).as("p_year"))
      val years = o.select("p_year").distinct().collect().map(_.get(0)).toSeq
      Upsert.writeSnapshotsPartitioned(Seq(
        Upsert.PartitionedWrite(o, path, "p_year", years)))
      val updates = o.where(col("p_year") === 1995 &&
          col("o_orderkey") % 2 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val commit =
        Upsert.upsertPartitioned(s, path, updates, Seq("o_orderkey"), "p_year")
      require(commit.rewritten == Seq("p_year=1995") && commit.deleted.isEmpty,
        s"q85: expected exactly p_year=1995 rewritten, got $commit")
      val out = Upsert.readPartitionedSnapshot(s, path, o.schema).get
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .localCheckpoint()
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      out
    }),

    // Partition-scoped promote: the J1+K5+J2 transaction over
    // year-partitioned staging/main snapshots, read back from disk.
    "q86_promote_partitioned" -> ((s, dir) => {
      val wh = Files.createTempDirectory("graft_q86_").toString
      val stagingPath = s"$wh/staging"
      val mainPath = s"$wh/main"
      val staged = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          year(col("o_orderdate")).as("p_year"))
      val years = staged.select("p_year").distinct().collect().map(_.get(0)).toSeq
      Upsert.writeSnapshotsPartitioned(Seq(
        Upsert.PartitionedWrite(staged, stagingPath, "p_year", years)))
      val parent = t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
      val res = Merge.promotePartitioned(s, stagingPath, parent,
        "o_custkey", "c_custkey", mainPath, Seq("o_orderkey"), "p_year",
        staged.schema)
      require(res.exists(_.main.rewritten.nonEmpty),
        "q86: promote transaction wrote nothing")
      val main = Upsert.readPartitionedSnapshot(s, mainPath, staged.schema).get
      val parked = Upsert.readPartitionedSnapshot(
        s, stagingPath, staged.schema).get
      val out = main.withColumn("side", lit("main"))
        .unionByName(parked.withColumn("side", lit("staging")))
        .select("side", "o_orderkey", "o_custkey", "o_totalprice")
        .localCheckpoint()
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      out
    }))

  override val oracles: Map[String, String] = Map(
    "q83_bucketed_join" ->
      """SELECT l_orderkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS o_total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY l_orderkey""".stripMargin,
    "q84_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_events,
        |  CAST(SUM(round(value * 100)) AS BIGINT) AS total_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q85_upsert_partitioned" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 0 AND year(o_orderdate) = 1995
        |       THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 2 = 0 AND year(o_orderdate) = 1995
        |       THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        |FROM orders""".stripMargin,
    "q86_promote_partitioned" ->
      """SELECT 'main' AS side, o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
        |UNION ALL
        |SELECT 'staging' AS side, o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')""".stripMargin)
}
