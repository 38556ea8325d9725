package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.operators.{Constraints, Merge, PrioritySelect, Upsert}

/** The reference's load/merge/select operators (SURVEY §2.3-2.5) exercised
  * relationally over the driver testdata, each with a DuckDB oracle:
  *
  *  - K1-K4 upsert        → q20_upsert (last-write-wins MERGE)
  *  - J1+K5 promote gate  → q21_promote_main
  *  - J2 anti-join delete → q22_promote_staging
  *  - R1 priority top-1   → q23_priority_top1
  *  - PK/UNIQUE check     → q24_unique_violations
  *  - FK check            → q25_referential_orphans
  *  - T1 timestamp parse  → q26_parse_timestamps
  *  - T2 sanitize         → q27_sanitize_names
  */
object EtlQueries extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Upsert: target = all orders; updates = even orderkeys with doubled
    // price and status 'U'; newest wins on the conflict key.
    "q20_upsert" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val updates = o.where(col("o_orderkey") % 2 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      Upsert.upsert(o, updates, Seq("o_orderkey"))
    }),

    // Promote, main side: staging rows whose parent (order with status F)
    // has arrived are merged into main.
    "q21_promote_main" -> ((s, dir) => promote(s, dir).main),

    // Promote, staging side: rows still parked (parent not arrived).
    "q22_promote_staging" -> ((s, dir) => promote(s, dir).staging),

    // R1: per-customer top-1 order under an explicit priority ranking,
    // ties broken by o_orderkey — the reference's preferred-recording
    // selection re-expressed as broadcast-join + window rank.
    "q23_priority_top1" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val prio = PrioritySelect.priorityTable(s, Map("order_pref" -> Seq(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
      PrioritySelect
        .top1ByPriority(o, prio, "o_orderpriority", Seq("o_custkey"),
          Seq(o("o_orderkey").asc))
        .select("o_custkey", "o_orderkey", "o_orderpriority")
    }),

    // UNIQUE violation report: orderkeys appearing on >1 lineitem.
    "q24_unique_violations" -> ((s, dir) =>
      Constraints.uniqueViolations(t(s, dir, "lineitem"), Seq("l_orderkey"))),

    // FK orphan report: events.user_id with no matching customer.
    "q25_referential_orphans" -> ((s, dir) =>
      Constraints.referentialViolations(
          t(s, dir, "events"), "user_id", t(s, dir, "customer"), "c_custkey")
        .select("event_id", "user_id")),

    // T1: ISO-8601 round-trip with null-on-error; epoch micros out
    // (never raw timestamps — see QueryPack doc).
    "q26_parse_timestamps" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(col("o_orderkey"),
        unix_micros(Normalize.parseTimestampUtc(
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'")))
          .as("parsed_us"),
        Normalize.parseTimestampUtc(lit("not-a-timestamp"))
          .cast("string").as("bad_parse"))
    }),

    // T2: filesystem sanitization of a path-hostile derived name.
    "q27_sanitize_names" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        Normalize.sanitizeName(
          concat(col("source"), lit("/doc:"), col("doc_id").cast("string")))
          .as("safe_name"))
    }))

  // Staging = orders (unique id, like the reference's recording.id);
  // gate = "parent customer in the BUILDING segment has arrived".
  private def promote(s: SparkSession, dir: String): Merge.PromoteResult = {
    val staging = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val parent = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    Merge.promote(staging, parent, "o_custkey", "c_custkey",
      staging.limit(0), Seq("o_orderkey"))
  }

  override val oracles: Map[String, String] = Map(
    "q20_upsert" ->
      """WITH updates AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0
        |)
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM updates
        |UNION ALL
        |SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice FROM orders o
        |WHERE o.o_orderkey % 2 <> 0""".stripMargin,
    "q21_promote_main" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')""".stripMargin,
    "q22_promote_staging" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')""".stripMargin,
    "q23_priority_top1" ->
      """SELECT o_custkey, o_orderkey, o_orderpriority FROM (
        |  SELECT o_custkey, o_orderkey, o_orderpriority,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY
        |      CASE o_orderpriority
        |        WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
        |        WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
        |        WHEN '5-LOW' THEN 5 END, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "q24_unique_violations" ->
      """SELECT l_orderkey, COUNT(*) AS row_count FROM lineitem
        |WHERE l_orderkey IS NOT NULL
        |GROUP BY l_orderkey HAVING COUNT(*) > 1""".stripMargin,
    "q25_referential_orphans" ->
      """SELECT event_id, user_id FROM events e
        |WHERE user_id IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)""".stripMargin,
    "q26_parse_timestamps" ->
      """SELECT o_orderkey,
        |  epoch_us(try_strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ'), '%Y-%m-%dT%H:%M:%SZ')) AS parsed_us,
        |  CAST(try_strptime('not-a-timestamp', '%Y-%m-%dT%H:%M:%SZ') AS VARCHAR) AS bad_parse
        |FROM orders""".stripMargin,
    "q27_sanitize_names" ->
      """SELECT doc_id,
        |  CASE WHEN (source || '/doc:' || CAST(doc_id AS VARCHAR)) IS NULL
        |         OR trim(source || '/doc:' || CAST(doc_id AS VARCHAR)) = ''
        |       THEN 'unknown'
        |       ELSE substr(regexp_replace(source || '/doc:' || CAST(doc_id AS VARCHAR), '[\\/:*?"<>|]', '_', 'g'), 1, 255)
        |  END AS safe_name
        |FROM documents""".stripMargin)
}
