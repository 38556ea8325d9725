package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.functions.Normalize
import graft.operators.{Constraints, Merge, PrioritySelect, Upsert}
import graft.sources.Formats

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
    }),

    // CSV round-trip under HOSTILE content: the corpus text is benign,
    // so each row gets a deterministic prefix holding a comma, an
    // RFC-4180 doubled quote, and an embedded NEWLINE — the three
    // things Spark's default CSV options do NOT round-trip. The gate
    // value is read back FROM THE CSV; the oracle recomputes the
    // decorated text from parquet, so any mutation in the quote/
    // escape/multiLine/whitespace path hash-mismatches.
    "q101_csv_roundtrip" -> ((s, dir) => {
      val wh = Files.createTempDirectory("graft_q101_").toString
      val decorated = t(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("n_chars"),
        concat(lit(" a,\"b\"\nc "), substring(col("text"), 1, 40), lit(" "))
          .as("text"))
      Formats.writeCsv(decorated, s"$wh/docs_csv")
      val back = Formats.readCsv(s, s"$wh/docs_csv", decorated.schema)
        .localCheckpoint()
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      back
    }),

    // JSON Lines round-trip with the same hostile prefix (the JSON
    // encoder must escape the quote and newline itself; files stay
    // line-splittable, unlike multiLine CSV).
    "q102_jsonl_roundtrip" -> ((s, dir) => {
      val wh = Files.createTempDirectory("graft_q102_").toString
      val decorated = t(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("n_chars"),
        concat(lit("a,\"b\"\nc "), substring(col("text"), 1, 40))
          .as("text"))
      Formats.writeJsonl(decorated, s"$wh/docs_jsonl")
      val back = Formats.readJsonl(s, s"$wh/docs_jsonl", decorated.schema)
        .localCheckpoint()
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      back
    }),

    // Dead-letter JSONL ingest: three unparseable lines are planted in
    // the feed; the read must quarantine EXACTLY those lines verbatim
    // (kind='bad') while every well-formed row survives untouched —
    // PERMISSIVE's silent nulls and FAILFAST's stopped world are both
    // wrong at scale. The oracle knows the planted garbage as
    // constants, so a swallowed or mangled line hash-mismatches.
    "q105_jsonl_deadletter" -> ((s, dir) => {
      val wh = Files.createTempDirectory("graft_q105_").toString
      val path = s"$wh/feed"
      val src = t(s, dir, "documents").select("doc_id", "lang", "n_chars")
      Formats.writeJsonl(src, path)
      val corrupt = Seq("{\"doc_id\": ", "not json at all", "{]")
      val p = new org.apache.hadoop.fs.Path(s"$path/part-corrupt.json")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val os = fs.create(p, true)
      os.write(corrupt.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      os.close()
      val r = Formats.readJsonlDeadLetter(s, path, src.schema)
      val out = r.good
        .select(lit("good").as("kind"), col("doc_id"), col("lang"),
          col("n_chars"), lit("").as("raw"))
        .unionByName(r.bad.select(lit("bad").as("kind"),
          lit(-1L).as("doc_id"), lit("").as("lang"),
          lit(-1L).as("n_chars"), col("raw")))
        .localCheckpoint()
      val root = new org.apache.hadoop.fs.Path(wh)
      fs.delete(root, true)
      out
    }),

    // Schema-evolving upsert: the update batch carries a NEW column;
    // pre-existing rows surface it as NULL (blanked for the hash gate),
    // updated rows carry the value — the mergeSchema MERGE story.
    // Type drift on shared columns fails loudly (UpsertSpec).
    "q106_upsert_evolve" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val updates = o.where(col("o_orderkey") % 2 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("priority_flag", lit("X"))
      Upsert.upsertEvolve(o, updates, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"),
          coalesce(col("priority_flag"), lit("")).as("priority_flag"))
    }),

    // ORC round-trip: full-fidelity columnar interchange.
    "q103_orc_roundtrip" -> ((s, dir) => {
      val wh = Files.createTempDirectory("graft_q103_").toString
      val src = t(s, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
      Formats.writeOrc(src, s"$wh/docs_orc")
      val back = Formats.readOrc(s, s"$wh/docs_orc").localCheckpoint()
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      back
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
        |FROM documents""".stripMargin,
    // The oracle recomputes the decorated text straight from parquet:
    // whatever survives the CSV writer+reader must equal it exactly —
    // leading/trailing spaces, comma, doubled quote, embedded newline.
    "q101_csv_roundtrip" ->
      """SELECT doc_id, lang, n_chars,
        |  ' a,"b"' || chr(10) || 'c ' || substr(text, 1, 40) || ' ' AS text
        |FROM documents""".stripMargin,
    "q102_jsonl_roundtrip" ->
      """SELECT doc_id, lang, n_chars,
        |  'a,"b"' || chr(10) || 'c ' || substr(text, 1, 40) AS text
        |FROM documents""".stripMargin,
    "q103_orc_roundtrip" ->
      "SELECT doc_id, lang, source, n_chars FROM documents",
    "q105_jsonl_deadletter" ->
      """SELECT 'good' AS kind, doc_id, lang, n_chars, '' AS raw
        |FROM documents
        |UNION ALL
        |SELECT 'bad', -1, '', -1, x FROM (VALUES
        |  ('{"doc_id": '), ('not json at all'), ('{]')) t(x)""".stripMargin,
    "q106_upsert_evolve" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 0 THEN 'U' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  CASE WHEN o_orderkey % 2 = 0 THEN 'X' ELSE '' END AS priority_flag
        |FROM orders""".stripMargin)
}
