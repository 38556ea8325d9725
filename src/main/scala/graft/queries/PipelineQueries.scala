package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Training-data-pipeline operations beyond the round-1 surface, plus
  * SQL-breadth queries (set ops, correlated subqueries, extended window
  * functions, exact second moments). All oracle-gated.
  *
  * Determinism follows QueryPack's conventions; the statistical moments
  * (q60) go through EXACT decimal sums first and only convert to double
  * for the final closed-form formula, so partition-order float
  * accumulation can never flip a rounded digit.
  */
object PipelineQueries extends QueryPack {

  // PII patterns (RE2-compatible — DuckDB mirrors them verbatim)
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe = "https?://[^\\s]+"
  private val phoneRe = "\\+[0-9][0-9\\-]{7,}[0-9]"

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII redaction: scrub emails / URLs / phone numbers before a corpus
    // ships to training. The synthetic corpus carries no PII, so each
    // doc gets a deterministic injected contact line first — the query
    // proves the scrubber, not the generator. Order matters: emails
    // before URLs (a URL pattern would not eat "x@y.z", but an email
    // inside a URL query-string must already be gone).
    "q55_pii_redact" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val injected = concat(col("text"),
        lit(" contact "), col("lang"), lit("_"), col("doc_id"),
        lit("@corp.example.com at https://ex.org/d/"), col("doc_id"),
        lit(" or +1-555-000-"), col("doc_id"))
      d.select(col("doc_id"),
        regexp_replace(
          regexp_replace(
            regexp_replace(injected, emailRe, "<EMAIL>"),
            urlRe, "<URL>"),
          phoneRe, "<PHONE>").as("redacted"))
    }),

    // Contamination check: distinct 5-gram overlap between sources —
    // the benchmark-leakage sweep (train corpus vs eval set). Shuffle
    // is on the gram hash; at 100 TB the gram table is the big side and
    // the eval side broadcasts.
    "q56_contamination" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      // materialized once — it feeds both sides of the self-join
      val grams = d.select(col("source"),
          explode(array_distinct(wordShingles(col("text"), 5))).as("g"))
        .distinct()
        .localCheckpoint(true)
      grams.as("a")
        .join(grams.as("b"),
          col("a.g") === col("b.g") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("shared_grams"))
    }),

    // Window-function breadth beyond q53: dense_rank / percent_rank /
    // cume_dist / nth_value per customer over an explicit full frame.
    "q57_window_rank_breadth" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      o.select(col("o_orderkey"), col("o_custkey"),
        dense_rank().over(w).as("drank"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_best"))
    }),

    // Set-operation surface: INTERSECT / EXCEPT over yearly customer
    // activity (ref S2's union+distinct is the only set op computed by
    // the reference; these complete the family).
    "q58_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def active(yr: Int) = o
        .where(year(col("o_orderdate")) === yr)
        .select(col("o_custkey"))
      val both = active(1996).intersect(active(1997))
        .select(lit("both").as("tag"), col("o_custkey"))
      val only96 = active(1996).except(active(1997))
        .select(lit("only_1996").as("tag"), col("o_custkey"))
      val only97 = active(1997).except(active(1996))
        .select(lit("only_1997").as("tag"), col("o_custkey"))
      both.unionByName(only96).unionByName(only97)
    }),

    // Correlated EXISTS / NOT EXISTS through the SQL surface — Catalyst
    // decorrelates both into semi/anti joins (q05/q06 prove the join
    // form; this proves the subquery rewrite).
    "q59_correlated_exists" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g59_orders")
      t(s, dir, "lineitem").createOrReplaceTempView("g59_lineitem")
      s.sql("""
        SELECT o_orderkey, o_custkey
        FROM g59_orders o
        WHERE EXISTS (SELECT 1 FROM g59_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity >= 45)
          AND NOT EXISTS (SELECT 1 FROM g59_lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')""")
    }),

    // Exact second moments: stddev of quantity/price and their
    // correlation per return flag, from EXACT decimal power sums
    // (Σx, Σx², Σxy) — the closed-form formulas run once on exact
    // inputs, so the result is partition-order invariant in both
    // engines (a naive stddev/corr aggregate is not).
    "q60_stats_moments" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val agg = l.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).as("sq"),
          sum(dec(col("l_quantity")) * dec(col("l_quantity"))).as("sqq"),
          sum(dec(col("l_extendedprice"))).as("sp"),
          sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice")))
            .as("spp"),
          sum(dec(col("l_quantity")) * dec(col("l_extendedprice")))
            .as("sqp"))
      val n = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      val varQ = (n * d("sqq") - d("sq") * d("sq")) / (n * (n - 1))
      val varP = (n * d("spp") - d("sp") * d("sp")) / (n * (n - 1))
      val cov = (n * d("sqp") - d("sq") * d("sp")) / (n * (n - 1))
      agg.select(col("l_returnflag"), col("n"),
        round(sqrt(varQ), 4).as("stddev_qty"),
        round(sqrt(varP), 4).as("stddev_price"),
        round(cov / (sqrt(varQ) * sqrt(varP)), 6).as("corr_qty_price"))
    }),

    // Bigram top-3 per language: n-gram frequency analysis (the
    // vocabulary-profile pass of a corpus audit).
    "q61_bigram_topk" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("gram").asc)
      d.select(col("lang"),
          explode(wordShingles(lower(col("text")), 2)).as("gram"))
        .groupBy(col("lang"), col("gram"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
    }),

    // Multimodal manifest through the Media plumbing: documents' bytes
    // as opaque binary content with typed metadata, frame-sample plan
    // from durations — metadata-only outputs, so the oracle can mirror
    // it (real decode is covered by MediaSpec/DspSpec/Mp4MetaSpec and
    // the q79 gate below).
    "q63_media_manifest" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val files = graft.multimodal.Media.fromBytes(
          d.select(col("doc_id"), col("text").cast("binary").as("bytes")),
          "doc_id", "bytes", "video")
        .toDF()
        .withColumn("duration_ms", length(col("content")).cast("bigint") * 10)
        .as[graft.multimodal.Media.MediaFile]
      val manifest = files.toDF().select(col("media_id"),
        length(col("content")).cast("bigint").as("n_bytes"))
      graft.multimodal.Media
        .frameSamplePlan(files, everyMs = 5000L, maxFrames = 4)
        .join(manifest, Seq("media_id"))
        .select(col("media_id"), col("n_bytes"), col("frame_idx"),
          col("frame_ts_ms"))
    }),

    // Greedy sequence packing — chunking's sibling: documents
    // concatenate in doc-id order into 64-token-capacity training
    // sequences, sharded into 8 hash buckets (the shard is the
    // parallel unit; the per-shard fold is sequential by nature).
    // Oracle: the same greedy fold as a recursive CTE stepping every
    // bucket one document per iteration.
    "q82_pack_sequences" -> ((s, dir) =>
      graft.operators.Packing.packGreedy(
        t(s, dir, "documents"), "doc_id", "text",
        capacity = 64, nBuckets = 8)),

    // Token-window chunking — the context-window prep step of a
    // training pipeline: 64-token windows stepping 48 (16-token
    // overlap), every token in >= 1 chunk, chunk ids = (doc_id,
    // chunk_idx). Narrow per-row pipeline (tokenize -> sequence ->
    // explode -> slice), no shuffle; the oracle mirrors the window
    // math with DuckDB list slicing.
    "q81_chunk_windows" -> ((s, dir) =>
      graft.operators.Chunking.chunkTokens(
        t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 64, overlap = 16)),

    // Span-level (repeated-substring) dedup — Lee et al.'s
    // training-data cleanup: every non-first occurrence of a repeated
    // 8-token shingle is cut, cut windows merged per doc into maximal
    // half-open token spans. First occurrences come from a map-side-
    // combining min_by aggregation over xxhash64 buckets + a shuffle-
    // hash join-back (NO per-shingle sort anywhere — a boilerplate
    // shingle with 10⁸ occurrences streams linearly), then one per-doc
    // gaps-and-islands pass; the oracle is a FULL DuckDB mirror of the
    // first-occurrence and interval-merge math.
    "q126_repeated_spans" -> ((s, dir) =>
      graft.operators.Dedup.repeatedSpans(
        t(s, dir, "documents"), "doc_id", "text", n = 8)),

    // The ISO-BMFF parser under the DuckDB gate: each document becomes
    // a minimal-but-real MP4 (ftyp + moov/mvhd + one 320x240 avc1
    // trak) built DECLARATIVELY from hex constants + the row's
    // n_chars spliced in as the mvhd duration (big-endian u32 via
    // hex/lpad/unhex — whole-stage-codegen'd binary construction, no
    // UDF). Media.videoMetadata then parses duration/dims/codec back
    // out distributed, and the oracle recomputes every field from
    // n_chars alone — a full hash gate over Mp4Meta's box walk.
    // Constants generated by tools/make_tiny_mp4.py (same builders as
    // the committed tiny.mp4 fixture).
    "q79_video_meta" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      // three per-row splices into constant box hex (tools/
      // make_tiny_mp4.py): mvhd duration = n_chars*10 (ms at moov
      // timescale 1000), mdhd duration = n_chars*40 media units, stts
      // sample_count = n_chars frames at delta 40 — so the parser must
      // hand back frame_count = n_chars and fps = 1000*n/(40n) = 25.0
      val ftypHex = "000000146674797069736F6D0000020069736F6D"
      val moovHdrHex = "000001486D6F6F76"
      val mvhdPrefixHex =
        "0000006C6D766864000000000000000000000000000003E8"
      val mvhdSuffixHex =
        "000100000100000000000000000000000001000000000000000000000000" +
        "000000010000000000000000000000000000400000000000000000000000" +
        "0000000000000000000000000000000000000002"
      val trakPreMdhdDurHex =
        "000000D47472616B0000005C746B68640000000000000000000000000000" +
        "000100000000000013880000000000000000000000000000000000010000" +
        "000000000000000000000000000100000000000000000000000000004000" +
        "00000140000000F00000000000706D646961000000206D64686400000000" +
        "0000000000000000000003E8"
      val trakMidHex = // mdhd language "eng" … stts header + entry_count 1
        "15C70000000000486D696E66000000407374626C00000020737473640000" +
        "000000000001000000106176633100000000000000000000001873747473" +
        "0000000000000001"
      val trakPostHex = "00000028" // stts sample_delta = 40
      val mp4 = d.select(col("doc_id"), concat(
        unhex(lit(ftypHex)), unhex(lit(moovHdrHex)),
        unhex(lit(mvhdPrefixHex)),
        unhex(lpad(hex(col("n_chars") * 10), 8, "0")),
        unhex(lit(mvhdSuffixHex)),
        unhex(lit(trakPreMdhdDurHex)),
        unhex(lpad(hex(col("n_chars") * 40), 8, "0")),
        unhex(lit(trakMidHex)),
        unhex(lpad(hex(col("n_chars")), 8, "0")),
        unhex(lit(trakPostHex))).as("bytes"))
      val files = graft.multimodal.Media.fromBytes(
        mp4, "doc_id", "bytes", "video")
      graft.multimodal.Media.videoMetadata(files).toDF()
        .select(col("media_id").as("doc_id"), col("brand"),
          col("duration_ms"), col("width"), col("height"), col("codec"),
          col("frame_count"), col("fps"), col("media_timescale"),
          col("language"))
    }),

    // Semi-structured property access: per-type stats over a JSON
    // attribute of the event payload (the reference's in-flight data is
    // schemaless JSON, SURVEY §1.2 — this is the schema-on-read path).
    "q64_json_props" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k")).as("sum_k"))
    }),

    // FULL OUTER join surface: per-month order volume vs event volume —
    // months present on either side survive with nulls coalesced.
    "q68_full_outer" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n_orders"))
      val e = t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n_events"))
      o.join(e, Seq("ym"), "full_outer")
        .select(col("ym"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
    }),

    // NOT IN with NULLs — SQL three-valued logic: a NULL in the
    // subquery list makes NOT IN never-true, so only the NOT-IN branch
    // with a null-free list returns rows. Both engines must agree.
    "q69_not_in_nulls" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g69_customer")
      t(s, dir, "orders").createOrReplaceTempView("g69_orders")
      s.sql("""
        SELECT c_custkey, 'no_urgent_orders' AS tag
        FROM g69_customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM g69_orders
           WHERE o_orderpriority = '1-URGENT')
        UNION ALL
        SELECT c_custkey, 'null_poisoned' AS tag
        FROM g69_customer
        WHERE c_custkey NOT IN
          (SELECT nullif(o_custkey, o_custkey) FROM g69_orders)""")
    }),

    // Global ordered top-k with pagination: ORDER BY + LIMIT + OFFSET
    // under a unique tie-break. Physically TakeOrderedAndProject — the
    // per-partition top-(k+offset) + single merge that never sorts the
    // full table.
    "q71_order_limit_offset" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .offset(5)
        .limit(20)),

    // Date arithmetic breadth: day deltas, month shifts, month-end
    // snapping — all surfaced as strings/ints per the determinism
    // conventions (never raw DATE columns).
    "q72_date_arith" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(col("o_orderkey"),
        datediff(lit("1998-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_98"),
        date_format(add_months(col("o_orderdate").cast("date"), 3),
          "yyyy-MM-dd").as("plus3mo"),
        date_format(last_day(col("o_orderdate").cast("date")),
          "yyyy-MM-dd").as("month_end"),
        dayofmonth(col("o_orderdate")).as("dom"))
    }),

    // Edit distance (Levenshtein) between consecutive docs' prefixes —
    // the char-level near-dup verification primitive (prefix-bounded:
    // full-document DP is quadratic in length by construction).
    // Non-ASCII is stripped first in BOTH engines: DuckDB's
    // levenshtein counts BYTES while Spark counts code points, so the
    // oracle only agrees on ASCII input — made explicit rather than
    // relying on the fixture happening to be ASCII.
    "q73_edit_distance" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"),
          substring(regexp_replace(col("text"), "[^\\x20-\\x7E]", ""),
            1, 40).as("p"))
      d.select(col("doc_id").as("id_a"), col("p").as("p_a"))
        .join(d.select((col("doc_id") - 1).as("id_a"),
          col("doc_id").as("id_b"), col("p").as("p_b")), Seq("id_a"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("p_a"), col("p_b")).as("edit_dist"))
    }),

    // Histogram: fixed-width value buckets over the event stream (the
    // distribution-profile pass; floor arithmetic, not width_bucket, so
    // both engines bucket identically).
    "q65_histogram" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.select(floor(col("value") / 50.0).cast("long").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
    }),

    // Calendar breakdown with HAVING: order volume by year/quarter/
    // month, keeping only dense months.
    "q66_date_parts" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          month(col("o_orderdate")).cast("long").as("mon"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("volume"))
        .where(col("n") > 10)
    }),

    // Incrementally-maintained rollup: the orders fact split into two
    // batches, aggregated independently, merged via partial-state
    // combine — must equal the oracle's single full GROUP BY. The
    // materialized-view refresh path (merge cost ∝ |groups|, not
    // |history|).
    "q67_incremental_rollup" -> ((s, dir) => {
      import graft.operators.IncrementalAgg
      import graft.operators.IncrementalAgg.Stat
      val o = t(s, dir, "orders").select(col("o_orderpriority").as("k"),
        col("o_orderkey").as("v"))
      val stats = Seq(Stat("v"))
      val even = IncrementalAgg.aggregateBatch(
        o.where(col("v") % 2 === 0), Seq("k"), stats)
      val odd = IncrementalAgg.aggregateBatch(
        o.where(col("v") % 2 =!= 0), Seq("k"), stats)
      IncrementalAgg.merge(even, odd, Seq("k"), stats)
    }),

    // Character-3-gram Jaccard between consecutive docs: the
    // tokenization-robust near-dup primitive (char grams survive
    // punctuation/spacing edits that break word shingles).
    "q70_char_jaccard" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val grams = d.select(col("doc_id"),
        charNgrams(col("text"), 3).as("g"))
      val pairs = grams.select(col("doc_id").as("id_a"), col("g").as("g_a"))
        .join(grams.select((col("doc_id") - 1).as("id_a"),
          col("doc_id").as("id_b"), col("g").as("g_b")), Seq("id_a"))
      pairs.select(col("id_a"), col("id_b"),
        round(graft.operators.Dedup.jaccardArrays(col("g_a"), col("g_b")), 4)
          .as("jaccard"))
    }),

    // Repetition score: highest single-token share per document — the
    // degenerate-text filter (boilerplate / keyword-stuffed docs score
    // high and get dropped before training).
    "q62_repetition" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val freq = d.select(col("doc_id"),
          explode(tokens(lower(col("text")))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(max(col("cnt")).as("max_tok"),
          sum(col("cnt")).as("n_toks"))
      freq.select(col("doc_id"), col("max_tok"), col("n_toks"),
        round(col("max_tok").cast("double") / col("n_toks").cast("double"),
          6).as("repetition"))
    }))

  /** DuckDB mirror of [[graft.functions.TextFunctions.wordShingles]]
    * over a column expression (docs with < n tokens yield one shingle
    * of the whole text). */
  private def shinglesSql(n: Int, textExpr: String = "trim(text)"): String = {
    val w = s"list_filter(regexp_split_to_array($textExpr, '\\s+')," +
      " x -> len(x) > 0)"
    s"""CASE WHEN len($w) < $n THEN [array_to_string($w, ' ')]
       |ELSE [array_to_string(($w)[i:i+${n - 1}], ' ')
       |      for i in range(1, len($w) - ${n - 2})] END""".stripMargin
  }

  override val oracles: Map[String, String] = Map(
    "q55_pii_redact" ->
      s"""SELECT doc_id,
         |  regexp_replace(
         |    regexp_replace(
         |      regexp_replace(
         |        text || ' contact ' || lang || '_' || doc_id ||
         |        '@corp.example.com at https://ex.org/d/' || doc_id ||
         |        ' or +1-555-000-' || doc_id,
         |        '$emailRe', '<EMAIL>', 'g'),
         |      '$urlRe', '<URL>', 'g'),
         |    '$phoneRe', '<PHONE>', 'g') AS redacted
         |FROM documents""".stripMargin,
    "q56_contamination" ->
      s"""WITH g AS (
         |  SELECT DISTINCT source, unnest(list_distinct(${shinglesSql(5)}))
         |    AS g
         |  FROM documents
         |)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  COUNT(*) AS shared_grams
         |FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,
    "q57_window_rank_breadth" ->
      """SELECT o_orderkey, o_custkey,
        |  dense_rank() OVER w AS drank,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  nth_value(o_orderkey, 2) OVER
        |    (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_best
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,
    "q58_setops" ->
      """WITH a96 AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE year(o_orderdate) = 1996),
        |     a97 AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE year(o_orderdate) = 1997)
        |SELECT 'both' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM a96 INTERSECT SELECT o_custkey FROM a97)
        |UNION ALL
        |SELECT 'only_1996', o_custkey FROM (
        |  SELECT o_custkey FROM a96 EXCEPT SELECT o_custkey FROM a97)
        |UNION ALL
        |SELECT 'only_1997', o_custkey FROM (
        |  SELECT o_custkey FROM a97 EXCEPT SELECT o_custkey FROM a96)""".stripMargin,
    "q59_correlated_exists" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity >= 45)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey
        |                    AND l.l_returnflag = 'R')""".stripMargin,
    "q60_stats_moments" ->
      """WITH a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT l_returnflag, n,
        |  round(sqrt((n * sqq - sq * sq) / (n * (n - 1.0))), 4)
        |    AS stddev_qty,
        |  round(sqrt((n * spp - sp * sp) / (n * (n - 1.0))), 4)
        |    AS stddev_price,
        |  round(((n * sqp - sq * sp) / (n * (n - 1.0))) /
        |        (sqrt((n * sqq - sq * sq) / (n * (n - 1.0))) *
        |         sqrt((n * spp - sp * sp) / (n * (n - 1.0)))), 6)
        |    AS corr_qty_price
        |FROM a""".stripMargin,
    "q61_bigram_topk" ->
      s"""WITH g AS (
         |  SELECT lang, unnest(${shinglesSql(2, "trim(lower(text))")}) AS gram
         |  FROM documents
         |), c AS (
         |  SELECT lang, gram, COUNT(*) AS n FROM g GROUP BY 1, 2
         |)
         |SELECT lang, gram, n,
         |  row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram ASC)
         |    AS rnk
         |FROM c
         |QUALIFY rnk <= 3""".stripMargin,
    "q63_media_manifest" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents
        |), x AS (
        |  SELECT media_id, n_bytes,
        |    unnest(range(0,
        |      least(CAST(floor(n_bytes * 10 / 5000) AS BIGINT), 3) + 1))
        |      AS frame_idx
        |  FROM f
        |)
        |SELECT media_id, n_bytes, frame_idx,
        |  frame_idx * 5000 AS frame_ts_ms
        |FROM x""".stripMargin,
    "q72_date_arith" ->
      """SELECT o_orderkey,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
        |    AS days_to_98,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH,
        |    '%Y-%m-%d') AS plus3mo,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
        |    AS month_end,
        |  dayofmonth(o_orderdate) AS dom
        |FROM orders""".stripMargin,
    "q73_edit_distance" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    substr(regexp_replace(text, '[^\x20-\x7E]', '', 'g'), 1, 40)
        |      AS p
        |  FROM documents
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  levenshtein(a.p, b.p) AS edit_dist
        |FROM p a JOIN p b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "q71_order_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20 OFFSET 5""".stripMargin,
    "q68_full_outer" ->
      """WITH o AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1
        |), e AS (
        |  SELECT strftime(ts, '%Y-%m') AS ym, COUNT(*) AS n_events
        |  FROM events GROUP BY 1
        |)
        |SELECT COALESCE(o.ym, e.ym) AS ym,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(n_events, 0) AS n_events
        |FROM o FULL OUTER JOIN e ON o.ym = e.ym""".stripMargin,
    "q69_not_in_nulls" ->
      """SELECT c_custkey, 'no_urgent_orders' AS tag
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders
        |   WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT c_custkey, 'null_poisoned' AS tag
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT nullif(o_custkey, o_custkey) FROM orders)""".stripMargin,
    "q65_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q66_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mon,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS volume
        |FROM orders GROUP BY 1, 2, 3
        |HAVING COUNT(*) > 10""".stripMargin,
    "q67_incremental_rollup" ->
      """SELECT o_orderpriority AS k,
        |  COUNT(o_orderkey) AS v__count,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS v__sum,
        |  MIN(o_orderkey) AS v__min,
        |  MAX(o_orderkey) AS v__max
        |FROM orders GROUP BY 1""".stripMargin,
    // Full mirror of the greedy fold: a recursive CTE advances every
    // bucket one document per step, threading (fill, seq_id) exactly
    // like the engine's per-bucket fold.
    "q82_pack_sequences" ->
      """WITH RECURSIVE docs AS (
        |  SELECT CAST(doc_id % 8 AS INTEGER) AS bucket, doc_id,
        |    CAST(least(len(list_filter(
        |      regexp_split_to_array(trim(text), '\s+'),
        |      x -> len(x) > 0)), 64) AS BIGINT) AS n,
        |    row_number() OVER (PARTITION BY doc_id % 8
        |      ORDER BY doc_id) AS rn
        |  FROM documents
        |), pack AS (
        |  SELECT bucket, rn, doc_id, n, n AS fill,
        |    CAST(0 AS BIGINT) AS seq_id
        |  FROM docs WHERE rn = 1
        |  UNION ALL
        |  SELECT d.bucket, d.rn, d.doc_id, d.n,
        |    CASE WHEN p.fill + d.n <= 64 THEN p.fill + d.n ELSE d.n END,
        |    CASE WHEN p.fill + d.n <= 64 THEN p.seq_id ELSE p.seq_id + 1
        |      END
        |  FROM docs d JOIN pack p
        |    ON d.bucket = p.bucket AND d.rn = p.rn + 1
        |)
        |SELECT bucket, seq_id, doc_id, n AS n_tokens FROM pack""".stripMargin,

    // Full mirror of repeatedSpans(n=8): same tokenization, same
    // (doc, pos) occurrence ranking per shingle, same running-max
    // gaps-and-islands interval merge.
    "q126_repeated_spans" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> len(x) > 0) AS t
        |  FROM documents
        |), wins AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |    array_to_string(t[i + 1 : i + 8], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 7)) AS i
        |        FROM tk WHERE len(t) >= 8)
        |), ranked AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY shingle
        |      ORDER BY doc_id, pos) AS rn
        |  FROM wins
        |), cuts AS (
        |  SELECT doc_id, pos FROM ranked WHERE rn > 1
        |), flagged AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         OR pos > max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS new_island
        |  FROM cuts
        |), islands AS (
        |  SELECT doc_id, pos,
        |    SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM flagged
        |)
        |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 8 AS span_end
        |FROM islands GROUP BY doc_id, island""".stripMargin,

    // Full mirror of the 64/48 window math with 1-based inclusive list
    // slicing; chunk count = 1 when n <= 64 else ceil((n-64)/48)+1.
    "q81_chunk_windows" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) > 0
        |), idx AS (
        |  SELECT doc_id, toks, n,
        |    unnest(range(0, CAST(CASE WHEN n <= 64 THEN 1
        |      ELSE ceil((n - 64) / 48.0) + 1 END AS BIGINT))) AS chunk_idx
        |  FROM c
        |)
        |SELECT doc_id, chunk_idx,
        |  array_to_string(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64],
        |    ' ') AS chunk_text,
        |  least(64, n - chunk_idx * 48) AS n_tokens
        |FROM idx""".stripMargin,

    // Full mirror from n_chars alone: the engine must round-trip
    // n_chars*10 through real MP4 bytes (mvhd duration u32 at
    // timescale 1000) and parse back the constant trak's dims/codec.
    "q79_video_meta" ->
      """SELECT doc_id, 'isom' AS brand,
        |  CAST(n_chars * 10 AS BIGINT) AS duration_ms,
        |  CAST(320 AS INTEGER) AS width, CAST(240 AS INTEGER) AS height,
        |  'avc1' AS codec,
        |  CAST(n_chars AS BIGINT) AS frame_count,
        |  CAST(25.0 AS DOUBLE) AS fps,
        |  CAST(1000 AS BIGINT) AS media_timescale,
        |  'eng' AS language
        |FROM documents""".stripMargin,

    "q64_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |  MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k
        |FROM events GROUP BY 1""".stripMargin,
    "q70_char_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct([substr(s, i, 3) for i in
        |      range(1, greatest(len(s) - 2, 1) + 1)]) AS g
        |  FROM (SELECT doc_id,
        |          regexp_replace(trim(text), '\s+', ' ', 'g') AS s
        |        FROM documents)
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CASE WHEN len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) > 0
        |    THEN CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |       / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
        |    ELSE 0.0 END, 4) AS jaccard
        |FROM g a JOIN g b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "q62_repetition" ->
      """WITH f AS (
        |  SELECT doc_id, tok, COUNT(*) AS cnt FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(regexp_split_to_array(trim(lower(text)),
        |        '\s+'), x -> len(x) > 0)) AS tok
        |    FROM documents
        |  ) GROUP BY 1, 2
        |), agg AS (
        |  SELECT doc_id, MAX(cnt) AS max_tok, SUM(cnt) AS n_toks
        |  FROM f GROUP BY 1
        |)
        |SELECT doc_id, max_tok, CAST(n_toks AS BIGINT) AS n_toks,
        |  round(CAST(max_tok AS DOUBLE) / n_toks, 6) AS repetition
        |FROM agg""".stripMargin)
}
