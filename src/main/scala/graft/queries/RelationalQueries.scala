package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface: scans, filters (pushed to parquet),
  * aggregation, star joins, semi/anti joins, set ops, rollup/cube,
  * windowing, sessionization — the analytic workload implied by the
  * reference's schema (SURVEY §2.6: the DDL comments delegate these
  * analyses to Power BI over RDS; here they are first-class engine
  * queries over the driver's TPC-H-ish testdata).
  *
  * Scale notes per query are inline; the common posture: filters/projects
  * reach the parquet scan (PushedFilters/ReadSchema), small dims are
  * broadcast, aggregations are partial+final hash aggs, AQE handles skew.
  */
object RelationalQueries extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: single scan, partial+final hash agg.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Predicate + projection pushdown: both reach the parquet reader.
    "q02_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    // TPC-H Q5-style star join; region/nation broadcast, fact joins
    // shuffle on the fk; revenue per nation.
    "q03_star_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lineitems"))
    }),

    // Dim-fact broadcast join (J4 analog: the implied FK star).
    "q04_broadcast_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem"); val p = t(s, dir, "part")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
    }),

    // EXISTS ≡ left-semi join (gate side of the reference's J1 promote).
    "q05_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"),
          "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    }),

    // NOT EXISTS ≡ left-anti join (the reference's J2 semi-join delete).
    "q06_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"),
          "left_anti")
        .select("c_custkey", "c_acctbal")
    }),

    // S2: union of two scans + distinct.
    "q07_union_distinct" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val sup = t(s, dir, "supplier")
      c.select(col("c_nationkey").as("nationkey"))
        .union(sup.select(col("s_nationkey").as("nationkey")))
        .distinct()
    }),

    // Hierarchical ROLLUP (implied dept×role matrices of SURVEY §2.6).
    "q08_rollup" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("total_acctbal"))
    }),

    // CUBE over two order dimensions.
    "q09_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
    }),

    // Time-bucketed activity counts (implied "activity tracking",
    // create_tables.sql:12). Day buckets as DATE (ns-safe).
    "q10_time_bucket" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("total_value"))
    }),

    // Regular-grid resampling with LOCF gap fill (pandas
    // resample().ffill() / TimescaleDB time_bucket_gapfill+locf):
    // hourly buckets per sampled user, empty hours materialized with
    // the last observed value carried forward, n_events = 0 marking
    // fills. Money rides as whole cents so the fill value is integer-
    // exact. Full DuckDB mirror of bucketing, last-pick, grid, and
    // ignore-nulls window fill.
    "q130_resample_ffill" -> ((s, dir) =>
      graft.operators.Resample.resampleFfill(
        t(s, dir, "events").where(col("user_id") % 100 === 0),
        "user_id", "ts", round(col("value") * 100, 0),
        intervalSec = 3600)),

    // Running windowed aggregation, exact via decimal.
    "q11_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        row_number().over(w).as("rn"),
        sum(dec(col("value")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_value"))
    }),

    // Grouped distinct counts (exact).
    "q12_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // Per-type event stats; min/max of raw doubles are exact.
    "q13_events_by_type" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("total_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
    }),

    // Sessionization: 30-min inactivity gap, epoch-micros arithmetic so
    // Spark (µs) and DuckDB (ns→µs) agree exactly. Batch analog of the
    // streaming session-window operator.
    "q14_sessionize" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("es"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("es"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag(col("es"), 1).over(w)
      e.withColumn("is_new",
          when(prev.isNull || col("es") - prev > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"))
    }),

    // AS-OF join (operator Spark lacks): each event enriched with the
    // latest order of the same customer at-or-before the event time.
    // Implemented as union + ordered-window sweep (graft.operators
    // .AsOfJoin) — one shuffle, no per-key history product. Right side
    // pre-deduped per (key, time) for determinism.
    "q15_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      val o = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate")).as("odate_us"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.operators.AsOfJoin.asofBackward(e, o, "user_id", "ts_us",
          "odate_us", Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("asof_o_orderkey"))
    }),

    // Range join, point-in-interval: clicks landing inside the 24 h
    // attribution window after each signup of the same user.
    // Bucket-blocked (graft.operators.RangeJoin) so the join is
    // (key, bucket)-hashed, never a theta nested-loop.
    "q16_interval_points" -> ((s, dir) => {
      val day = 86400000000L
      val e = t(s, dir, "events")
      val iv = e.where(col("event_type") === "signup").select(
        col("event_id").as("signup_id"), col("user_id"),
        unix_micros(col("ts")).as("lo"),
        (unix_micros(col("ts")) + day).as("hi"))
      val pts = e.where(col("event_type") === "click").select(
        col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"))
      graft.operators.RangeJoin.pointInInterval(iv, pts, Seq("user_id"),
          "lo", "hi", "t_us", bucketWidth = day)
        .select("signup_id", "click_id")
    }),

    // Interval-overlap self join: same-customer order pairs whose 7-day
    // windows intersect (bucket-blocked, deduped across buckets).
    "q17_interval_overlap" -> ((s, dir) => {
      val week = 604800000000L
      def iv(alias: String) = t(s, dir, "orders").select(
        col("o_orderkey").as(s"id_$alias"),
        col("o_custkey").as("cust"),
        unix_micros(col("o_orderdate")).as(s"lo_$alias"),
        (unix_micros(col("o_orderdate")) + week).as(s"hi_$alias"))
      graft.operators.RangeJoin.intervalOverlap(
          iv("a"), iv("b"), Seq("cust"),
          "lo_a", "hi_a", "lo_b", "hi_b", "id_a", "id_b",
          bucketWidth = week)
        .where(col("id_a") < col("id_b"))
        .select("cust", "id_a", "id_b")
    }),

    // Window-function breadth: lag/lead/ntile/first over event streams.
    "q53_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        ntile(4).over(w).as("quartile"),
        first(col("event_type")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_type"))
    }),

    // Explicit GROUPING SETS (finer than rollup/cube) through the SQL
    // surface over registered views.
    "q47_grouping_sets" -> ((s, dir) => {
      graft.Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
          |  (o_orderstatus, o_orderpriority))""".stripMargin)
    }),

    // Sorted array aggregation per group (deterministic collect). The
    // array is serialized to a string for the output row — raw
    // list-valued cells are not reliably hashable by the oracle compare.
    "q48_array_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("l_linenumber"))))
          .as("linenumbers"),
          size(collect_list(col("l_linenumber"))).as("n_lines"))),

    // Ordered string aggregation per group.
    "q49_string_agg" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(array_join(array_sort(collect_list(col("c_mktsegment"))), "|")
          .as("segments"),
          count(lit(1)).as("n"))),

    // Decorrelated scalar subquery: orders priced above 2× their
    // customer's average. The comparison is kept in EXACT integer/decimal
    // arithmetic by multiplying out the division (price·n > 2·total) —
    // a decimal-divide would round differently per engine.
    "q29_above_customer_avg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val stats = o.groupBy(col("o_custkey").as("ck"))
        .agg(sum(dec(col("o_totalprice"))).as("total_dec"),
          count(lit(1)).as("n_orders"))
      o.join(stats, col("o_custkey") === col("ck"))
        .where(dec(col("o_totalprice")) * col("n_orders") >
          col("total_dec") * 2)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // Top-N per group over an aggregate ("top hosts by meeting hours",
    // SURVEY §2.6): top-3 customers by decimal-exact revenue per nation.
    "q28_topn_per_group" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val rev = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("c_custkey"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
      rev.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "revenue", "rnk")
    }),

    // Exact interpolated percentiles per group (duration-analysis
    // surface of SURVEY §2.6); rounded so interpolation ulps can't
    // diverge from the oracle's quantile_cont.
    "q19_percentiles" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(percentile(col("value"), lit(0.5)), 4).as("p50"),
          round(percentile(col("value"), lit(0.9)), 4).as("p90"),
          count(lit(1)).as("n"))
    }),

    // Portable pivot via conditional aggregation (the implied
    // internal/external split of SURVEY §2.6).
    "q18_pivot" -> ((s, dir) => {
      val e = t(s, dir, "events")
      def cnt(tpe: String) =
        count(when(col("event_type") === tpe, 1)).as(s"n_$tpe")
      e.groupBy(col("user_id"))
        .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"),
          cnt("error"), count(lit(1)).as("n_total"))
    }),

    // HLL++ approximate distinct next to the exact count, gated by a
    // derived-invariant oracle: the exact side must match DuckDB's and
    // the sketch estimate must sit inside a generous error band
    // (5×rsd, floor 5 — HLL++ at rsd 0.02 is far tighter in practice).
    // HLL register-max merges are commutative/idempotent, so the
    // estimate is identical at any parallelism — no determinism pinning
    // needed. This sketch is THE count-distinct at 100 TB: fixed-size
    // state vs a distinct-shuffle of the keys themselves.
    "q94_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("exact_nd"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_nd"))
    }),

    // Approximate percentiles (GK sketch). Unlike HLL/CMS the sketch IS
    // insertion-order-sensitive, so the gate pins determinism by hash-
    // clustering each group into one partition and sorting inside it —
    // the summaries then see one deterministic stream per group at any
    // parallelism. (Production callers skip the pinning and accept
    // rank-bounded nondeterminism; the oracle checks exactly that rank
    // bound: each reported value must be a real data value whose rank
    // is within ±1% of the target percentile.)
    "q95_approx_quantiles" -> ((s, dir) => {
      val pinned = t(s, dir, "events")
        .select(col("event_type"), col("value"))
        .repartition(8, col("event_type"))
        .sortWithinPartitions(col("event_type"), col("value"))
      pinned.groupBy(col("event_type"))
        .agg(percentile_approx(col("value"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)),
          lit(1000)).as("qs"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          posexplode(col("qs")).as(Seq("pi", "qv")))
    }),

    // Whole-table aggregate COLUMN pruning: an unfiltered count/min/max
    // over a 16-column fact table must read exactly the two aggregated
    // columns — at 100 TB the difference between scanning 2 narrow
    // column chunks and the whole table. Asserted in-gate from the
    // executed plan's ReadSchema. (Parquet FOOTER-stats aggregate
    // pushdown — SPARK-34952's PushedAggregation — was evaluated and
    // does not fire in this Spark build on either the parquet or the
    // ORC DSv2 path with its conf enabled, for any combination of
    // COUNT(*)/MIN/MAX over plain long columns; column pruning is the
    // pushdown that IS observable, so it is what the gate pins.)
    "q107_agg_prune" -> ((s, dir) => {
      val prevMeta = s.conf.get("spark.sql.maxMetadataStringLength", "100")
      // default metadata truncation (100 chars) cuts ReadSchema short
      s.conf.set("spark.sql.maxMetadataStringLength", "4000")
      try {
        val df = t(s, dir, "lineitem").agg(
          count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"),
          min(col("l_linenumber")).as("min_line"),
          max(col("l_linenumber")).as("max_line"))
        val plan = df.queryExecution.executedPlan.toString
        require(plan.contains(
          "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>"),
          s"q107: aggregate scan reads more than its columns:\n" +
            plan.take(800))
        df.localCheckpoint()
      } finally
        s.conf.set("spark.sql.maxMetadataStringLength", prevMeta)
    }),

    // Exact-k deterministic stratified sample: per market segment, the
    // 5 customers whose md5(custkey) sorts first — fully value-gated
    // because DuckDB computes the identical md5 order.
    "q96_stratified_sample" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedTopK(
        t(s, dir, "customer")
          .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal"),
        "c_mktsegment", "c_custkey", k = 5)
        .select("c_mktsegment", "draw_rank", "c_custkey", "c_name",
          "c_acctbal")
    }))

  override val oracles: Map[String, String] = Map(
    // full mirror: same integral bucket division, same (ts desc, v
    // desc) last-pick, same dense grid + IGNORE NULLS forward fill
    "q130_resample_ffill" ->
      """WITH ev AS (
        |  SELECT user_id AS key, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) // 3600000000 AS bucket,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE user_id % 100 = 0
        |), pb AS (
        |  SELECT key, bucket, v,
        |    count(*) OVER (PARTITION BY key, bucket) AS n_events,
        |    row_number() OVER (PARTITION BY key, bucket
        |      ORDER BY ts_us DESC, v DESC) AS rn
        |  FROM ev
        |), lastv AS (
        |  SELECT key, bucket, n_events, v FROM pb WHERE rn = 1
        |), grid AS (
        |  SELECT key, unnest(range(min(bucket), max(bucket) + 1)) AS bucket
        |  FROM lastv GROUP BY key
        |)
        |SELECT g.key, g.bucket,
        |  COALESCE(l.n_events, 0) AS n_events,
        |  last_value(l.v IGNORE NULLS) OVER (PARTITION BY g.key
        |    ORDER BY g.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        |FROM grid g
        |LEFT JOIN lastv l ON l.key = g.key AND l.bucket = g.bucket""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_quantity < 10""".stripMargin,
    "q03_star_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q04_broadcast_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "q07_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q08_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q09_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q10_time_bucket" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q11_window_running" ->
      """SELECT user_id, event_id,
        |  row_number() OVER w AS rn,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""".stripMargin,
    "q12_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q13_events_by_type" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q14_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS es FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, es,
        |    CASE WHEN lag(es) OVER w IS NULL THEN 1
        |         WHEN es - lag(es) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
        |), sess AS (
        |  SELECT user_id, event_id,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    "q15_asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS odate_us,
        |         MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2
        |), e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |)
        |SELECT e.event_id, e.user_id, o.o_orderkey AS asof_o_orderkey
        |FROM e ASOF LEFT JOIN o
        |  ON e.user_id = o.user_id AND e.ts_us >= o.odate_us""".stripMargin,
    "q16_interval_points" ->
      """SELECT s.event_id AS signup_id, c.event_id AS click_id
        |FROM events s JOIN events c
        |  ON s.user_id = c.user_id
        | AND s.event_type = 'signup' AND c.event_type = 'click'
        | AND epoch_us(c.ts) >= epoch_us(s.ts)
        | AND epoch_us(c.ts) <= epoch_us(s.ts) + 86400000000""".stripMargin,
    "q17_interval_overlap" ->
      """SELECT a.o_custkey AS cust, a.o_orderkey AS id_a, b.o_orderkey AS id_b
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey
        | AND a.o_orderkey < b.o_orderkey
        | AND epoch_us(a.o_orderdate) <= epoch_us(b.o_orderdate) + 604800000000
        | AND epoch_us(b.o_orderdate) <= epoch_us(a.o_orderdate) + 604800000000""".stripMargin,
    "q53_window_funcs" ->
      """SELECT user_id, event_id,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(event_type, 1) OVER w AS next_type,
        |  ntile(4) OVER w AS quartile,
        |  first_value(event_type) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""".stripMargin,
    "q47_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |  (o_orderstatus, o_orderpriority))""".stripMargin,
    "q48_array_agg" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
        |  len(list(l_linenumber)) AS n_lines
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q49_string_agg" ->
      """SELECT c_nationkey,
        |  string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segments,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_nationkey""".stripMargin,
    "q29_above_customer_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o JOIN (
        |  SELECT o_custkey AS ck,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey) s ON o.o_custkey = s.ck
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n_orders > total_dec * 2""".stripMargin,
    "q28_topn_per_group" ->
      """SELECT c_nationkey, c_custkey, revenue, rnk FROM (
        |  SELECT c_nationkey, c_custkey, revenue,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY revenue DESC, c_custkey ASC) AS rnk
        |  FROM (
        |    SELECT c_nationkey, c_custkey,
        |      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |    FROM orders JOIN customer ON o_custkey = c_custkey
        |    GROUP BY c_nationkey, c_custkey))
        |WHERE rnk <= 3""".stripMargin,
    "q19_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q18_pivot" ->
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  COUNT(*) AS n_total
        |FROM events GROUP BY user_id""".stripMargin,

    // Derived-invariant: the exact side must equal DuckDB's count, and
    // the HLL estimate must land inside 5×rsd (floor 5) of it — a
    // violating row drops out and fails the hash compare.
    "q94_approx_distinct" ->
      s"""WITH out AS (SELECT * FROM ${outGlob("q94_approx_distinct")}),
         |exact AS (SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS nd
         |          FROM lineitem GROUP BY l_returnflag)
         |SELECT o.l_returnflag, o.exact_nd, o.approx_nd
         |FROM out o JOIN exact e ON o.l_returnflag = e.l_returnflag
         |WHERE o.exact_nd = e.nd
         |  AND abs(o.approx_nd - e.nd) <=
         |      greatest(5, CAST(ceil(0.10 * e.nd) AS BIGINT))""".stripMargin,

    // Derived-invariant: every reported quantile must be an actual data
    // value of its group whose rank sits within ±1% (+1 row cushion) of
    // the target percentile — 10× the sketch's configured 1/1000 bound,
    // so the gate is deterministic while still catching a broken sketch.
    "q95_approx_quantiles" ->
      s"""WITH out AS (SELECT *,
         |    CASE pi WHEN 0 THEN 0.25 WHEN 1 THEN 0.50
         |            WHEN 2 THEN 0.75 ELSE 0.95 END AS p
         |  FROM ${outGlob("q95_approx_quantiles")}),
         |chk AS (SELECT o.event_type, o.n, o.pi, o.qv, o.p,
         |    (SELECT COUNT(*) FROM events e
         |     WHERE e.event_type = o.event_type AND e.value < o.qv) AS cnt_lt,
         |    (SELECT COUNT(*) FROM events e
         |     WHERE e.event_type = o.event_type AND e.value <= o.qv) AS cnt_le,
         |    EXISTS (SELECT 1 FROM events e
         |     WHERE e.event_type = o.event_type AND e.value = o.qv) AS is_member,
         |    (SELECT COUNT(*) FROM events e
         |     WHERE e.event_type = o.event_type) AS n_true
         |  FROM out o)
         |SELECT event_type, n, pi, qv FROM chk
         |WHERE n = n_true AND is_member
         |  AND cnt_lt <= (p + 0.01) * n + 1
         |  AND cnt_le >= (p - 0.01) * n - 1""".stripMargin,

    "q96_stratified_sample" ->
      """SELECT c_mktsegment, draw_rank, c_custkey, c_name, c_acctbal
        |FROM (SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |          ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey)
        |          AS draw_rank
        |      FROM customer) t
        |WHERE draw_rank <= 5""".stripMargin,

    "q107_agg_prune" ->
      """SELECT COUNT(*) AS n_rows,
        |  MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
        |  MIN(l_linenumber) AS min_line, MAX(l_linenumber) AS max_line
        |FROM lineitem""".stripMargin)
}
