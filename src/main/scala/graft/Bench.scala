package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchSession.build()
    // untimed JIT/codegen warmup (no table IO — data stays cold) so the
    // first measured query doesn't absorb JVM startup. Exercises the
    // plan shapes the suite leans on — agg, window, joins (broadcast +
    // shuffle), explode — so janino/codegen infrastructure, shuffle
    // writers, and the window operator are all hot before timing starts.
    spark.range(2000000).selectExpr("sum(id * 2)", "count(distinct id % 7)")
      .collect()
    val wa = spark.range(100000).selectExpr("id", "id % 100 AS k")
    val wb = spark.range(100).selectExpr("id AS k", "id * 3 AS v")
    // a 100-row build side would auto-broadcast — disable the threshold
    // so this pass genuinely compiles the sort-merge-join path
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try wa.join(wb, "k").selectExpr("sum(v)").collect()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    wa.join(org.apache.spark.sql.functions.broadcast(wb), "k")
      .selectExpr("count(1)").collect()
    wa.selectExpr("k", "id",
        "row_number() OVER (PARTITION BY k ORDER BY id) AS rn")
      .where("rn <= 3").selectExpr("count(1)").collect()
    spark.range(10000)
      .selectExpr("explode(sequence(0, 9)) AS e").selectExpr("sum(e)")
      .collect()
    // Steady-state warmup: run every query once, untimed, against the
    // SMALLEST sibling sf dir. Per-query codegen classes and JIT
    // profiles are plan-shaped, not data-sized — a complex ANN plan
    // costs multiple seconds of janino/JIT on its first run regardless
    // of input rows (q43's cold first run is ~26 s at sf0.1 for work
    // that executes warm in ~4 s). Warming on the tiny sf compiles the
    // same plans for cents, so the measured numbers below reflect
    // steady-state execution — what a resident engine actually does —
    // not one-off compiler latency. The measured sf's data stays cold
    // (except when the measured dir IS sf0.001 — then warming on it is
    // still correct: steady-state timing is the point, and skipping the
    // warmup there would silently fold ~20 s of one-off codegen into
    // the smallest sf's numbers).
    // local-iteration filter (unset in driver runs): comma-separated
    // query names — bench (and warm) only those
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir).toAbsolutePath.getParent
      Option(p).map(_.resolve("sf0.001"))
        .filter(d => java.nio.file.Files.isDirectory(d))
        .map(_.toString)
    }
    warmDir.foreach { d =>
      selected.values.foreach { fn =>
        try fn(spark, d).count() catch { case _: Throwable => () }
      }
    }
    // Release every cache/checkpoint block between timed runs: several
    // operators return eagerly-materialized cached results (the
    // persist-hygiene contract), and a repeat run would otherwise be
    // served from the previous run's cache — a bogus near-zero time.
    // BLOCKING unpersist + a settle pause: round 5's non-blocking
    // release left async block-removal racing the next timed run on
    // the same executor threads, inflating sub-second queries up to
    // 1.9× (the q25–q27 drift, VERDICT r5 #4 — reproduced and isolated
    // by graft.BenchProbe: releaseAll+gc 0.40 s vs 0.25 s blocking+
    // settle for q25, zero codegen recompiles either way).
    def releaseAll(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // Median of 3 runs per query: round-4 single-shot numbers showed
    // >1.7× phantom regressions in untouched code (VERDICT r4 #3) —
    // at ~1 s per query the run-to-run variance IS the signal unless
    // medianed out.
    val runsPerQuery = 3
    val wall0 = System.nanoTime()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = selected.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        var lastDf: org.apache.spark.sql.DataFrame = null
        val times = (1 to runsPerQuery).map { _ =>
          releaseAll()
          // let the ContextCleaner drop prior runs' broadcasts/shuffles
          // (they're GC-triggered; a 24g heap GCs too rarely on its
          // own, and accumulated state bleeds into later timings),
          // then give the cleaner's async deletions a beat to drain so
          // they don't compete with the timed run (BenchProbe proto D)
          System.gc()
          Thread.sleep(100)
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            df.count()
            lastDf = df
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            // sentinel, not elapsed-to-exception: a crashing query must
            // read as FAILED in the JSON, not as "fast" (ADVICE r6 #4)
            errors(name) = e.getClass.getSimpleName + ": " +
              String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r\\t]", " ")
                .take(160)
            -1.0
          }
        }.sorted
        (name, times(runsPerQuery / 2), planFingerprint(lastDf))
    }
    val wallSec = (System.nanoTime() - wall0) / 1e9
    // q76 steady-state companion number (untimed in `total`): ONE
    // resident MemoryStream query reused across 3 runs, so the ~1 s of
    // per-fresh-query janino codegen the gated q76 pays is excluded —
    // this is the engine's per-cycle cost, the number a resident
    // deployment sees. Row-count asserted against the gated run's rows.
    val steady: Option[(Double, Long)] =
      try {
        releaseAll(); System.gc(); Thread.sleep(100)
        val (times, rows) = graft.queries.StreamReplayQueries
          .steadyStatePromote(spark, sfDir, runs = 3)
        Some((times.sorted.apply(times.length / 2), rows))
      } catch { case _: Throwable => None }
    val timesByName = results.map { case (k, v, _) => k -> v } ++
      steady.map { case (t, _) => "q76_stream_promote_steady" -> t }
    // ANN quality alongside speed: recall@3 of the approximate indexes
    // vs the exact result at THIS sf (untimed; the driver reads it from
    // the same JSON line).
    val recalls: Seq[(String, Double)] =
      try {
        def pairSet(name: String): Set[(Long, Long)] =
          SparkEntry.queries(name)(spark, sfDir)
            .select("query_id", "neighbor_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        val exact = pairSet("q40_cosine_topk")
        Seq("q43_lsh_topk", "q45_ivf_topk", "q80_sq8_topk").map { n =>
          n -> (exact & pairSet(n)).size.toDouble / math.max(exact.size, 1)
        }
      } catch { case _: Throwable => Seq.empty }
    val qs = timesByName.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rc =
      if (recalls.isEmpty) ""
      else recalls.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString(",\"recall\":{", ",", "}")
    // Executed-path tags for the near-dup gates: a deterministic replay
    // of the routing decision each gated query makes, so a silent
    // exact-path reroute (round 4's q74) is visible in this JSON.
    import graft.queries.VectorQueries.{Q74LshBits, Q74LshTables, Q74Threshold}
    val paths = Seq(
      "q41_embedding_neardup" -> "exact", // approx = false by construction
      "q74_neardup_approx" -> graft.operators.Dedup.approxPathDecision(
        Q74Threshold, Q74LshBits, Q74LshTables))
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString(",\"path\":{", ",", "}")
    // Plan fingerprints: a short hash of each query's EXECUTED plan's
    // node-type histogram. Any silent physical reroute (the r4 q74
    // failure mode: LSH plan falling back to exact; a broadcast join
    // degrading to sort-merge) changes the histogram and therefore the
    // fingerprint — diffable driver-side round over round without
    // shipping whole plan dumps.
    val fps = results.map { case (k, _, fp) => s"\"" + k + "\":\"" + fp + "\"" }
      .mkString(",\"plan_fp\":{", ",", "}")
    val errs =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
        .mkString(",\"errors\":{", ",", "}")
    // promoted-row count of the steady-state run — must equal the gated
    // q76's row count at the same sf (diffable driver-side)
    val steadyRows = steady.map { case (_, r) => s""","q76_steady_rows":$r""" }
      .getOrElse("")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$rc$paths$fps$errs$steadyRows,"runs_per_query":$runsPerQuery,"wall_sec":$wallSec,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Node-type histogram of the executed plan (AQE final stages and
    * reused/staged subtrees included), hashed to 8 hex chars. Node
    * names are truncated at the first space/paren so codegen ids,
    * file paths and stage ids cannot leak into the fingerprint —
    * node TYPE counts are the reroute signal, not labels. */
  private def planFingerprint(df: org.apache.spark.sql.DataFrame): String =
    if (df == null) "err"
    else try {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      // the timed runs used count(), which executes a REWRITTEN
      // aggregate QueryExecution — df's own adaptive plan would still
      // be un-executed (executedPlan == initialPlan, zero query
      // stages) and a runtime reroute invisible. Drive df's own plan
      // to its final stages once, untimed, then read the histogram.
      df.queryExecution.toRdd.count()
      val hist = scala.collection.mutable.Map.empty[String, Int]
      def visit(p: SparkPlan): Unit = {
        val key = p.nodeName.split("[ (]")(0)
        hist(key) = hist.getOrElse(key, 0) + 1
        p match {
          case a: AdaptiveSparkPlanExec => visit(a.executedPlan)
          case s: QueryStageExec => visit(s.plan)
          case _ => ()
        }
        p.children.foreach(visit)
      }
      visit(df.queryExecution.executedPlan)
      val canon = hist.toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(";")
      java.security.MessageDigest.getInstance("MD5")
        .digest(canon.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
    } catch { case _: Throwable => "err" }
}
