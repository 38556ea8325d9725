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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        // let the ContextCleaner drop prior queries' broadcasts/shuffles
        // (they're GC-triggered; a 24g heap GCs too rarely on its own,
        // and accumulated state bleeds into later timings)
        System.gc()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
