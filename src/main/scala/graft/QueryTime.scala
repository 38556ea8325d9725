package graft



/** Ad-hoc single-query timer: `runMain graft.QueryTime <sfDir> <name>
  * [reps]` — same session config as Bench, prints one line per rep so
  * warm-vs-cold and plan-change effects are visible while tuning. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = BenchSession.build()
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      // release materialized-result caches so every rep re-executes
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"QT $name rep$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
