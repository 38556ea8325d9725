package graft

/** Throwaway diagnostic for the q25–q27 median drift (VERDICT r5 #4):
  * times the three cheapest ETL queries under the three between-run
  * protocols the bench has used across rounds, and reports the
  * whole-stage-codegen compile count per run so janino recompilation
  * is visible. Not part of the bench surface. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchSession.build()
    val names = sys.env.get("PROBE_QUERIES")
      .map(_.split(",").toSeq.map(_.trim))
      .getOrElse(Seq("q25_referential_orphans", "q26_parse_timestamps",
        "q27_sanitize_names"))
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    def releaseAll(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def compiles(): Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    def releaseAllBlocking(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    for (proto <- Seq("A_releaseAll_gc", "B_gc_only", "C_nothing",
        "D_blocking_settle")) {
      println(s"PROTO $proto")
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        val runs = (1 to 5).map { _ =>
          proto match {
            case "A_releaseAll_gc" => releaseAll(); System.gc()
            case "B_gc_only" => System.gc()
            case "D_blocking_settle" =>
              releaseAllBlocking(); System.gc(); Thread.sleep(100)
            case _ => ()
          }
          val c0 = compiles()
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          f"$sec%.3f(c${compiles() - c0})"
        }
        println(s"  $n ${runs.mkString(" ")}")
      }
    }
    spark.stop()
  }
}
