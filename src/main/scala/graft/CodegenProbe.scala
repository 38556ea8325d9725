package graft
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = BenchSession.build()
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries(args.headOption.getOrElse("q124_pq_indexed"))(spark, dir)
    df.collect() // execute THIS plan (AQE materializes codegen per executed stage)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val s = org.apache.spark.sql.execution.debug.codegenString(plan)
    println("HEAD>>> " + s.linesIterator.take(4).mkString(" | "))
    println("CODEGEN mentions: " +
      "WholeStageCodegen=" + "WholeStageCodegen".r.findAllIn(s).length +
      " PqAdcDot=" + "(?i)pqadcdot".r.findAllIn(s).length)
    spark.stop()
  }
}
