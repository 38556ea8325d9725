package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for selected queries so
  * scale posture is reviewable (PushedFilters reaching the parquet scan,
  * ReadSchema pruned to used columns, broadcast vs sort-merge joins,
  * WholeStageCodegen spans). Usage:
  *   runMain graft.ExplainAudit [sfDir] [query ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q02_filter_pushdown", "q03_star_join",
        "q04_broadcast_join", "q15_asof_join", "q16_interval_points",
        "q38_minhash_pairs", "q40_cosine_topk", "q43_lsh_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
