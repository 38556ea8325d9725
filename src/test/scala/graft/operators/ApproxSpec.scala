package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Sketch accuracy: approx_count_distinct (HLL++) within its advertised
  * error on the real corpus — the q44 rows-only query's quality bound. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on testdata") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx"))
      .head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"exact=$exact approx=$approx")
  }

  test("percentile_approx within 1% of the exact median at scale accuracy") {
    // the sketch-quantile scale path (q19's exact percentiles are the
    // correctness oracle; this bounds the approximate variant's error)
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx"))
      .head()
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    assert(math.abs(approx - exact) / exact <= 0.01,
      s"exact=$exact approx=$approx")
  }

  test("higher precision (rsd) tightens the estimate") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.005).as("tight"))
      .head()
    assert(math.abs(row.getLong(1).toDouble - row.getLong(0)) /
      row.getLong(0) <= 0.01)
  }
}
