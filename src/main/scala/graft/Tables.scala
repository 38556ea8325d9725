package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Helpers to load the driver-provided parquet tables (see TESTDATA.md).
  *
  * Tables are plain parquet snapshots — the engine's storage model
  * (SURVEY.md §1.4): columnar parquet + named views, replacing the
  * reference's row-oriented Postgres (`sql/create_tables.sql:1-81`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 cannot read
    // as a timestamp ([PARQUET_TYPE_ILLEGAL]); read it as a raw nanos
    // long and truncate to micros (floor, matching DuckDB's ns→µs
    // truncation) so downstream code sees a normal TimestampType.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so Spark SQL mirrors the DuckDB
    * oracle's naming convention (file basename = table name). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
