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
    // `events.ts` has been written by the driver as either parquet
    // TIMESTAMP(NANOS) — which Spark 4 cannot read as a timestamp
    // ([PARQUET_TYPE_ILLEGAL]), so we read it as a raw nanos long via the
    // legacy conf and floor-truncate to micros (matching DuckDB's ns→µs
    // truncation) — or as plain TIMESTAMP_MICROS, which loads directly.
    // Dispatch on the loaded dtype so either encoding works; anything
    // else is a named error rather than 18 cryptic downstream failures.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampType}
      df.schema("ts").dataType match {
        case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => df
        case other => throw new IllegalStateException(
          s"Tables.load: events.ts loaded as $other; expected LongType " +
          "(nanos-as-long) or TimestampType (micros) — the driver's " +
          "testdata encoding changed again, update Tables.load")
      }
    } else df
  }

  /** Register every table as a temp view so Spark SQL mirrors the DuckDB
    * oracle's naming convention (file basename = table name). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
