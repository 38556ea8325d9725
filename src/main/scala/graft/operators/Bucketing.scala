package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables ON WRITE so repeated
  * joins/aggregations on the bucket key run shuffle-free (SURVEY §4's
  * replacement for the reference's join-key B-tree indexes,
  * create_tables.sql:78-81).
  *
  * At 100 TB the win compounds: every (fact ⋈ fact) on the bucket key
  * skips both sides' exchanges; bucket pruning cuts scans for point
  * lookups on the bucket column.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. `buckets` should be
    * sized so one bucket ≈ one healthy task (128-512 MB of data). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** True if the physical plan of `df` contains no shuffle exchange of
    * any kind (hash, range, single-partition) — the check that a
    * bucketed join actually avoided the shuffle. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange ")
}
