package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; quadratic — the correctness
  * oracle). Scale path: random-hyperplane LSH bucketing with multiple
  * tables — candidates only from shared buckets, then exact re-rank.
  * At 100 TB the bucketed join shuffles on (table, bucket) instead of
  * materializing the n² cross product.
  */
object Similarity {

  /** Exact brute-force cosine top-k neighbors for every vector.
    * Output: (query_id, neighbor_id, rank) — rank 1..k by cosine desc,
    * ties broken by neighbor_id asc (deterministic). */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundSim: Int = 4): DataFrame = {
    val a = df.select(col(idCol).as("query_id"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("neighbor_id"), col(vecCol).as("v_b"))
    val pairs = a.join(b, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("v_a"), col("v_b")), roundSim))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** LSH-bucketed approximate top-k: L independent random-hyperplane
    * tables of `bits` bits; candidate pairs share a bucket in ≥1 table;
    * exact cosine re-rank of candidates. Recall < 1 by construction —
    * verified against bruteForceTopK in tests. */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 8,
      tables: Int = 4,
      dim: Int = 64): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val sigs = base.select(
      col("id"), col("v"),
      posexplode(array((0 until tables).map(t =>
        rhpSignature(col("v"), bits, dim, seed = 1000L + t)): _*)))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")
    val a = sigs.select(col("table"), col("bucket"),
      col("id").as("query_id"), col("v").as("v_a"))
    val b = sigs.select(col("table"), col("bucket"),
      col("id").as("neighbor_id"), col("v").as("v_b"))
    val cands = a.join(b, Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", round(cosine(col("v_a"), col("v_b")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
