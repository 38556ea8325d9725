package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions._

/** Semantic clustering of an embedding corpus — the corpus-curation
  * operator a training pipeline runs between dedup and sampling (topic
  * balance, cluster-proportional sampling, outlier cells).
  *
  * [[assignToSeeds]] is the deterministic, fully oracle-checkable core:
  * every vector joins its most-similar of k SEED vectors (the k lowest
  * ids — no RNG, no iteration), by rounded cosine with seed-id
  * tie-break. This is exactly the distributed assignment step of an
  * IVF/k-means index (Similarity.ivfTopK runs the same argmax against
  * trained centroids); with deterministic seeds the whole computation
  * is reproducible in SQL, so the driver's hash gate covers the
  * assignment machinery that the IVF path can only invariant-check.
  *
  * Scale posture: seeds are a bounded driver collect (k rows — same
  * discipline as ivfTopK's trainCap); assignment is a NARROW projection
  * (small k: seed literals inlined, struct-argmax; large k·dim:
  * broadcast seed table + window — no shuffle of the vectors either
  * way). [[profile]] adds the one k-group aggregation.
  */
object Clustering {

  /** (vec_id, seed_id, sim): each non-zero-norm vector assigned to the
    * most-cosine-similar of the k lowest-id vectors. `sim` is rounded
    * to 4 decimals BEFORE the argmax so sub-ulp dot-product differences
    * cannot flip an assignment between engines; ties break to the
    * lowest seed_id. */
  def assignToSeeds(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      literalCellThreshold: Int = 4096): DataFrame = {
    require(k > 0, "k must be positive")
    val base = df.select(col(idCol).cast("long").as("id"),
        Similarity.normalized(col(vecCol)).as("u"))
      .where(col("u").isNotNull)
    val vecs = Par.spread(base)
    // bounded deterministic collect: the k lowest ids (TakeOrdered —
    // no full sort), k is index-sized, not data-sized
    val seeds: Array[(Long, Array[Double])] = base
      .orderBy(col("id").asc).limit(k)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    if (seeds.isEmpty)
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("seed_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sim",
            org.apache.spark.sql.types.DoubleType))))
    val dim = seeds.head._2.length
    if (seeds.length * dim <= literalCellThreshold) {
      // seeds inline as literals → struct-argmax, zero extra shuffles
      // (max struct = highest sim, then highest -seed_id = lowest seed)
      val scores = array(seeds.toIndexedSeq.map { case (sid, sv) =>
        struct(
          round(dot(col("u"), typedLit(sv.toSeq)), 4).as("s"),
          lit(-sid).as("neg_seed"))
      }: _*)
      vecs.withColumn("best", array_max(scores))
        .select(col("id").as("vec_id"),
          (-col("best.neg_seed")).as("seed_id"),
          col("best.s").as("sim"))
    } else {
      // large k·dim: literals would blow janino limits — broadcast the
      // seed table and rank per vector (k rows per vector, k small)
      val spark = df.sparkSession
      import spark.implicits._
      val seedDf = seeds.toIndexedSeq
        .map { case (sid, sv) => (sid, sv.toSeq) }.toDF("seed_id", "su")
      val w = Window.partitionBy(col("id"))
        .orderBy(col("sim").desc, col("seed_id").asc)
      vecs.crossJoin(broadcast(seedDf))
        .withColumn("sim", round(dot(col("u"), col("su")), 4))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") === 1)
        .select(col("id").as("vec_id"), col("seed_id"), col("sim"))
    }
  }

  /** Per-cluster profile over [[assignToSeeds]] output: member count
    * and mean similarity to the seed. The mean goes through an exact
    * DECIMAL sum of the 4-decimal sims (double summation order is
    * partition-dependent; decimal is exact) and divides in double —
    * bit-identical in any engine that does the same. */
  def profile(assignments: DataFrame): DataFrame =
    assignments.groupBy(col("seed_id"))
      .agg(
        count(lit(1)).as("n_members"),
        round(sum(col("sim").cast(DecimalType(18, 4))).cast("double")
          / count(lit(1)), 6).as("mean_sim"))
}
