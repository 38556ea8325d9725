package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Everything here is HASH-based, not RNG-based: the assignment of a row
  * depends only on its id (and the seed), so splits are reproducible
  * across runs, cluster sizes, and partitionings — the property that
  * matters when a 100 TB corpus is re-processed incrementally and rows
  * must stay in the split they were first assigned to.
  */
object Sampling {

  /** Bucket in [0, buckets) for an id column — the primitive under both
    * splitting and sampling.
    *
    * NULL ids all hash to one bucket (xxhash64 skips null inputs), so
    * null-id rows are sampled/split all-or-nothing — with no identity
    * there is no per-row deterministic choice. Synthesize ids (or
    * filter nulls) before sampling if that matters. */
  def hashBucket(id: Column, buckets: Int, seed: Long): Column =
    pmod(xxhash64(id, lit(seed)), lit(buckets.toLong)).cast("int")

  /** Assign each row a named split by hash-weighted buckets.
    * `weights` maps split name → relative weight (normalized internally;
    * resolution is 1/10000). Deterministic per (id, seed). */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      weights: Seq[(String, Double)],
      seed: Long = 42L,
      splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0))
    val total = weights.map(_._2).sum
    val buckets = 10000
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) =>
      acc + w / total * buckets
    }.tail.map(_.round.toInt)
    val b = hashBucket(col(idCol), buckets, seed)
    val expr = weights.map(_._1).zip(bounds).reverse
      .foldLeft(lit(weights.last._1)) { case (acc, (name, hi)) =>
        when(b < hi, lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic fraction sample: keep ~fraction of rows by id hash. */
  def deterministicSample(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    val buckets = 1000000
    df.where(hashBucket(col(idCol), buckets, seed) <
      (fraction * buckets).round.toInt)
  }

  /** Stratified deterministic sample: per-stratum fractions (missing
    * strata default to `defaultFraction`). Hash-based, so repeatable —
    * unlike `DataFrame.stat.sampleBy`, which is RNG-per-partition. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    val buckets = 1000000
    val b = hashBucket(col(idCol), buckets, seed)
    val cutoff = fractions.foldLeft(
      lit((defaultFraction * buckets).round.toInt)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum,
          lit((f * buckets).round.toInt)).otherwise(acc)
    }
    df.where(b < cutoff)
  }

  /** EXACT-size deterministic stratified sample: the `k` rows of each
    * stratum whose `md5(key)` sorts first — hash order is uniform over
    * the keys, so this is an unbiased fixed-size draw that is fully
    * reproducible (same rows at any parallelism, any engine that agrees
    * on md5). The fraction-based samplers above can't promise exact
    * per-stratum counts; this one can, at the cost of a per-stratum
    * window sort — shuffle on the stratum column only, rank state is a
    * single counter per stratum. A dominant stratum is the usual window
    * skew case: pre-filter or split it before asking for exact-k.
    * `rankCol` (1..k, hash order) is kept — it is the reproducible
    * "which draw" label.
    *
    * Precondition: `keyCol` uniquely identifies rows within a stratum.
    * Duplicate key values tie under (md5(key), key) and row_number then
    * breaks the tie by partition order — the reproducibility promise
    * only holds for unique keys (synthesize one first otherwise). */
  def stratifiedTopK(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      k: Int,
      rankCol: String = "draw_rank"): DataFrame = {
    require(k > 0, "stratifiedTopK: k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn(rankCol, row_number().over(w))
      .where(col(rankCol) <= k)
  }
}
