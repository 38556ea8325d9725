package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus-trained bigram language model scoring — the
  * perplexity-filter step of LLM data pipelines (CCNet-style: score
  * every document by how surprising its token sequence is under a
  * model trained ON the corpus itself; outliers at both ends are
  * gibberish or boilerplate). The reference has no LM surface — this
  * belongs to the engine's training-data suite alongside quality/
  * langid/dedup.
  *
  * Model: add-k smoothed bigram conditional,
  * `P(w|p) = (B(p,w) + k) / (C(p) + k·V)` with B = bigram count,
  * C = context count (occurrences of `p` with a successor), V = corpus
  * vocabulary size. Per-document score = mean of `-log2 P` over the
  * document's bigrams (documents with < 2 tokens have no bigrams and
  * no score row).
  *
  * Scale shape: tokenize+explode (narrow) → per-doc lag window
  * (shuffle on doc id) → two count aggregations (partial+final, keys
  * are bigrams/contexts) → score joins on (prev, tok) and prev. The
  * context join key is Zipf-skewed ("the" dominates) — AQE skew
  * splitting handles it, or salt via [[Skew.saltedJoin]] at extreme
  * corpus sizes. V is one driver scalar.
  *
  * Determinism: the per-document mean is computed by summing the
  * token NLLs in SORTED order (collect per doc, sort, fold) — double
  * addition is order-sensitive at the ulp level and a plain `avg`
  * would drift across partitionings; documents are bounded (chunked
  * upstream), so the per-doc collect is a few hundred doubles. */
object LanguageModel {

  def bigramNll(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, "bigramNll: smoothing k must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol)))).toDF("doc_id", "pos", "tok")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // cached once: `bi` (tokenize + per-doc lag window — the expensive
    // shuffle) feeds the context agg, the bigram agg AND the final
    // per-occurrence score join; `toks` additionally feeds the vocab
    // scalar. Without the persist each branch re-runs the whole
    // lineage (the same recompute hazard minHashPairs documents).
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bi = toks
      .withColumn("prev", lag("tok", 1).over(w))
      .where(col("prev").isNotNull)
      .select("doc_id", "prev", "tok")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val contexts = bi.groupBy("prev").agg(count(lit(1)).as("c_n"))
    val bigrams = bi.groupBy("prev", "tok").agg(count(lit(1)).as("b_n"))
    val vocab = toks.agg(countDistinct(col("tok"))).head().getLong(0)

    val nll: Column = -log2(
      (col("b_n") + lit(k)) / (col("c_n") + lit(k * vocab)))
    val scored = bi.join(bigrams, Seq("prev", "tok"))
      .join(contexts, Seq("prev"))
      .withColumn("nll", nll)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(col("nll"))).as("__nlls"))
      .withColumn("avg_nll",
        aggregate(col("__nlls"), lit(0.0), (acc, x) => acc + x) /
          col("n_bigrams"))
      .drop("__nlls")
    Dedup.materializeAndRelease(scored, toks, bi)
  }
}
