package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TF-IDF keyword scoring over a document corpus — the classic
  * text-relevance primitive, built from two aggregations and a join
  * (all partial-aggregatable; the doc-frequency table is tiny relative
  * to the corpus and broadcasts).
  *
  *   tf(t,d)  = count of t in d
  *   idf(t)   = ln(N / df(t))        (natural log, no smoothing — keeps
  *                                    the oracle formulation trivial)
  *   score    = tf · idf
  */
object TfIdf {

  /** Per-(doc, term) TF-IDF scores. */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = Par.spread(docs).select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    // tf feeds both the df aggregation and the final join — materialize
    // the tokenization once instead of three corpus scans
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    // N = ALL documents (incl. zero-token ones) per the tf-idf
    // definition; parquet count() is metadata-cheap
    val n = docs.count()
    tf.join(broadcast(df), Seq("term"))
      .withColumn("tfidf",
        col("tf") * log(lit(n.toDouble) / col("df")))
  }

  /** Top-k highest-scoring terms per document (ties by term asc). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int, roundTo: Int = 6): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scores(docs, idCol, textCol)
      .withColumn("score", round(col("tfidf"), roundTo))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("doc_id", "term", "score", "rnk")
  }

  /** Okapi BM25 retrieval: rank corpus documents for each query — the
    * standard lexical-retrieval primitive a curation pipeline uses for
    * targeted sourcing and contamination triage (the exact-overlap
    * sweep q56 covers membership; BM25 covers RANKED relevance).
    *
    *   idf(t)     = ln(1 + (N − df + 0.5) / (df + 0.5))
    *   score(q,d) = Σ_{t ∈ q ∩ d} idf·(tf·(k1+1)) / (tf + k1·(1 − b + b·len_d/avgdl))
    *
    * Shape is the inverted-index join, never query×corpus: postings
    * (term, doc, tf) shuffle by term, each query's DISTINCT terms
    * probe them, partial scores aggregate by (query, doc) — candidate
    * rows ∝ matching postings. The doc-frequency table broadcasts
    * (vocabulary-sized); doc lengths join by id. Per-term scores are
    * rounded to 10 dp and summed as DECIMAL(28,10), so the score is
    * summation-order-free (partition-layout-invariant and mirrorable
    * exactly — same posture as q60's decimal power sums).
    *
    * Output: (query_id, doc_id, score, rank), rank 1..k per query by
    * (score desc, doc_id asc). */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val terms = Par.spread(docs).select(col(idCol).cast("long").as("doc_id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    // one tokenization pass feeds tf, df, and the length table
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val lens = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
    val n = docs.count()
    val totalLen = lens.agg(sum(col("len"))).head.getLong(0)
    val avgdl = totalLen.toDouble / n
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = queries.select(col(qIdCol).cast("long").as("query_id"),
      explode(array_distinct(
        TextFunctions.tokens(lower(col(qTextCol))))).as("term"))
    val idf = log(lit(1.0) +
      (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("len") / lit(avgdl))
    val termScore = idf * ((col("tf") * lit(k1 + 1.0)) / denom)
    val scored = qterms
      .join(tf, Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .join(lens, Seq("doc_id"))
      .withColumn("s", round(termScore, 10).cast(DecimalType(28, 10)))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("s")).cast("double"), roundTo).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }
}
