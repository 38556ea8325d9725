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
}
