package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[LanguageModel.bigramNll]]: hand-computed scores on a toy corpus,
  * short-doc exclusion, and exact partition invariance of the
  * sorted-fold mean. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("matches hand-computed add-k bigram NLL") {
    // corpus: B(a,b)=2, B(b,a)=1; C(a)=2, C(b)=1; V=2; k=0.5
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = LanguageModel.bigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll"))).toMap
    def nll(b: Double, c: Double): Double =
      -math.log((b + 0.5) / (c + 0.5 * 3)) / math.log(2)
    // V counts "solo" too: vocab = {a, b, solo} = 3
    val ab = nll(2, 2); val ba = nll(1, 1)
    assert(out(1L)._1 == 2)
    assert(math.abs(out(1L)._2 - (ab + ba) / 2) < 1e-12)
    assert(out(2L)._1 == 1)
    assert(math.abs(out(2L)._2 - ab) < 1e-12)
    assert(!out.contains(3L), "single-token docs have no bigrams")
  }

  test("scores are bit-identical at any input partitioning") {
    val docs = (1 to 200).map { i =>
      (i.toLong, (0 until 20).map(j => s"w${(i * 7 + j * 3) % 13}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val one = LanguageModel.bigramNll(docs.repartition(1),
      "doc_id", "text").collect().map(r => (r.getLong(0), r.getDouble(2)))
    val many = LanguageModel.bigramNll(docs.repartition(13),
      "doc_id", "text").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(one.sortBy(_._1).toSeq == many.sortBy(_._1).toSeq,
      "sorted-fold mean must be exactly partition-invariant")
  }
}
