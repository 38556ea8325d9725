package graft.operators

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry durian")).toDF("doc_id", "text")

  test("tf, df, and score computed per definition") {
    val s = TfIdf.scores(docs, "doc_id", "text")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => (r._2, r._1) -> ((r._3, r._4, r._5))).toMap
    // apple: tf=2 in doc1, df=1 → 2·ln(3)
    val (tfA, dfA, scoreA) = s((1L, "apple"))
    assert(tfA === 2 && dfA === 1)
    assert(math.abs(scoreA - 2 * math.log(3.0)) < 1e-12)
    // banana: df=2 → ln(3/2)
    assert(math.abs(s((2L, "banana"))._3 - math.log(1.5)) < 1e-12)
  }

  test("topTerms ranks rare terms above common ones") {
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(top(1L) === "apple")  // rare + frequent in doc
    // cherry: 2·ln(3/2)=0.811 < durian: 1·ln(3)=1.099 → rarity wins
    assert(top(3L) === "durian")
  }
}
