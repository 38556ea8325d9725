package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("fuseTopK computes hand-checked RRF scores; items on both " +
      "lists outrank single-list items of the same depth") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.fuseTopK(lex, vec, "query_id", "doc_id", k = 4)
      .as[(Long, Long, Double, Int, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    def rrf(rs: Int*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 11 on both lists (ranks 2+1) beats every single-list item
    assert(out(11L) == ((rrf(2, 1), 1, 2L)))
    // 12 on both lists (3+3) still beats 10's single rank-1
    assert(out(12L) == ((rrf(3, 3), 2, 2L)))
    assert(out(10L) == ((rrf(1), 3, 1L)))
    assert(out(13L) == ((rrf(2), 4, 1L)))
  }

  test("fuseTopK cuts at k per query with deterministic tiebreak") {
    val lex = (1 to 10).map(i => (7L, i.toLong, i))
      .toDF("query_id", "doc_id", "rank")
    val vec = (1 to 10).map(i => (7L, (i + 100).toLong, i))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.fuseTopK(lex, vec, "query_id", "doc_id", k = 6)
      .as[(Long, Long, Double, Int, Long)].collect().sortBy(_._4)
    assert(out.length == 6)
    // equal scores at each input rank: lower doc_id wins the tie
    assert(out.map(_._2).toSeq == Seq(1L, 101L, 2L, 102L, 3L, 103L))
  }
}
