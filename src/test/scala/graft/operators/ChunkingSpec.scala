package graft.operators

import graft.SparkSpec

/** Window math for the token chunker: coverage (every token in ≥ 1
  * chunk), overlap (adjacent chunks share exactly `overlap` tokens on
  * interior boundaries), chunk counts at the edge sizes, and empty
  * handling. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def toksOf(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  private def chunks(text: String, size: Int, overlap: Int) =
    Chunking.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, overlap)
      .orderBy("chunk_idx")
      .as[(Long, Long, String, Long)].collect()

  test("short doc: one chunk, full text") {
    val out = chunks(toksOf(5), size = 8, overlap = 2)
    assert(out.length === 1)
    assert(out.head._3 === toksOf(5) && out.head._4 === 5L)
  }

  test("exact-size doc: one chunk (no window made only of overlap)") {
    val out = chunks(toksOf(8), size = 8, overlap = 2)
    assert(out.length === 1)
  }

  test("overlapping windows cover every token and share the overlap") {
    val out = chunks(toksOf(20), size = 8, overlap = 2)
    // step 6: starts 0,6,12 -> ceil((20-8)/6)+1 = 3 chunks
    assert(out.length === 3)
    assert(out.map(_._4).toSeq === Seq(8L, 8L, 8L))
    val words = out.map(_._3.split(" ").toSeq)
    // coverage: union of chunks = all 20 tokens
    assert(words.flatten.toSet === (1 to 20).map(i => s"t$i").toSet)
    // interior boundaries share exactly `overlap` tokens
    assert(words(0).takeRight(2) === words(1).take(2))
    assert(words(1).takeRight(2) === words(2).take(2))
  }

  test("ragged tail chunk is shorter but never empty") {
    val out = chunks(toksOf(10), size = 8, overlap = 2)
    // step 6: starts 0,6 -> chunk 1 has tokens 7..10 (4 tokens)
    assert(out.length === 2)
    assert(out.last._4 === 4L)
    assert(out.last._3 === (7 to 10).map(i => s"t$i").mkString(" "))
  }

  test("zero-token and whitespace docs produce zero chunks") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(df, "doc_id", "text", 8, 2)
      .as[(Long, Long, String, Long)].collect()
    assert(out.map(_._1).toSeq === Seq(3L))
  }

  test("invalid parameters are rejected") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Chunking.chunkTokens(df, "doc_id", "text", 0, 0))
    intercept[IllegalArgumentException](
      Chunking.chunkTokens(df, "doc_id", "text", 8, 8))
  }
}
