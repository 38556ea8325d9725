package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens/tokenCount: whitespace split, empties dropped") {
    val out = Seq("  a  bb\tccc\nd  ", "", "   ").toDF("s")
      .select(tokenCount($"s").as("n")).as[Int].collect()
    assert(out === Array(4, 0, 0))
  }

  test("wordShingles n=2") {
    val out = Seq("a b c d").toDF("s")
      .select(wordShingles($"s", 2).as("g")).as[Seq[String]].head()
    assert(out === Seq("a b", "b c", "c d"))
  }

  test("charNgrams n=3 distinct") {
    val out = Seq("abcabc").toDF("s")
      .select(charNgrams($"s", 3).as("g")).as[Seq[String]].head()
    assert(out === Seq("abc", "bca", "cab"))
  }

  test("ratios on a crafted doc") {
    val doc = "Ab1! x" // non-space chars: A b 1 ! x → 5; punct 1; digit 1
    val row = Seq(doc).toDF("s").select(
      punctRatio($"s").as("p"), digitRatio($"s").as("d"),
      upperRatio($"s").as("u")).as[(Double, Double, Double)].head()
    assert(row._1 === 0.2)
    assert(row._2 === 0.2)
    assert(row._3 === 1.0 / 3.0) // letters A,b,x → 1 upper of 3
  }

  test("stopwordRatio counts duplicate stopword tokens") {
    val out = Seq("the cat the dog").toDF("s")
      .select(stopwordRatio($"s").as("r")).as[Double].head()
    assert(out === 0.5)
  }

  test("langId distinguishes obvious languages; und on no hits") {
    val out = Seq(
      "the cat sat on the mat and it is happy",
      "der hund ist nicht mit der katze und das ist gut",
      "le chat est dans la maison et il est content",
      "el perro es grande y los gatos son pequeños para una casa",
      "zzz qqq www").toDF("s")
      .select(langId($"s").as("l")).as[String].collect()
    assert(out === Array("en", "de", "fr", "es", "und"))
  }

  test("fingerprint: deterministic, whitespace-normalized, golden value") {
    def poly(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val out = Seq("hello world", "hello   world", "hello worlds",
      "\thello \n world\r\n").toDF("s")
      .select(fingerprint($"s").as("f")).as[Long].collect()
    assert(out(0) === poly("hello world"))
    assert(out(0) === out(1)) // collapse internal whitespace
    assert(out(0) !== out(2))
    // edge tabs/newlines strip like spaces — the explicit-class
    // normalization the DuckDB q36 mirror reproduces byte-for-byte
    assert(out(3) === out(0))
  }

  test("simHash: identical→0 hamming, similar→small, disjoint→large") {
    val df = Seq(
      "spark query engine with fast joins and windows over data",
      "spark query engine with fast joins and windows over rows",
      "completely different words about cooking pasta tonight").toDF("s")
    val h = df.select(simHash($"s").as("h")).as[Long].collect()
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0), h(0)) === 0)
    assert(ham(h(0), h(1)) < ham(h(0), h(2)))
    assert(ham(h(0), h(1)) <= 12)
  }

  test("bpeishTokenCount splits words and punctuation runs") {
    val out = Seq("hello, world! x2").toDF("s")
      .select(bpeishTokenCount($"s").as("n")).as[Int].head()
    // hello | , | world | ! | x2  (boundaries only at alnum/non-alnum)
    assert(out === 5)
  }

  test("nfcNormalize composes, preserves compatibility chars, " +
      "unifies fingerprints") {
    val rows = Seq(
      ("e\u0301", "composes"),   // e + combining acute -> U+00E9
      ("\uFB01", "ligature"),    // NFC keeps the fi ligature (NFKC expands)
      ("\u212B", "angstrom"),    // ANGSTROM SIGN -> U+00C5
      ("plain ascii", "identity"),
      (null.asInstanceOf[String], "null")).toDF("s", "why")
    val out = rows.select($"why", nfcNormalize($"s").as("n"))
      .as[(String, String)].collect().toMap
    assert(out("composes") === "\u00E9")
    assert(out("ligature") === "\uFB01")
    assert(out("angstrom") === "\u00C5")
    assert(out("identity") === "plain ascii")
    assert(out("null") === null)
    // the point of the operator: canonically equivalent spellings hash
    // identically after normalization
    val fps = Seq("Caf\u00E9", "Cafe\u0301").toDF("s")
      .select(fingerprint(nfcNormalize($"s"))).as[Long].collect()
    assert(fps(0) === fps(1))
    val fpsRaw = Seq("Caf\u00E9", "Cafe\u0301").toDF("s")
      .select(fingerprint($"s")).as[Long].collect()
    assert(fpsRaw(0) !== fpsRaw(1)) // and differently WITHOUT it
  }
}
