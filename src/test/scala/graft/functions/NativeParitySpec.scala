package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.operators.Dedup

/** Bit-for-bit parity between the native Catalyst expressions (tight
  * JIT loops) and their declarative HOF reference formulations, over the
  * real sf0.001 corpus. Any drift here would silently change signatures
  * and thus dedup/search results. */
class NativeParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(120)
  private lazy val emb =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(120)

  test("simHash native == declarative") {
    val diff = docs.select(
      simHash(col("text")).as("a"), simHashDeclarative(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("fingerprint native == declarative") {
    val diff = docs.select(
      fingerprint(col("text")).as("a"),
      fingerprintDeclarative(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("wordShingles native == declarative (n = 1, 2, 5)") {
    for (n <- Seq(1, 2, 5)) {
      val diff = docs.select(
        wordShingles(col("text"), n).as("a"),
        wordShinglesDeclarative(col("text"), n).as("b"))
        .where(col("a") =!= col("b")).count()
      assert(diff === 0, s"n=$n")
    }
    // edge shapes: fewer tokens than n, empty, whitespace-only
    val edge = Seq("one two", "one", "", "   ").toDF("text")
    val diff = edge.select(
      wordShingles(col("text"), 5).as("a"),
      wordShinglesDeclarative(col("text"), 5).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("charNgrams native == declarative (n = 2, 3)") {
    for (n <- Seq(2, 3)) {
      val diff = docs.select(
        charNgrams(col("text"), n).as("a"),
        charNgramsDeclarative(col("text"), n).as("b"))
        .where(col("a") =!= col("b")).count()
      assert(diff === 0, s"n=$n")
    }
    // multibyte code points exercise the byte-offset walk (UTF-8 2-3
    // byte chars must slice identically to substring's SQL semantics)
    val edge = Seq("ab", "a", "", "  spaced   out  ",
      "héllo wörld ünïcode", "日本語のテキスト です").toDF("text")
    val diff = edge.select(
      charNgrams(col("text"), 3).as("a"),
      charNgramsDeclarative(col("text"), 3).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("minHashSignature native == declarative") {
    val diff = docs.select(
      Dedup.minHashSignature(col("text"), 3, 16).as("a"),
      Dedup.minHashSignatureDeclarative(col("text"), 3, 16).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("cosine native == declarative (bit-exact doubles)") {
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .where(col("ia") < col("ib")).limit(2000)
    val diff = pairs.select(
      cosine(col("va"), col("vb")).as("a"),
      cosineDeclarative(col("va"), col("vb")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("rhpSignature native == declarative") {
    val diff = emb.select(
      rhpSignature(col("embedding"), 12, 64, 7L).as("a"),
      rhpSignatureDeclarative(col("embedding"), 12, 64, 7L).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("sq8ReconstructedDot native == the sq8CandidateScan closure formula") {
    // quantize real embeddings with the operator's own quantizer, score
    // consecutive pairs through BOTH paths
    val rows = emb.select($"vec_id", $"embedding").limit(60)
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) =>
        val arr = v.map(_.toDouble).toArray
        val n = math.sqrt(arr.map(x => x * x).sum)
        val u = arr.map(_ / n)
        val (q, mn, sc, sm) = graft.operators.Similarity.quantizeSq8(u)
        (id, q, mn, sc, sm)
      }
    val pairs = rows.zip(rows.tail)
    val df = pairs.toSeq.map { case ((ia, qa, mna, sca, sa), (ib, qb, mnb, scb, sb)) =>
      (ia, qa, mna, sca, sa, ib, qb, mnb, scb, sb)
    }.toDF("ia", "qa", "mna", "sca", "sa", "ib", "qb", "mnb", "scb", "sb")
    val native = df.select($"ia", $"ib",
        sq8ReconstructedDot($"qa", $"mna", $"sca", $"sa",
          $"qb", $"mnb", $"scb", $"sb").as("sim"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    pairs.foreach { case ((ia, qa, mna, sca, sa), (ib, qb, mnb, scb, sb)) =>
      val d = qa.length
      var mac = 0L
      var j = 0
      while (j < d) { mac += (qa(j) & 0xff).toLong * (qb(j) & 0xff).toLong; j += 1 }
      val expect = d * mna * mnb + mna * scb * sb + mnb * sca * sa + sca * scb * mac
      assert(java.lang.Double.doubleToLongBits(native((ia, ib))) ==
        java.lang.Double.doubleToLongBits(expect),
        s"pair ($ia,$ib): native ${native((ia, ib))} vs closure $expect")
    }
    // null and length-mismatch inputs yield null
    val edge = Seq(
      (Array[Byte](1, 2), 0.1, 0.2, 3L, Array[Byte](1, 2, 3), 0.1, 0.2, 3L))
      .toDF("qa", "mna", "sca", "sa", "qb", "mnb", "scb", "sb")
    assert(edge.select(sq8ReconstructedDot($"qa", $"mna", $"sca", $"sa",
        $"qb", $"mnb", $"scb", $"sb")).collect()(0).isNullAt(0))
  }

  test("null/edge inputs: empty text, null text") {
    val df = Seq(Some(""), Some("   "), None, Some("one two three"))
      .toDF("text")
    val out = df.select(
      simHash(col("text")).as("sh"),
      fingerprint(col("text")).as("fp"),
      simHashDeclarative(col("text")).as("shd"),
      fingerprintDeclarative(col("text")).as("fpd"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(2))
      assert(r.isNullAt(1) === r.isNullAt(3))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(2))
      if (!r.isNullAt(1)) assert(r.getLong(1) === r.getLong(3))
    }
  }
}
