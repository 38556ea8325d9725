package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("assignSplits: deterministic, covers all rows, ~weighted") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Sampling.assignSplits(docs, "doc_id", w)
    val s2 = Sampling.assignSplits(docs.repartition(7), "doc_id", w)
    // identical assignment regardless of partitioning
    assert(s1.select("doc_id", "split").exceptAll(
      s2.select("doc_id", "split")).isEmpty)
    val counts = s1.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.sum === 500)
    assert(counts("train") > 350 && counts("train") < 450)
    assert(counts("val") > 20 && counts("val") < 80)
  }

  test("deterministicSample: stable subset, ~fraction") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.2)
    val b = Sampling.deterministicSample(docs, "doc_id", 0.2)
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).isEmpty)
    val n = a.count()
    assert(n > 60 && n < 140)
    // a smaller fraction is a SUBSET of a larger one (nested samples)
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1)
    assert(small.select("doc_id").exceptAll(a.select("doc_id")).isEmpty)
  }

  test("stratifiedSample: per-stratum fractions honored") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), defaultFraction = 0.5)
    val byLang = out.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(byLang("en") === totals("en")) // keep all
    assert(!byLang.contains("de"))        // drop all
    val frKept = byLang.getOrElse("fr", 0L).toDouble / totals("fr")
    assert(frKept > 0.25 && frKept < 0.75) // ~half
  }

  test("stratifiedTopK: exact k per stratum, partition-invariant") {
    val k = 7
    val out = Sampling.stratifiedTopK(docs, "lang", "doc_id", k)
    val sizes = out.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    totals.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(k.toLong, n),
        s"stratum $lang: expected min($k, $n), got ${sizes(lang)}")
    }
    assert(out.agg(org.apache.spark.sql.functions.max("draw_rank"))
      .head().getInt(0) <= k)
    // identical rows at any input partitioning — the property hash
    // ordering buys over RNG sampling
    val one = Sampling.stratifiedTopK(docs.repartition(1), "lang", "doc_id", k)
    val many = Sampling.stratifiedTopK(docs.repartition(13), "lang", "doc_id", k)
    assert(one.exceptAll(many).isEmpty && many.exceptAll(one).isEmpty)
  }
}
