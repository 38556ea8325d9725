package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

class MinHashUnionAggSpec extends SparkSpec {
  import spark.implicits._

  test("union signature == signature of concatenated corpus") {
    val docs = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("a", "pack my box with five dozen liquor jugs"),
      ("b", "sphinx of black quartz judge my vow today")).toDF("src", "text")
    val k = 16
    val agg = new MinHashUnionAgg(k)
    val perSource = docs
      .select(col("src"),
        Dedup.minHashSignature(col("text"), 2, k).as("sig"))
      .as[(String, Seq[Long])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("usig"))
      .collect().toMap
    // elementwise min property: union sig of source a == min of its docs
    val sigs = docs.where($"src" === "a")
      .select(Dedup.minHashSignature(col("text"), 2, k)).as[Seq[Long]]
      .collect()
    val expected = (0 until k).map(i => sigs.map(_(i)).min)
    assert(perSource("a") === expected)
  }

  test("estimator: identical corpora ≈ 1, disjoint ≈ 0") {
    val a = Seq(1L, 2L, 3L, 4L)
    assert(MinHashUnionAgg.estimateJaccard(a, a) === 1.0)
    assert(MinHashUnionAgg.estimateJaccard(a, Seq(9L, 8L, 7L, 6L)) === 0.0)
    assert(MinHashUnionAgg.estimateJaccard(a, Seq(1L, 2L, 7L, 6L)) === 0.5)
  }

  test("cross-source overlap estimate tracks true Jaccard on real docs") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val k = 64
    val agg = new MinHashUnionAgg(k)
    val sigs = docs
      .select(col("source"),
        Dedup.minHashSignature(col("text"), 1, k).as("sig"))
      .as[(String, Seq[Long])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("usig"))
      .collect().toMap
    // true unigram-set jaccard between two sources
    def tokens(src: String): Set[String] = docs
      .where(col("source") === src)
      .select(explode(TextFunctions.tokens(col("text")))).as[String]
      .collect().toSet
    val (ta, tb) = (tokens("src0"), tokens("src1"))
    val truth = (ta & tb).size.toDouble / (ta | tb).size
    val est = MinHashUnionAgg.estimateJaccard(sigs("src0"), sigs("src1"))
    info(f"true=$truth%.3f est=$est%.3f (k=$k)")
    assert(math.abs(est - truth) < 0.25) // ±2σ at k=64 is ~0.125
  }
}
