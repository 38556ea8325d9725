package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BloomPrune]]: no false negatives (every true join row survives the
  * probe), real selectivity on disjoint keys, value transparency of the
  * pruned join, string keys, and the outer-join guard. */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("probe passes every built key (no false negatives)") {
    val dim = (1L to 1000L).map(i => (i, s"d$i")).toDF("k", "v")
    val bf = BloomPrune.keyFilter(dim, "k")
    val probed = dim.where(BloomPrune.mightContain(col("k"), bf))
    assert(probed.count() == 1000)
  }

  test("probe rejects almost all disjoint keys at fpp 0.01") {
    val dim = (1L to 1000L).toDF("k")
    val bf = BloomPrune.keyFilter(dim, "k", fpp = 0.01)
    val outside = (100001L to 110000L).toDF("k")
    val falsePositives =
      outside.where(BloomPrune.mightContain(col("k"), bf)).count()
    assert(falsePositives < 500,
      s"fpp 0.01 should reject >95% of 10k disjoint keys, $falsePositives passed")
  }

  test("bloomPrunedJoin equals the plain join (inner and left_semi)") {
    val fact = (1L to 5000L).map(i => (i, i % 400, s"f$i"))
      .toDF("row_id", "fk", "payload")
    val dim = (0L until 400L by 7).map(i => (i, s"dim$i")).toDF("dk", "dv")
    val plain = fact.join(dim, col("fk") === col("dk"))
    val pruned = BloomPrune.bloomPrunedJoin(fact, dim, "fk", "dk")
    assert(pruned.count() == plain.count() && plain.count() > 0)
    assert(pruned.except(plain).isEmpty && plain.except(pruned).isEmpty)

    val plainSemi = fact.join(dim, col("fk") === col("dk"), "left_semi")
    val prunedSemi =
      BloomPrune.bloomPrunedJoin(fact, dim, "fk", "dk", joinType = "left_semi")
    assert(prunedSemi.except(plainSemi).isEmpty &&
      plainSemi.except(prunedSemi).isEmpty)
  }

  test("null fact keys prune cleanly (inner-join equivalence holds)") {
    val fact = Seq((1L, Some(10L)), (2L, None), (3L, Some(99L)))
      .toDF("row_id", "fk")
    val dim = Seq((10L, "a")).toDF("dk", "dv")
    val pruned = BloomPrune.bloomPrunedJoin(fact, dim, "fk", "dk")
    val plain = fact.join(dim, col("fk") === col("dk"))
    assert(pruned.collect().toSet == plain.collect().toSet)
    assert(pruned.count() == 1)
  }

  test("string keys hash identically on build and probe sides") {
    val dim = (1 to 500).map(i => s"key_$i").toDF("k")
    val bf = BloomPrune.keyFilter(dim, "k")
    assert(dim.where(BloomPrune.mightContain(col("k"), bf)).count() == 500)
    val outside = (1 to 500).map(i => s"other_$i").toDF("k")
    val fp = outside.where(BloomPrune.mightContain(col("k"), bf)).count()
    assert(fp < 50, s"string probe should reject most outsiders, $fp passed")
  }

  test("outer joins are rejected") {
    val df = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      BloomPrune.bloomPrunedJoin(df, df, "k", "k", joinType = "left_outer")
    }
    assert(e.getMessage.contains("bloom-prunable"))
  }
}
