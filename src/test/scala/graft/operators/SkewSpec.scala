package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq.tabulate(500) { i =>
    // heavy skew: 80% of rows share key 0
    (if (i % 5 == 0) i % 7 else 0, s"v$i", i.toDouble)
  }.toDF("k", "payload", "x")

  private def dims = Seq((0, "zero"), (1, "one"), (2, "two"), (3, "three"),
    (4, "four"), (5, "five"), (6, "six"), (9, "absent")).toDF("k", "name")

  test("saltedJoin inner ≡ plain inner join") {
    val plain = facts.join(dims, Seq("k"), "inner")
      .select("k", "payload", "x", "name")
    val salted = Skew.saltedJoin(facts, dims, "k", salt = 8)
      .select("k", "payload", "x", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin left ≡ plain left join (unmatched probe rows survive)") {
    val probe = facts.withColumn("k", when(col("x") < 3, lit(99)).otherwise(col("k")))
    val plain = probe.join(dims, Seq("k"), "left")
      .select("k", "payload", "x", "name")
    val salted = Skew.saltedJoin(probe, dims, "k", salt = 4, joinType = "left")
      .select("k", "payload", "x", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin salt is deterministic (no monotonic-id retry hazard)") {
    // same input → same scatter, row-for-row, across two evaluations —
    // the property a monotonically_increasing_id salt violates when a
    // stage retry re-enumerates rows
    val a = Skew.saltedJoin(facts, dims, "k", salt = 8).collect().toSet
    val b = Skew.saltedJoin(facts, dims, "k", salt = 8).collect().toSet
    assert(a === b)
  }

  test("keySkewProfile surfaces the dominant key first") {
    val top = Skew.keySkewProfile(facts, "k", topN = 1).collect()(0)
    assert(top.getInt(0) === 0)
  }
}
