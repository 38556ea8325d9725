package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min sketch: one-sided error, exactness at generous width,
  * partition-layout invariance (the merge must be exact under any
  * parallelism), null handling. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (
    Seq.fill(100)("alpha") ++ Seq.fill(40)("beta") ++
      Seq.fill(7)("gamma") ++ Seq("delta") ++
      Seq(null.asInstanceOf[String])
    ).toDF("w")

  test("estimates are one-sided: est >= true, exact at generous width") {
    val sk = Sketches.buildSketch(corpus, "w", depth = 4, width = 4096)
    assert(sk.estimate("alpha") === 100L)
    assert(sk.estimate("beta") === 40L)
    assert(sk.estimate("gamma") === 7L)
    assert(sk.estimate("delta") === 1L)
    assert(sk.totalCount === 148L) // null contributes nothing
  }

  test("narrow sketch over-estimates, never under-estimates") {
    // width 4 forces collisions: every estimate must still be >= true
    val sk = Sketches.buildSketch(corpus, "w", depth = 2, width = 4)
    assert(sk.estimate("alpha") >= 100L)
    assert(sk.estimate("beta") >= 40L)
    assert(sk.estimate("gamma") >= 7L)
    // and the grid total per depth row is exactly N
    assert(sk.totalCount === 148L)
  }

  test("sketch is partition-layout invariant") {
    val a = Sketches.buildSketch(corpus.repartition(1), "w")
    val b = Sketches.buildSketch(corpus.repartition(7), "w")
    assert(a.grid.toSeq === b.grid.toSeq)
  }

  test("estimateCounts maps candidates without a shuffle") {
    val sk = Sketches.buildSketch(corpus, "w", depth = 4, width = 4096)
    val cands = Seq("alpha", "gamma", "never-seen").toDF("w")
    val got = Sketches.estimateCounts(spark, cands, "w", sk)
      .as[(String, Long)].collect().toMap
    assert(got("alpha") === 100L)
    assert(got("gamma") === 7L)
    assert(got("never-seen") >= 0L) // may collide, never negative
    val plan = Sketches.estimateCounts(spark, cands, "w", sk)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("estimateCounts treats null candidates as absence, like build") {
    val sk = Sketches.buildSketch(corpus, "w")
    val cands = Seq(Some("alpha"), None, Some("gamma")).toDF("w")
    val got = Sketches.estimateCounts(spark, cands, "w", sk).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got(Some("alpha")) === 100L)
    assert(got(None) === 0L, "null probes estimate 0, mirroring reduce")
  }
}
