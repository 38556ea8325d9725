package graft.operators

import graft.SparkSpec

/** Greedy packing semantics: capacity respected, doc order preserved
  * within a bucket, overflow starts a new sequence, oversized docs
  * form singletons at the capacity, and results are layout-invariant. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def toksOf(n: Int): String = Seq.fill(n)("w").mkString(" ")

  private def pack(rows: Seq[(Long, String)], cap: Int, buckets: Int = 1) =
    Packing.packGreedy(rows.toDF("doc_id", "text"), "doc_id", "text",
        cap, buckets)
      .orderBy("bucket", "seq_id", "doc_id")
      .as[(Int, Long, Long, Long)].collect()

  test("greedy fill: overflow starts a new sequence, order preserved") {
    // token counts 4,3,2,5,1 at capacity 8: [4,3] [2,5,1]
    val out = pack(Seq(1L -> toksOf(4), 2L -> toksOf(3), 3L -> toksOf(2),
      4L -> toksOf(5), 5L -> toksOf(1)), cap = 8)
    assert(out.map(r => (r._2, r._3)).toSeq ===
      Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    // no sequence exceeds the capacity
    out.groupBy(r => (r._1, r._2)).values.foreach(g =>
      assert(g.map(_._4).sum <= 8))
  }

  test("oversized docs count at capacity and pack as singletons") {
    val out = pack(Seq(1L -> toksOf(100), 2L -> toksOf(3)), cap = 8)
    assert(out.head._4 === 8L) // clamped token count
    assert(out.map(_._2).toSeq === Seq(0L, 1L)) // 2 cannot join 1's seq
  }

  test("zero-token docs ride the current sequence") {
    val out = pack(Seq(1L -> toksOf(8), 2L -> "", 3L -> toksOf(1)), cap = 8)
    // doc 2 (0 tokens) fits seq 0 even though it is full; doc 3 opens
    // seq 1
    assert(out.map(r => (r._2, r._3)).toSeq ===
      Seq((0L, 1L), (0L, 2L), (1L, 3L)))
  }

  test("buckets pack independently; result is layout-invariant") {
    val rows = (1L to 40L).map(i => i -> toksOf((i % 7 + 1).toInt))
    val a = pack(rows, cap = 10, buckets = 4)
    assert(a.map(_._1).distinct.sorted === Array(0, 1, 2, 3))
    a.groupBy(r => (r._1, r._2)).values.foreach(g =>
      assert(g.map(_._4).sum <= 10))
    val b = Packing.packGreedy(rows.toDF("doc_id", "text").repartition(7),
        "doc_id", "text", 10, 4)
      .orderBy("bucket", "seq_id", "doc_id")
      .as[(Int, Long, Long, Long)].collect()
    assert(b.toSeq === a.toSeq)
  }

  test("invalid parameters are rejected") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Packing.packGreedy(df, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](
      Packing.packGreedy(df, "doc_id", "text", 8, 0))
  }
}
