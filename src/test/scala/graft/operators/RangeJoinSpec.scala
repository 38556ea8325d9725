package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval: inclusive bounds, key-scoped, bucket-spanning") {
    val iv = Seq(("i1", "k1", 100L, 300L), ("i2", "k2", 100L, 300L))
      .toDF("iid", "k", "lo", "hi")
    val pts = Seq(("p1", "k1", 100L), ("p2", "k1", 300L), ("p3", "k1", 301L),
      ("p4", "k2", 200L), ("p5", "k1", 50L)).toDF("pid", "k", "t")
    // bucketWidth 60 → interval spans buckets 1..5 (explosion + refine)
    val out = RangeJoin.pointInInterval(iv, pts, Seq("k"), "lo", "hi", "t", 60L)
      .select("iid", "pid").as[(String, String)].collect().toSet
    assert(out === Set(("i1", "p1"), ("i1", "p2"), ("i2", "p4")))
  }

  test("intervalOverlap: intersecting pairs only, deduped across buckets") {
    val a = Seq(("a1", "k", 0L, 100L), ("a2", "k", 500L, 600L))
      .toDF("ida", "k", "lo_a", "hi_a")
    val b = Seq(("b1", "k", 90L, 200L), ("b2", "k", 101L, 200L),
      ("b3", "k", 550L, 560L)).toDF("idb", "k", "lo_b", "hi_b")
    val out = RangeJoin.intervalOverlap(a, b, Seq("k"),
        "lo_a", "hi_a", "lo_b", "hi_b", "ida", "idb", bucketWidth = 50L)
      .select("ida", "idb").as[(String, String)].collect().toSet
    // a1∩b1 (90-100), a1∩b2 empty (101>100), a2⊇b3
    assert(out === Set(("a1", "b1"), ("a2", "b3")))
    // dedup: a1/b1 overlap spans buckets 1-2 but appears once
    val cnt = RangeJoin.intervalOverlap(a, b, Seq("k"),
      "lo_a", "hi_a", "lo_b", "hi_b", "ida", "idb", bucketWidth = 50L).count()
    assert(cnt === 2)
  }
}
