package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-toolkit behavior: salted join equivalence, bucketed joins
  * actually eliminating the shuffle. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join (inner and left), skewed key spread") {
    val skewed = ((1 to 500).map(i => ("hot", i)) ++
      (1 to 20).map(i => (s"k$i", i))).toDF("key", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("kX", "Z")).toDF("key", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("key"), jt)
      val salted = Skew.saltedJoin(skewed, dim, "key", salt = 8, joinType = jt)
      assert(salted.count() === plain.count(), jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty, jt)
    }
  }

  test("keySkewProfile surfaces the dominant key first") {
    val df = ((1 to 100).map(_ => "hot") ++ Seq("a", "b")).toDF("key")
    val top = Skew.keySkewProfile(df, "key", topN = 1)
      .as[(String, Long)].head()
    assert(top === (("hot", 100L)))
  }

  test("bucketed join on the bucket key is shuffle-free") {
    val facts = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v")
    val dims = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "graft_facts_b", Seq("k"), 4)
    Bucketing.writeBucketed(dims, "graft_dims_b", Seq("k"), 4)
    // disable broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_facts_b")
        .join(spark.table("graft_dims_b"), "k")
      assert(joined.count() === 1000)
      assert(Bucketing.isShuffleFree(joined),
        joined.queryExecution.executedPlan.toString.take(2000))
      // sanity: the same join on unbucketed data DOES shuffle
      val unbucketed = facts.join(dims, "k")
      assert(!Bucketing.isShuffleFree(unbucketed))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }

  test("isShuffleFree: broadcast exchange is not a shuffle") {
    // a scan joined to a broadcast dim moves no rows between reducers —
    // the plan contains BroadcastExchange but no ShuffleExchange, and
    // must be reported shuffle-free (substring "Exchange" would lie)
    val facts = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v")
    Bucketing.writeBucketed(facts, "graft_facts_bc", Seq("k"), 4)
    try {
      val dims = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "name")
      val joined = spark.table("graft_facts_bc").join(broadcast(dims), "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastExchange") ||
        plan.contains("BroadcastQueryStage"), plan.take(1500))
      assert(Bucketing.isShuffleFree(joined), plan.take(1500))
    } finally spark.sql("DROP TABLE IF EXISTS graft_facts_bc")
  }
}
