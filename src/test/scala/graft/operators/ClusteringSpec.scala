package graft.operators

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)), // seed A
    (2L, Array(0.0f, 1.0f, 0.0f)), // seed B
    (10L, Array(0.9f, 0.1f, 0.0f)), // → A
    (11L, Array(0.1f, 0.9f, 0.0f)), // → B
    (12L, Array(0.0f, 0.0f, 0.0f)), // zero norm: dropped
    (13L, Array(0.7f, 0.7f, 0.0f)) // equidistant → tie breaks to A
  ).toDF("vec_id", "embedding")

  private def collectAssign(threshold: Int = 4096): Map[Long, Long] =
    Clustering.assignToSeeds(vecs, "vec_id", "embedding", k = 2,
        literalCellThreshold = threshold)
      .select("vec_id", "seed_id").as[(Long, Long)].collect().toMap

  test("assigns to nearest seed; tie → lowest seed; zero-norm dropped") {
    val m = collectAssign()
    assert(m === Map(1L -> 1L, 2L -> 2L, 10L -> 1L, 11L -> 2L, 13L -> 1L))
  }

  test("seeds assign to themselves with sim 1.0") {
    val sims = Clustering.assignToSeeds(vecs, "vec_id", "embedding", k = 2)
      .where($"vec_id" === $"seed_id")
      .select("vec_id", "sim").as[(Long, Double)].collect().toMap
    assert(sims === Map(1L -> 1.0, 2L -> 1.0))
  }

  test("literal and broadcast paths agree; partition-invariant") {
    val literal = collectAssign(threshold = 4096)
    val bcast = collectAssign(threshold = 0) // forces the broadcast path
    assert(literal === bcast)
    val spread = Clustering.assignToSeeds(vecs.repartition(7), "vec_id",
        "embedding", k = 2)
      .select("vec_id", "seed_id").as[(Long, Long)].collect().toMap
    assert(spread === literal)
  }

  test("profile: member counts and exact-decimal mean similarity") {
    val assign = Clustering.assignToSeeds(vecs, "vec_id", "embedding", k = 2)
    val prof = Clustering.profile(assign)
      .select("seed_id", "n_members", "mean_sim")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(prof(1L)._1 === 3L) // 1, 10, 13
    assert(prof(2L)._1 === 2L) // 2, 11
    // mean of the rounded sims, computed exactly
    val sims = assign.where($"seed_id" === 1L)
      .select("sim").as[Double].collect()
    val expected = BigDecimal(sims.map(BigDecimal(_)).sum.toDouble / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(prof(1L)._2 - expected) < 1e-9)
  }

  test("empty input yields an empty, well-typed result") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Clustering.assignToSeeds(empty, "vec_id", "embedding", k = 4)
    assert(out.columns.toSeq === Seq("vec_id", "seed_id", "sim"))
    assert(out.count() === 0)
    assert(Clustering.profile(out).count() === 0)
  }

  test("sf0.001 assignment is total and covered by the 16 seeds") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val assign = Clustering.assignToSeeds(emb, "vec_id", "embedding", k = 16)
    val n = emb.count()
    assert(assign.count() === n) // no vector lost (corpus has no zeros)
    val seeds = assign.select("seed_id").distinct().as[Long].collect().toSet
    assert(seeds.subsetOf(
      emb.select("vec_id").as[Long].collect().sorted.take(16).toSet))
  }
}
