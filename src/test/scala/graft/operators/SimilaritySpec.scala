package graft.operators

import graft.SparkSpec
import graft.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK on hand-checked vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", k = 1)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(out(1L) === 2L) // closest to (1,0) is (0.9,0.1)
    assert(out(2L) === 1L)
    assert(out(3L) === 2L) // (0,1)·(0.9,0.1)>0, (0,1)·(1,0)=0
  }

  test("bruteForceTopKBlocked identical to join-based brute force") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val joined = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Int)].collect().toSet
    val blocked = Similarity
      .bruteForceTopKBlocked(emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(blocked === joined)
  }

  test("ivfTopK recall vs brute force on sf0.001 embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3,
        nLists = 16, nProbe = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"IVF recall@3 = $recall%.3f (probing 10/16 cells)")
    assert(recall >= 0.85)
  }

  test("ivfTopK broadcast-join path == literal-projection path") {
    // same index, two physical strategies: forcing the broadcast path
    // (threshold 0) must reproduce the literal path bit-for-bit
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val lit = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3,
        nLists = 16, nProbe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    val bcast = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3,
        nLists = 16, nProbe = 4, literalCellThreshold = 0)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(bcast === lit)
  }

  test("ivfTopK tolerates corpora smaller than nLists, and empty input") {
    // 3 vectors, nLists=16: trains one centroid per vector instead of
    // indexing past the sample (the removed Spark ML fit tolerated
    // n < k; the driver-side trainer must too)
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(tiny, "vec_id", "embedding", k = 1,
        nLists = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(out(1L) === 2L && out(2L) === 1L)
    // empty / all-zero-norm input → empty result, not a crash
    val zeros = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.ivfTopK(zeros, "vec_id", "embedding", k = 1)
      .count() === 0)
  }

  test("lshTopK recall ≥ 0.85 vs brute force on sf0.001 embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    // this corpus's true top-3 neighbors sit at ~70° (cosine ≈ 0.34), so
    // per-bit agreement is only ~0.61 — few wide buckets + many tables
    // is the right trade here (bits=8/tables=4 would give ~8% recall;
    // bits=3/tables=8 ⇒ catch probability ≈ 1−(1−0.61³)⁸ ≈ 0.87)
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", k = 3,
        bits = 3, tables = 8, dim = 64)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"LSH recall@3 = $recall%.3f (candidates examined ≪ n²)")
    assert(recall >= 0.85)
  }
}
