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

  test("sq8TopK: near-perfect recall vs brute force; deterministic " +
      "across repartitioning") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sq8 = Similarity.sq8TopK(emb, "vec_id", "embedding", k = 3,
        overFetch = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & sq8).size.toDouble / exact.size
    info(f"SQ8 recall@3 = $recall%.3f (int8 index, 4x over-fetch)")
    // quantization error on unit vectors is ~1e-3 per element — with a
    // 4x over-fetch the exact re-rank recovers essentially everything
    assert(recall >= 0.95)
    val repart = Similarity.sq8TopK(emb.repartition(7), "vec_id",
        "embedding", k = 3, overFetch = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(repart === sq8) // layout-invariant
  }

  test("quantizeSq8 reconstructs dots within quantization error") {
    val rnd = new scala.util.Random(3)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    (1 to 20).foreach { _ =>
      val a = unit(); val b = unit()
      val exact = a.zip(b).map { case (x, y) => x * y }.sum
      val (qa, ma, sa, suma) = Similarity.quantizeSq8(a)
      val (qb, mb, sb, sumb) = Similarity.quantizeSq8(b)
      var mac = 0L
      (0 until 64).foreach(i =>
        mac += (qa(i) & 0xff).toLong * (qb(i) & 0xff).toLong)
      val approx = 64 * ma * mb + ma * sb * sumb + mb * sa * suma +
        sa * sb * mac
      assert(math.abs(approx - exact) < 0.01,
        s"approx $approx vs exact $exact")
    }
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

  test("ivfTopK auto-sizes nLists to ~sqrt(n) and stays deterministic") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // nLists=0 (the production default): 500 vectors → ceil(sqrt) = 23
    // cells; the result must be valid top-k and run-to-run identical
    val a = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    val b = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty && a.forall { case (q, n, r, _) =>
      q != n && r >= 1 && r <= 3 })
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

  test("pqTopK recall vs brute force; layout-invariant") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", k = 3,
        m = 8, ksub = 256, overFetch = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(f"PQ recall@3 = $recall%.3f (8 B/vector codes, 4x over-fetch)")
    assert(recall >= 0.8)
    val repart = Similarity.pqTopK(emb.repartition(7), "vec_id",
        "embedding", k = 3, m = 8, ksub = 256, overFetch = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(repart === pq) // layout-invariant
  }

  test("pqEncode: ADC reconstruction beats chance and bounds are balanced") {
    // balanced boundaries cover every dim exactly once, any (dim, m)
    assert(Similarity.pqBounds(64, 8).toSeq ===
      Seq(0, 8, 16, 24, 32, 40, 48, 56, 64))
    assert(Similarity.pqBounds(10, 3).toSeq === Seq(0, 3, 6, 10))
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val corpus = Array.fill(300)(unit())
    val books = Similarity.trainPqCodebooks(corpus, m = 8, ksub = 256,
      seed = 42L)
    val bounds = Similarity.pqBounds(64, 8)
    // ADC approx dot vs exact dot: mean abs error well under the
    // neighbor-gap scale on unit vectors
    val errs = for (a <- corpus.take(20); b <- corpus.take(20)) yield {
      val exact = a.zip(b).map { case (x, y) => x * y }.sum
      val codes = Similarity.pqEncode(b, books, bounds)
      val approx = (0 until 8).map { s =>
        val ctr = books(s)(codes(s) & 0xff)
        (bounds(s) until bounds(s + 1)).map(j =>
          a(j) * ctr(j - bounds(s))).sum
      }.sum
      math.abs(exact - approx)
    }
    val mae = errs.sum / errs.length
    info(f"PQ ADC mean abs dot error = $mae%.4f")
    assert(mae < 0.1)
  }

  test("pqTopK tolerates tiny and empty corpora; rejects ksub > 256") {
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(tiny, "vec_id", "embedding", k = 1,
        m = 2, ksub = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(out(1L) === 2L && out(2L) === 1L)
    val zeros = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.pqTopK(zeros, "vec_id", "embedding", k = 1)
      .count() === 0)
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(tiny, "vec_id", "embedding", k = 1, ksub = 512)
    }
    // m > dim would train zero-width subspaces (degenerate all-zero
    // codebooks); must fail loudly, not silently return garbage
    val err = intercept[IllegalArgumentException] {
      Similarity.pqTopK(tiny, "vec_id", "embedding", k = 1, m = 8)
    }
    assert(err.getMessage.contains("dim"))
  }
}
