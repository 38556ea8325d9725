package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; quadratic — the correctness
  * oracle). Scale path: random-hyperplane LSH bucketing with multiple
  * tables — candidates only from shared buckets, then exact re-rank.
  * At 100 TB the bucketed join shuffles on (table, bucket) instead of
  * materializing the n² cross product.
  */
object Similarity {

  /** Unit-normalize a vector column (double elements); zero vectors
    * normalize to null. Done ONCE per row so pairwise similarity is a
    * plain dot product (3× fewer flops than cosine per pair). */
  private def normalized(v: Column): Column = {
    val n = sqrt(dot(v, v))
    when(n > 0, transform(v, x => x.cast("double") / n))
  }

  /** Two-phase top-k per key: per-partition bounded heaps (no global
    * sort of the full pair set), then an exact final window over the
    * ≤ partitions×keys×k survivors. Order: sim desc, id asc. */
  private[operators] def topKPerKey(
      pairs: DataFrame, // columns: key (long), id (long), sim (double)
      k: Int): DataFrame = {
    import pairs.sparkSession.implicits._
    val partial = pairs.select(col("key").cast("long"),
        col("id").cast("long"), col("sim").cast("double"))
      .where(col("sim").isNotNull) // zero-norm vectors have no similarity
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        // worst element first: smallest sim, then largest id
        val ord = Ordering.by[(Long, Double), (Double, Long)] {
          case (id, sim) => (-sim, id)
        }
        val heaps = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.PriorityQueue[(Long, Double)]]
        it.foreach { case (key, id, sim) =>
          val h = heaps.getOrElseUpdate(key,
            scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord))
          if (h.size < k) h.enqueue((id, sim))
          else {
            val (wid, wsim) = h.head
            if (sim > wsim || (sim == wsim && id < wid)) {
              h.dequeue(); h.enqueue((id, sim))
            }
          }
        }
        heaps.iterator.flatMap { case (key, h) =>
          h.iterator.map { case (id, sim) => (key, id, sim) }
        }
      }
      .toDF("key", "id", "sim")
    val w = Window.partitionBy(col("key"))
      .orderBy(col("sim").desc, col("id").asc)
    partial.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Exact brute-force cosine top-k neighbors for every vector.
    * Output: (query_id, neighbor_id, rank) — rank 1..k by cosine desc,
    * ties broken by neighbor_id asc (deterministic). Vectors are
    * pre-normalized once, so each pair costs one dot product; ranking is
    * two-phase (bounded heaps, then exact window over survivors). */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundSim: Int = 4): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      normalized(col(vecCol)).as("u"))
    val a = base.select(col("id").as("key"), col("u").as("u_a"))
    val b = base.select(col("id").as("id"), col("u").as("u_b"))
    val pairs = a.join(b, col("key") =!= col("id"))
      .withColumn("sim", round(dot(col("u_a"), col("u_b")), roundSim))
      .select("key", "id", "sim")
    topKPerKey(pairs, k)
      .select(col("key").as("query_id"), col("id").as("neighbor_id"),
        col("rank"))
  }

  /** Exact top-k via broadcast blocking: the (normalized) corpus is
    * collected once into a broadcast array; the query side streams per
    * partition computing dots and a bounded top-k selection in ONE pass
    * — the n² candidate rows are never materialized, no shuffle of pair
    * rows at all. Results are identical to [[bruteForceTopK]] (same
    * normalize → dot → HALF_UP round → (sim desc, id asc) ranking).
    *
    * Applicability bound: corpus must fit in a broadcast (~1M × 64-dim
    * doubles ≈ 512 MB). Beyond that, LSH/IVF are the scale paths.
    */
  def bruteForceTopKBlocked(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundSim: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
        normalized(col(vecCol)).as("u"))
      .where(col("u").isNotNull)
      .as[(Long, Seq[Double])]
    val corpus: Array[(Long, Array[Double])] =
      base.collect().map { case (i, u) => (i, u.toArray) }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)

    if (k <= 0) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("query_id", LongType),
          StructField("neighbor_id", LongType), StructField("rank", IntegerType))))
    }
    base.mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (qid, uSeq) =>
        val u = uSeq.toArray
        // bounded selection: (sim desc, id asc), worst kept at index k-1
        val topIds = new Array[Long](k)
        val topSims = new Array[Double](k)
        var filled = 0
        var ci = 0
        while (ci < cs.length) {
          val (nid, v) = cs(ci)
          if (nid != qid) {
            var dot = 0.0
            var j = 0
            while (j < u.length) { dot += u(j) * v(j); j += 1 }
            // identical rounding to Spark's round(): scala BigDecimal
            // HALF_UP on the double
            val sim = BigDecimal(dot)
              .setScale(roundSim, scala.math.BigDecimal.RoundingMode.HALF_UP)
              .toDouble
            val beatsWorst = filled < k || sim > topSims(filled - 1) ||
              (sim == topSims(filled - 1) && nid < topIds(filled - 1))
            if (beatsWorst) {
              var pos = math.min(filled, k - 1)
              while (pos > 0 && (sim > topSims(pos - 1) ||
                  (sim == topSims(pos - 1) && nid < topIds(pos - 1)))) {
                topSims(pos) = topSims(pos - 1)
                topIds(pos) = topIds(pos - 1)
                pos -= 1
              }
              topSims(pos) = sim
              topIds(pos) = nid
              if (filled < k) filled += 1
            }
          }
          ci += 1
        }
        (0 until filled).map(r => (qid, topIds(r), r + 1))
      }
    }.toDF("query_id", "neighbor_id", "rank")
  }

  /** IVF (inverted-file) approximate top-k: k-means centroids partition
    * the corpus into nLists cells; each query probes its nProbe nearest
    * cells and re-ranks exactly inside them. The classic ANN index
    * shape: candidates ≈ n·(nProbe/nLists) per query instead of n.
    *
    * Vectors are unit-normalized first so euclidean k-means cells align
    * with cosine neighborhoods. Centroids train on (a sample of) the
    * corpus — at 100 TB, train on a 1-10M row sample, then a single
    * broadcast-join pass assigns cells.
    */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L,
      trainCap: Int = 25000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val base = df.select(col(idCol).cast("long").as("id"),
        normalized(col(vecCol)).as("u"))
      .where(col("u").isNotNull)
    // cache: k-means re-scans its input every iteration, and the probe
    // pass below reuses the same cached plan
    val vecs = base.withColumn("features", array_to_vector(col("u"))).cache()
    // random init beats kmeans|| here: at index-training scale the ||
    // init's extra passes are pure scheduler overhead (measured 9.5s vs
    // 5.9s for the whole fit on 2k×64), and nProbe probing absorbs the
    // slightly looser cells (recall asserted in SimilaritySpec).
    // The train set is a BOUNDED deterministic sample: the trainCap
    // lowest-hash ids (stable regardless of corpus size/partitioning),
    // canonicalized to one sorted partition so the seeded init — which
    // samples per partition — yields the same centroids at any
    // parallelism. Assignment below runs over the fully partitioned data.
    val trainSet = vecs
      .orderBy(xxhash64(col("id")).asc)
      .limit(trainCap)
      .repartition(1).sortWithinPartitions("id")
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(5)
      .setInitMode("random")
      .fit(trainSet)
    val assigned = model.transform(vecs)
      .select(col("id"), col("u"), col("prediction").as("cell"))

    // tiny centroid table (nLists rows) → broadcast; each query ranks
    // its nProbe nearest cells by the SAME metric k-means assigns with:
    // argmin ||u-c||² ≡ argmax (u·c − ||c||²/2). Ranking by raw dot
    // would use a different metric (centroid norms vary by cell) and a
    // query could fail to probe its own cell — systematic recall loss.
    val spark = df.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val arr = c.toArray
        (i, arr, arr.map(x => x * x).sum / 2.0)
      }.toSeq
      .toDF("cell", "centroid", "half_sq_norm")
    val probeW = Window.partitionBy(col("id"))
      .orderBy(col("cscore").desc, col("cell").asc)
    val probes = vecs.select(col("id"), col("u"))
      .crossJoin(broadcast(centroids))
      .withColumn("cscore",
        dot(col("u"), col("centroid")) - col("half_sq_norm"))
      .withColumn("prank", row_number().over(probeW))
      .where(col("prank") <= nProbe)
      .select(col("id").as("key"), col("u").as("u_a"), col("cell"))

    val scored = probes
      .join(assigned.select(col("cell"), col("id"), col("u").as("u_b")),
        Seq("cell"))
      .where(col("key") =!= col("id"))
      .withColumn("sim", round(dot(col("u_a"), col("u_b")), 4))
      .select("key", "id", "sim")
    topKPerKey(scored, k)
      .select(col("key").as("query_id"), col("id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** LSH-bucketed approximate top-k: L independent random-hyperplane
    * tables of `bits` bits; candidate pairs share a bucket in ≥1 table;
    * exact cosine re-rank of candidates. Recall < 1 by construction —
    * verified against bruteForceTopK in tests. */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 8,
      tables: Int = 4,
      dim: Int = 64): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      normalized(col(vecCol)).as("u"))
    // candidates carry IDS ONLY through the bucket join + dedup; vectors
    // re-attach afterwards (fat arrays never ride the candidate shuffle)
    val sigs = base.select(
      col("id"),
      posexplode(array((0 until tables).map(t =>
        rhpSignature(col("u"), bits, dim, seed = 1000L + t)): _*)))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")
    val cands = sigs.select(col("table"), col("bucket"), col("id").as("key"))
      .join(sigs.select(col("table"), col("bucket"), col("id")),
        Seq("table", "bucket"))
      .where(col("key") =!= col("id"))
      .dropDuplicates("key", "id")
      .select("key", "id")
    val scored = cands
      .join(base.select(col("id").as("key"), col("u").as("u_a")), Seq("key"))
      .join(base.select(col("id"), col("u").as("u_b")), Seq("id"))
      .withColumn("sim", round(dot(col("u_a"), col("u_b")), 4))
      .select("key", "id", "sim")
    topKPerKey(scored, k)
      .select(col("key").as("query_id"), col("id").as("neighbor_id"),
        col("rank"), col("sim"))
  }
}
