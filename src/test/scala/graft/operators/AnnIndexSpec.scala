package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AnnIndex]]: the persisted IVF/SQ8 sidecar must change WHEN work
  * happens, never WHAT is computed — indexed queries are bit-identical
  * to their per-call counterparts, read only the sidecar, park on
  * partition-scoped commits, and refresh ∝ touched partitions. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_ann_").toString

  /** Deterministic synthetic corpus: `n` vectors of dim 8 in 3
    * partitions, clustered around 4 rough directions so IVF cells are
    * meaningful. */
  private def corpus(n: Int): DataFrame =
    (1 to n).map { i =>
      val g = i % 4
      val v = (0 until 8).map { j =>
        val bias = if (j % 4 == g) 4.0 else 0.0
        bias + math.sin(i * 31 + j * 7) // deterministic jitter
      }
      (i.toLong, i % 3, v)
    }.toDF("id", "p", "vec")

  private def writePartitioned(df: DataFrame, path: String): Unit =
    Upsert.writeSnapshotsPartitioned(Seq(
      Upsert.PartitionedWrite(df, path, "p", Seq(0, 1, 2))))

  private def resultSet(df: DataFrame): Set[(Long, Long, Int, Double)] =
    df.select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
      .as[(Long, Long, Int, Double)].collect().toSet

  test("ivfTopKIndexed is bit-identical to per-call ivfTopK") {
    val path = tmp() + "/t"
    writePartitioned(corpus(180), path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    val indexed = resultSet(
      AnnIndex.ivfTopKIndexed(spark, path, "vec", k = 3, nProbe = 2))
    val percall = resultSet(Similarity.ivfTopK(
      spark.read.parquet(path), "id", "vec", k = 3, nLists = 4, nProbe = 2))
    assert(indexed == percall)
    assert(indexed.nonEmpty)
  }

  test("sq8TopKIndexed is bit-identical to per-call sq8TopK") {
    val path = tmp() + "/t"
    writePartitioned(corpus(150), path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    val indexed = resultSet(
      AnnIndex.sq8TopKIndexed(spark, path, "vec", k = 3, overFetch = 4))
    val percall = resultSet(Similarity.sq8TopK(
      spark.read.parquet(path), "id", "vec", k = 3, overFetch = 4))
    assert(indexed == percall)
    assert(indexed.nonEmpty)
  }

  test("pqTopKIndexed is bit-identical to per-call pqTopK") {
    val path = tmp() + "/t"
    writePartitioned(corpus(150), path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4,
      pqM = 4, pqKsub = 16)
    val indexed = resultSet(
      AnnIndex.pqTopKIndexed(spark, path, "vec", k = 3, overFetch = 4))
    val percall = resultSet(Similarity.pqTopK(
      spark.read.parquet(path), "id", "vec", k = 3, m = 4, ksub = 16,
      overFetch = 4))
    assert(indexed == percall)
    assert(indexed.nonEmpty)
  }

  test("refresh keeps PQ codes consistent with a fresh encode") {
    val path = tmp() + "/t"
    val df = corpus(120)
    writePartitioned(df, path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4,
      pqM = 4, pqKsub = 16)
    // commit new rows into partition p=1, refresh, and compare the
    // indexed PQ answer against per-call pqTopK over the new table
    // content ONLY if codebooks match — they won't (pqTopK retrains on
    // the new corpus), so instead assert the refreshed rows' codes
    // equal a fresh pqEncode under the PERSISTED codebooks
    val updates = (200 to 220).map { i =>
      (i.toLong, 1, (0 until 8).map(j => math.cos(i * 13 + j * 5)))
    }.toDF("id", "p", "vec")
    val commit = Upsert.upsertPartitioned(spark, path, updates,
      Seq("id"), "p")
    AnnIndex.refreshIndexPartitioned(spark, path, "id", "vec",
      commit.rewritten ++ commit.deleted)
    val idx = spark.read.parquet(s"$path/${AnnIndex.DirPrefix}vec/rows")
      .select(col("id"), col("u"), col("pq"))
      .as[(Long, Seq[Double], Array[Byte])].collect()
    val books = spark.read
      .parquet(s"$path/${AnnIndex.DirPrefix}vec/codebooks")
      .orderBy("subspace", "code").select("subspace", "centroid").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Double](1).toArray)).toArray
    val bounds = Similarity.pqBounds(8, 4)
    assert(idx.nonEmpty && idx.exists(_._1 >= 200L))
    idx.foreach { case (_, u, pq) =>
      assert(pq.toSeq ==
        Similarity.pqEncode(u.toArray, books, bounds).toSeq)
    }
  }

  test("ivfSq8TopKIndexed probing all cells is bit-identical to sq8TopK " +
      "(full pair universe) and never collects the corpus") {
    val path = tmp() + "/t"
    writePartitioned(corpus(150), path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    // nProbe = nLists ⇒ every query probes every cell ⇒ the candidate
    // universe equals the full scan ⇒ bit-parity with the broadcast path
    val combined = AnnIndex.ivfSq8TopKIndexed(spark, path, "vec",
      k = 3, nProbe = 4, overFetch = 4)
    val percall = resultSet(Similarity.sq8TopK(
      spark.read.parquet(path), "id", "vec", k = 3, overFetch = 4))
    assert(resultSet(combined) == percall)
    assert(percall.nonEmpty)
    // structural no-corpus-collect check: candidates come from a
    // cell-keyed JOIN (size-adaptive), not a collected broadcast array
    val joinKeys = combined.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        (j.leftKeys ++ j.rightKeys).map(_.sql.toLowerCase)
    }
    assert(joinKeys.exists(_.exists(_.contains("cell"))),
      s"candidate stage must join on cell, got: $joinKeys")
  }

  test("ivfPqTopKIndexed probing all cells is bit-identical to pqTopK " +
      "(full pair universe) and never collects the corpus") {
    val path = tmp() + "/t"
    writePartitioned(corpus(150), path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4,
      pqM = 4, pqKsub = 16)
    // nProbe = nLists ⇒ candidate universe equals the full scan, and
    // the ADC join scoring is bit-identical to pqCandidateScan's LUT
    // scoring ⇒ bit-parity with the collected-broadcast path
    val combined = AnnIndex.ivfPqTopKIndexed(spark, path, "vec",
      k = 3, nProbe = 4, overFetch = 4)
    val percall = resultSet(Similarity.pqTopK(
      spark.read.parquet(path), "id", "vec", k = 3, m = 4, ksub = 16,
      overFetch = 4))
    assert(resultSet(combined) == percall)
    assert(percall.nonEmpty)
    // structural no-corpus-collect check, as q116's
    val joinKeys = combined.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        (j.leftKeys ++ j.rightKeys).map(_.sql.toLowerCase)
    }
    assert(joinKeys.exists(_.exists(_.contains("cell"))),
      s"candidate stage must join on cell, got: $joinKeys")
  }

  test("ivfPq external batch and filtered variants: batch parity with " +
      "the self-join restricted to its ids; filtered neighbors all " +
      "allowed") {
    val path = tmp() + "/t"
    val data = corpus(150)
    writePartitioned(data, path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4,
      pqM = 4, pqKsub = 16)
    val batch = data.where(col("id") % 5 === 0)
    val got = resultSet(AnnIndex.ivfPqTopKIndexedFor(spark, path, "vec",
      batch, "id", "vec", k = 3, nProbe = 4, overFetch = 4))
    val full = resultSet(AnnIndex.ivfPqTopKIndexed(spark, path, "vec",
      k = 3, nProbe = 4, overFetch = 4))
    assert(got == full.filter(_._1 % 5 == 0))
    assert(got.nonEmpty)
    val allowed = data.where(col("id") % 3 === 0).select("id")
    val filtered = resultSet(AnnIndex.ivfPqTopKIndexedWhere(spark, path,
      "vec", allowed, "id", k = 3, nProbe = 4, overFetch = 100))
    assert(filtered.nonEmpty)
    assert(filtered.forall(_._2 % 3 == 0)) // every neighbor allowed
    assert(filtered.groupBy(_._1).forall(_._2.size <= 3))
  }

  test("ivfPqTopKIndexed with restricted probes keeps IVF-grade recall") {
    val path = tmp() + "/t"
    writePartitioned(corpus(180), path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4,
      pqM = 4, pqKsub = 16)
    val combined = AnnIndex.ivfPqTopKIndexed(spark, path, "vec",
        k = 3, nProbe = 2, overFetch = 4)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(
        spark.read.parquet(path), "id", "vec", k = 3)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val recall = combined.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.75, s"IVF+PQ recall $recall below floor")
  }

  test("ivfSq8TopKIndexedFor answers an external query batch: parity " +
      "with the self-join restricted to the batch; novel ids get full " +
      "neighbor lists from the corpus") {
    val path = tmp() + "/t"
    val data = corpus(150)
    writePartitioned(data, path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    // batch drawn from the corpus: probing all cells must reproduce
    // the self-join results for exactly those keys (same codes, same
    // candidate universe, id-equality self-exclusion)
    val batch = data.where(col("id") % 5 === 0)
    val got = resultSet(AnnIndex.ivfSq8TopKIndexedFor(spark, path, "vec",
      batch, "id", "vec", k = 3, nProbe = 4, overFetch = 4))
    val full = resultSet(Similarity.sq8TopK(
      spark.read.parquet(path), "id", "vec", k = 3, overFetch = 4))
    assert(got == full.filter(_._1 % 5 == 0))
    assert(got.nonEmpty)
    // genuinely-new items (ids outside the corpus key space): every
    // query gets k corpus neighbors, none of them itself
    val novel = data.where(col("id") % 7 === 1)
      .withColumn("id", col("id") + 100000L)
    val got2 = resultSet(AnnIndex.ivfSq8TopKIndexedFor(spark, path, "vec",
      novel, "id", "vec", k = 3, nProbe = 4, overFetch = 4))
    val novelIds = novel.select("id").as[Long].collect().toSet
    assert(got2.map(_._1) == novelIds)
    assert(got2.groupBy(_._1).forall(_._2.size == 3))
    val corpusIds = data.select("id").as[Long].collect().toSet
    assert(got2.forall(r => corpusIds.contains(r._2)))
  }

  test("ivfSq8TopKIndexedWhere restricts neighbors to the allowed set: " +
      "with all cells probed and ample over-fetch it is EXACTLY the " +
      "brute-force cosine top-k over the allowed subset") {
    val path = tmp() + "/t"
    val data = corpus(150)
    writePartitioned(data, path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    val allowed = data.where(col("id") % 3 === 0).select("id")
    val got = resultSet(AnnIndex.ivfSq8TopKIndexedWhere(spark, path,
      "vec", allowed, "id", k = 3, nProbe = 4, overFetch = 100))
    // brute-force filtered truth with the engine's own arithmetic:
    // unit-normalize, round(dot,4), rank by (sim desc, id asc)
    val nrm = spark.read.parquet(path)
      .select(col("id"), Similarity.normalized(col("vec")).as("u"))
      .where(col("u").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val want = nrm.as("a")
      .crossJoin(nrm.as("b").join(allowed.select(col("id")), Seq("id")))
      .where(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
        round(graft.functions.VectorFunctions.dot(
          col("a.u"), col("b.u")), 4).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
    assert(got == resultSet(want.select(
      col("query_id"), col("neighbor_id"), col("rank"), col("sim"))))
    assert(got.nonEmpty)
    assert(got.forall(r => r._2 % 3 == 0)) // every neighbor allowed
  }

  test("ivfSq8TopKIndexed with restricted probes keeps IVF-grade recall") {
    val path = tmp() + "/t"
    writePartitioned(corpus(180), path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    val combined = AnnIndex.ivfSq8TopKIndexed(spark, path, "vec",
        k = 3, nProbe = 2, overFetch = 4)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(
        spark.read.parquet(path), "id", "vec", k = 3)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val recall = combined.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.75, s"IVF+SQ8 recall $recall below floor")
  }

  test("indexed query plans scan ONLY the sidecar, never the base table") {
    val path = tmp() + "/t"
    writePartitioned(corpus(120), path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    Seq(
      AnnIndex.ivfTopKIndexed(spark, path, "vec", k = 3, nProbe = 2),
      AnnIndex.sq8TopKIndexed(spark, path, "vec", k = 3),
      AnnIndex.ivfSq8TopKIndexed(spark, path, "vec", k = 3, nProbe = 2),
      AnnIndex.ivfPqTopKIndexed(spark, path, "vec", k = 3, nProbe = 2)
    ).foreach { out =>
      val scans = out.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten
      assert(scans.nonEmpty)
      scans.foreach { p =>
        assert(p.contains(AnnIndex.DirPrefix + "vec"),
          s"query phase scanned outside the sidecar: $p")
      }
    }
  }

  test("partition-scoped commit parks the index; queries fail loudly") {
    val path = tmp() + "/t"
    val data = corpus(120)
    writePartitioned(data, path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    assert(AnnIndex.hasIndex(spark, path, "vec"))
    val updates = data.where(col("p") === 1)
      .withColumn("vec", transform(col("vec"), x => x * 2.0))
    Upsert.upsertPartitioned(spark, path, updates, Seq("id"), "p")
    assert(!AnnIndex.hasIndex(spark, path, "vec"),
      "a partition-scoped commit must park the ANN sidecar")
    intercept[IllegalArgumentException] {
      AnnIndex.ivfTopKIndexed(spark, path, "vec", k = 3)
    }
    intercept[IllegalArgumentException] {
      AnnIndex.sq8TopKIndexed(spark, path, "vec", k = 3)
    }
  }

  test("refresh re-indexes touched partitions only; untouched subdirs untouched") {
    val path = tmp() + "/t"
    val data = corpus(180)
    writePartitioned(data, path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rowsRoot = new Path(s"${AnnIndex.indexDir(path, "vec")}/rows")
    def childFiles(child: String): Map[String, Long] =
      fs.listStatus(new Path(rowsRoot, child)).filter(_.isFile)
        .map(f => f.getPath.getName -> f.getModificationTime).toMap
    val p0Before = childFiles("part=p%3D0")
    assert(p0Before.nonEmpty, "sanity: hive-escaped child exists")

    // make ids 7 and 10 (both p=1) identical: after refresh each must
    // report the other as its rank-1 neighbor at sim 1.0
    val donor = data.where(col("id") === 10).select("vec")
      .as[Seq[Double]].head()
    val updates = data.where(col("p") === 1)
      .withColumn("vec",
        when(col("id") === 7, typedLit(donor)).otherwise(col("vec")))
    val commit = Upsert.upsertPartitioned(spark, path, updates, Seq("id"), "p")
    assert(commit.rewritten == Seq("p=1"))
    AnnIndex.refreshIndexPartitioned(spark, path, "id", "vec",
      commit.rewritten ++ commit.deleted, validate = false)

    assert(AnnIndex.hasIndex(spark, path, "vec"))
    assert(childFiles("part=p%3D0") == p0Before,
      "untouched partition's index subdir must stay byte-identical")
    val m = AnnIndex.sq8TopKIndexed(spark, path, "vec", k = 1)
      .where(col("query_id").isin(7L, 10L))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(7L) == ((10L, 1.0)), s"refreshed index must see new vectors: $m")
    assert(m(10L) == ((7L, 1.0)), s"refreshed index must see new vectors: $m")
  }

  test("randomized commit/refresh interleavings keep the sidecar exact: " +
      "indexed ≡ per-call on the evolving table") {
    // seeded fuzz of the refresh lifecycle: partition rewrites, whole-
    // partition deletes, and re-adds, each followed by a refresh.
    // Invariants after every step (centroids are deliberately NOT
    // retrained on refresh, so the centroid-free SQ8 path and the
    // all-cells-probed combined path must stay BIT-identical to their
    // per-call counterparts on the current table):
    val rnd = new scala.util.Random(91L)
    val path = tmp() + "/t"
    val initial = corpus(150)
    writePartitioned(initial, path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    def jitter(df: org.apache.spark.sql.DataFrame, salt: Int) =
      df.withColumn("vec", transform(col("vec"),
        x => x + lit(math.sin(salt) * 0.37)))
    var present = Set(0, 1, 2)
    (1 to 5).foreach { step =>
      val p = rnd.nextInt(3)
      val commit =
        if (present.contains(p) && rnd.nextInt(4) == 0) {
          // delete partition p entirely (empty content for touched p)
          present -= p
          Upsert.writeSnapshotsPartitioned(Seq(Upsert.PartitionedWrite(
            initial.where(lit(false)), path, "p", Seq(p)))).head
        } else {
          // rewrite (or re-add) partition p with jittered vectors
          present += p
          Upsert.upsertPartitioned(spark, path,
            jitter(initial.where(col("p") === p), step), Seq("id"), "p")
        }
      AnnIndex.refreshIndexPartitioned(spark, path, "id", "vec",
        commit.rewritten ++ commit.deleted,
        validate = rnd.nextBoolean())
      val table = spark.read.parquet(path)
      assert(resultSet(
        AnnIndex.sq8TopKIndexed(spark, path, "vec", k = 3)) ==
        resultSet(Similarity.sq8TopK(table, "id", "vec", k = 3)),
        s"step $step: SQ8 indexed diverged from per-call")
      assert(resultSet(
        AnnIndex.ivfSq8TopKIndexed(spark, path, "vec", k = 3, nProbe = 4)) ==
        resultSet(Similarity.sq8TopK(table, "id", "vec", k = 3)),
        s"step $step: all-cells combined diverged from per-call")
    }
    assert(present.nonEmpty) // sanity: the loop kept a live table
  }

  test("validate=true self-heals undeclared drift and vanished partitions") {
    val path = tmp() + "/t"
    val data = corpus(150)
    writePartitioned(data, path)
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // drift behind the index's back: drop partition p=2 entirely and
    // rewrite p=1's files without declaring either
    fs.delete(new Path(path, "p=2"), true)
    val rewritten = data.where(col("p") === 1)
      .withColumn("vec", transform(col("vec"), x => x * 3.0))
    fs.delete(new Path(path, "p=1"), true)
    rewritten.drop("p").write.parquet(s"$path/p=1")
    AnnIndex.refreshIndexPartitioned(spark, path, "id", "vec",
      touchedDirs = Seq.empty, validate = true)
    val parts = spark.read
      .parquet(s"${AnnIndex.indexDir(path, "vec")}/rows")
      .select(col("part")).distinct().as[String].collect().toSet
    assert(parts == Set("p=0", "p=1"),
      s"vanished partition's rows must be dropped, drifted one rebuilt: $parts")
    // the rebuilt rows carry the rewritten vectors (norm-invariant check:
    // stored u is unit-normalized, so compare against fresh normalize)
    val ids = spark.read
      .parquet(s"${AnnIndex.indexDir(path, "vec")}/rows")
      .where(col("part") === "p=1").count()
    assert(ids == rewritten.count())
  }
}
