package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, FactAnnIndex, FactVersioned, Upsert}

/** Lifecycle-cost probe for SCALING.md round 9: measures the two
  * persisted-artifact lifecycles whose sf1.0 costs VERDICT r8 flagged
  * as unmeasured —
  *
  *  1. [[AnnIndex]]: `writeIndex` (full build: train + assign +
  *     quantize + publish), the three indexed query phases, and
  *     `refreshIndexPartitioned` after a ONE-partition commit (cost
  *     must scale with the touched partition, not the corpus);
  *  2. [[FactVersioned]]: initial full commit, a ONE-partition upsert
  *     (bytes under the new vgen dir vs the table — write cost ∝
  *     batch), and the retention sweep once commits exceed `retain`.
  *
  * Usage: runMain graft.LifecycleProbe <sfDir>
  * Diagnostic main, same family as [[ScaleSmoke]]/[[WriteAmpProbe]];
  * correctness of everything measured here is gated by q110/q111/q116
  * (index) and q113/q115 (fact travel) plus their specs.
  */
object LifecycleProbe {

  private def dirBytes(fs: org.apache.hadoop.fs.FileSystem, p: Path): Long =
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength

  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: LifecycleProbe <sfDir>")
    val spark = BenchSession.build()
    import spark.implicits._
    val fs = new Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val wh = Files.createTempDirectory("graft_lifecycle_").toString

    // ---------- AnnIndex lifecycle over embeddings (partitioned) ----
    val emb = Tables.load(spark, args(0), "embeddings")
    val n = emb.count()
    println(s"[probe] embeddings rows: $n")
    val ePath = s"$wh/embeddings_part"
    val labels = emb.select("label").distinct().as[String].collect().toSeq
    println(s"[probe] label partitions: ${labels.size}")
    timed("stage embeddings (partitioned by label)") {
      Upsert.writeSnapshotsPartitioned(Seq(
        Upsert.PartitionedWrite(emb, ePath, "label", labels)))
    }
    timed("writeIndex (train+assign+quantize+publish)") {
      AnnIndex.writeIndex(spark, ePath, "vec_id", "embedding")
    }
    println(s"[probe] index bytes: " +
      dirBytes(fs, new Path(AnnIndex.indexDir(ePath, "embedding"))) +
      s" of table ${dirBytes(fs, new Path(ePath))}")
    timed("query: ivfTopKIndexed k=10")(
      AnnIndex.ivfTopKIndexed(spark, ePath, "embedding", k = 10).count())
    timed("query: sq8TopKIndexed k=10")(
      AnnIndex.sq8TopKIndexed(spark, ePath, "embedding", k = 10).count())
    timed("query: ivfSq8TopKIndexed k=10")(
      AnnIndex.ivfSq8TopKIndexed(spark, ePath, "embedding", k = 10).count())
    timed("query: ivfPqTopKIndexed k=10")(
      AnnIndex.ivfPqTopKIndexed(spark, ePath, "embedding", k = 10).count())

    // one-partition commit, then refresh — declared-dirs path (the
    // serial single-writer loop) and validating path (self-healing)
    val touchLabel = labels.sorted.head
    val updates = emb.where(col("label") === touchLabel)
      .withColumn("embedding", transform(col("embedding"),
        x => x * lit(1.0f)))
    val commit = timed(s"upsertPartitioned(1 of ${labels.size} dirs)") {
      Upsert.upsertPartitioned(spark, ePath, updates, Seq("vec_id"), "label")
    }
    timed("refreshIndexPartitioned (validate=false)") {
      AnnIndex.refreshIndexPartitioned(spark, ePath, "vec_id", "embedding",
        commit.rewritten ++ commit.deleted, validate = false)
    }
    timed("refreshIndexPartitioned (validate=true, no drift)") {
      AnnIndex.refreshIndexPartitioned(spark, ePath, "vec_id", "embedding",
        Seq.empty, validate = true)
    }

    // ---------- FactAnnIndex lifecycle over a versioned fact --------
    // the generation-aware sidecar: build cost vs AnnIndex, refresh ∝
    // a commit's new files, and the manifest-restricted query phase
    val vPath = s"$wh/embeddings_fact"
    timed("FactVersioned initial commit (embeddings by label)") {
      FactVersioned.upsert(spark, vPath, emb, Seq("vec_id"), "label")
    }
    timed("FactAnnIndex.writeIndex (train+assign+quantize+publish)") {
      FactAnnIndex.writeIndex(spark, vPath, "vec_id", "embedding")
    }
    val fannDir = new Path(FactAnnIndex.indexDir(vPath, "embedding"))
    val fannBytes0 = dirBytes(fs, fannDir)
    println(s"[probe] fact-index bytes: $fannBytes0 of table " +
      dirBytes(fs, new Path(s"$vPath/${FactVersioned.DataDir}")))
    timed("query: FactAnnIndex.topK k=10 (head gen)")(
      FactAnnIndex.topK(spark, vPath, "embedding", k = 10).count())
    val vTouch = emb.where(col("label") === touchLabel)
      .withColumn("embedding", transform(col("embedding"),
        x => x * lit(1.0f)))
    timed(s"FactVersioned upsert (1 of ${labels.size} label dirs)") {
      FactVersioned.upsert(spark, vPath, vTouch, Seq("vec_id"), "label")
    }
    timed("FactAnnIndex.refreshIndex (new generation's files only)") {
      FactAnnIndex.refreshIndex(spark, vPath, "vec_id", "embedding")
    }
    println(s"[probe] fact-index bytes after refresh: " +
      s"${dirBytes(fs, fannDir)} (+${dirBytes(fs, fannDir) - fannBytes0})")
    timed("query: FactAnnIndex.topK k=10 (new head)")(
      FactAnnIndex.topK(spark, vPath, "embedding", k = 10).count())
    timed("query: FactAnnIndex.topK k=10 (gen 0, time travel)")(
      FactAnnIndex.topK(spark, vPath, "embedding", k = 10,
        gen = Some(0L)).count())
    timed("FactAnnIndex.gcIndex (nothing dead yet)") {
      FactAnnIndex.gcIndex(spark, vPath, "embedding")
    }

    // ---------- FactVersioned lifecycle over orders ----------------
    val orders = Tables.load(spark, args(0), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), year(col("o_orderdate")).as("p_year"))
    val fPath = s"$wh/orders_fact"
    val years = orders.select("p_year").distinct().as[Int].collect().sorted
    println(s"[probe] orders rows: ${orders.count()}, " +
      s"year partitions: ${years.length}")
    timed("FactVersioned initial commit (all partitions)") {
      FactVersioned.upsert(spark, fPath, orders, Seq("o_orderkey"), "p_year")
    }
    val tableBytes =
      dirBytes(fs, new Path(s"$fPath/${FactVersioned.DataDir}"))
    val oneYear = orders.where(col("p_year") === years.head)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    timed(s"FactVersioned upsert (1 of ${years.length} partitions)") {
      FactVersioned.upsert(spark, fPath, oneYear, Seq("o_orderkey"), "p_year")
    }
    val g1Bytes = dirBytes(fs,
      new Path(s"$fPath/${FactVersioned.DataDir}/${FactVersioned.VGenCol}=1"))
    println(f"[probe] commit-1 bytes: $g1Bytes (${
      100.0 * g1Bytes / tableBytes}%.1f%% of table $tableBytes)")
    // two more one-partition commits push gen 0 past retain=3; the
    // third's retention sweep GCs gen 0's now-unreferenced year file
    timed("two more 1-partition upserts (trigger retention+GC)") {
      FactVersioned.upsert(spark, fPath,
        oneYear.withColumn("o_totalprice", col("o_totalprice") + 1),
        Seq("o_orderkey"), "p_year")
      FactVersioned.upsert(spark, fPath,
        oneYear.withColumn("o_totalprice", col("o_totalprice") + 2),
        Seq("o_orderkey"), "p_year")
    }
    println(s"[probe] generations retained: " +
      FactVersioned.generations(spark, fPath).mkString(","))
    println(s"[probe] data bytes after GC: " +
      dirBytes(fs, new Path(s"$fPath/${FactVersioned.DataDir}")))

    fs.delete(new Path(wh), true)
    spark.stop()
  }
}
