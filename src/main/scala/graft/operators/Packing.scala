package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Greedy sequence packing — the context-window PACKING step of a
  * training pipeline (chunking's sibling): documents are concatenated
  * in doc-id order into fixed-capacity token sequences; a document
  * that would overflow the current sequence starts the next one.
  * Documents longer than the capacity are counted at the capacity
  * (they form singleton sequences — the downstream truncation is
  * [[Chunking]]'s job).
  *
  * Packing is inherently sequential, so the SHARD is the parallel
  * unit: documents hash into `nBuckets` buckets (`doc_id % nBuckets`)
  * and each bucket packs independently in doc-id order. The fold
  * runs in `flatMapGroups` over the bucket's sorted documents —
  * deterministic for any input partitioning (the group is sorted
  * in-memory before folding), so results are layout- and
  * parallelism-invariant. At 100 TB, size `nBuckets` so one bucket's
  * (doc_id, n_tokens) pairs fit an executor core comfortably — the
  * fold carries two longs of state and never materializes text.
  *
  * Output: (bucket, seq_id, doc_id, n_tokens) — seq_id is dense per
  * bucket, ascending with doc_id.
  */
object Packing {

  def packGreedy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Int,
      nBuckets: Int): DataFrame = {
    require(capacity > 0, s"capacity must be > 0, got $capacity")
    require(nBuckets > 0, s"nBuckets must be > 0, got $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        pmod(col(idCol), lit(nBuckets)).cast("int").as("bucket"),
        col(idCol).cast("long").as("doc_id"),
        least(TextFunctions.tokenCount(col(textCol)), lit(capacity))
          .cast("long").as("n"))
      .as[(Int, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (bucket, it) =>
        val docs = it.toArray.sortBy(_._2)
        var fill = 0L
        var seq = -1L
        docs.iterator.map { case (_, id, n) =>
          if (seq < 0 || fill + n > capacity) { seq += 1; fill = n }
          else fill += n
          (bucket, seq, id, n)
        }
      }
      .toDF("bucket", "seq_id", "doc_id", "n_tokens")
  }
}
