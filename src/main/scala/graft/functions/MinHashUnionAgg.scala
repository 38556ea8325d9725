package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (SURVEY §2.8's UDAF extension point): element-wise
  * MIN of MinHash signatures across rows = the MinHash signature of the
  * UNION of the rows' shingle sets.
  *
  * This is the corpus-level dedup diagnostic: aggregate one signature
  * per partition/source/snapshot, then estimate the Jaccard overlap of
  * two corpora as the fraction of agreeing signature positions — without
  * ever joining their documents. Commutative + associative (min), so the
  * partial/final merge is exact at any parallelism.
  */
class MinHashUnionAgg(numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig == null) return buf // null-text docs contribute nothing
    require(sig.length >= numHashes,
      s"signature length ${sig.length} < aggregator width $numHashes")
    var i = 0
    while (i < numHashes) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashUnionAgg {
  /** Estimated Jaccard similarity of two union-signatures: fraction of
    * agreeing positions (the standard MinHash estimator). Positions
    * still holding the empty-corpus sentinel (Long.MaxValue) never count
    * as agreement — two empty corpora estimate 0, not 1. */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length && a.nonEmpty)
    a.zip(b).count { case (x, y) =>
      x == y && x != Long.MaxValue
    }.toDouble / a.length
  }
}
