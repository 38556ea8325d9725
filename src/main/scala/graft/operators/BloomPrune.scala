package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.expressions.NativeExpressions

/** Bloom-filter join pruning: build a compact membership sketch of the
  * dim side's join keys, broadcast it inside a row-local predicate, and
  * drop non-joining fact rows BEFORE they ride the shuffle.
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling only the rows that can possibly join: a
  * selective dim side (the reference's `get_meeting_ids`-style lookups
  * feeding child fetches, `src/api/client.py:141-166`, keeps only ids
  * that exist upstream) often joins <1 % of the fact rows, and a few
  * MB of bloom bits prune the other 99 % at scan time, where the
  * filter can additionally ride parquet row-group stats. Catalyst's
  * own runtime bloom join (SPARK-32268) makes the same trade
  * adaptively; this operator makes it explicit, deterministic, and
  * available to non-equi downstream plans.
  *
  * No false negatives: every row the join would keep passes the bloom
  * probe, so `bloomPrunedJoin ≡ join` for inner/semi joins at any fpp —
  * false positives only cost the shuffle bytes of the extra rows, which
  * the join itself then drops. Outer joins are rejected: pruning the
  * probe side would fabricate lost null-extended rows.
  */
object BloomPrune {

  /** Distributed build of the dim-key bloom filter (partial filters per
    * partition, OR-merged — `DataFrameStatFunctions.bloomFilter`); the
    * merged sketch is `~ -n·ln(fpp)/ln(2)²` bits regardless of table
    * width. `expectedItems < 0` sizes from a count of `dim` first. */
  def keyFilter(
      dim: DataFrame,
      key: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): BloomFilter = {
    val n = if (expectedItems > 0) expectedItems else dim.count()
    dim.stat.bloomFilter(key, math.max(n, 1L), fpp)
  }

  /** Row-local membership probe Column over a serialized filter — a
    * native expression, not a UDF, so it inlines into the scan stage's
    * filter (CodegenFallback: one virtual call per row against JIT-hot
    * probe code; the deserialized filter is a per-executor lazy val). */
  def mightContain(c: Column, bf: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    NativeExpressions.col(
      BloomMightContain(NativeExpressions.expr(c), bos.toByteArray))
  }

  /** `fact ⋈ dim` with the fact side pre-pruned by the dim-key bloom.
    * Value-equivalent to the plain join (no false negatives); inner and
    * left_semi only — see class doc. */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "leftsemi" || jt == "semi",
      s"bloomPrunedJoin: $joinType would lose pruned probe rows — " +
        "only inner/left_semi joins are bloom-prunable")
    val bf = keyFilter(dim, dimKey, expectedItems, fpp)
    // dataset-qualified refs: bare col(...) === col(...) is an
    // ambiguous self-reference whenever factKey and dimKey share a
    // name (the common case for natural join keys)
    val pruned = fact.where(mightContain(col(factKey), bf))
    pruned.join(dim, pruned(factKey) === dim(dimKey), joinType)
  }
}

/** `bloom_might_contain(key)` against a filter captured at plan time.
  * Supports the key types `DataFrameStatFunctions.bloomFilter` can put:
  * integral types (hashed as long) and strings (hashed as UTF-8 bytes —
  * `UTF8String.getBytes` is exactly the byte sequence
  * `BloomFilterImpl.putString` hashed on the build side). */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  // the bridged child is unresolved at construction — type-gate during
  // analysis, dispatch lazily once the plan is resolved
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom probe does not support ${dt.catalogString} keys")
    }

  @transient private lazy val probeLong: Boolean =
    child.dataType != StringType

  override def nullSafeEval(input: Any): Any =
    if (probeLong) bf.mightContainLong(input.asInstanceOf[Number].longValue())
    else bf.mightContainBinary(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
