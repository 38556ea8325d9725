package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns via
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs,
  * no MLlib dependency. Used by similarity search and embedding near-dup.
  *
  * Precision note: elements are cast to double BEFORE multiplication so
  * Spark and external oracles (e.g. DuckDB) agree bit-for-bit on
  * left-to-right double accumulation.
  */
object VectorFunctions {

  import graft.functions.expressions.{CosineSim, DotProduct, RhpSig, NativeExpressions => NE}

  def toDoubles(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product (native expression; tight JIT loop). */
  def dot(a: Column, b: Column): Column =
    NE.col(DotProduct(NE.expr(a), NE.expr(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double; NULL if either norm is zero.
    * Native expression; declarative reference kept for parity testing. */
  def cosine(a: Column, b: Column): Column =
    NE.col(CosineSim(NE.expr(a), NE.expr(b)))

  /** HOF reference implementation of [[dot]] (parity-tested). */
  def dotDeclarative(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDoubles(a), toDoubles(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** HOF reference implementation of [[cosine]] (parity-tested). */
  def cosineDeclarative(a: Column, b: Column): Column = {
    val d = dotDeclarative(a, b)
    val n = sqrt(dotDeclarative(a, a)) * sqrt(dotDeclarative(b, b))
    when(n > 0, d / n)
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDoubles(a), toDoubles(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Reconstructed SQ8 dot of two quantized vectors (full codegen —
    * the IVF+SQ8 candidate-scoring inner loop stays fused in the cell
    * join's projection). Bit-identical to the sq8CandidateScan
    * closure's formula; see [[graft.functions.expressions.Sq8ReconstructedDot]]. */
  def sq8ReconstructedDot(
      qA: Column, minA: Column, scaleA: Column, sumA: Column,
      qB: Column, minB: Column, scaleB: Column, sumB: Column): Column =
    NE.col(graft.functions.expressions.Sq8ReconstructedDot(Seq(
      NE.expr(qA), NE.expr(minA), NE.expr(scaleA), NE.expr(sumA),
      NE.expr(qB), NE.expr(minB), NE.expr(scaleB), NE.expr(sumB))))

  /** ADC dot of an exact query vector against a PQ code word (full
    * codegen — the IVF+PQ candidate scoring stays fused in the cell
    * join's projection). Bit-identical to pqCandidateScan's per-query
    * LUT scoring; see [[graft.functions.expressions.PqAdcDot]].
    * `codebooks` is the m × ksub sub-centroid table (trained order);
    * `bounds` the subspace boundaries (`Similarity.pqBounds`). */
  def pqAdcDot(
      query: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]],
      bounds: Array[Int]): Column = {
    val ksub = codebooks.head.length
    NE.col(graft.functions.expressions.PqAdcDot(
      NE.expr(query), NE.expr(codes), codebooks.flatten, ksub, bounds))
  }

  /** Random-hyperplane LSH signature: `bits` sign-bits of dot products
    * with deterministic pseudo-random hyperplanes (seeded), packed into a
    * Long. Same-bucket vectors are cosine-similar candidates. Hyperplane
    * component (i,j) is derived from a hash of (seed, i, j) — computed
    * per-row via codegen'd expressions, identical on every executor. */
  def rhpSignature(v: Column, bits: Int, dim: Int, seed: Long): Column =
    NE.col(RhpSig(NE.expr(v), bits, dim, seed))

  /** HOF reference implementation of [[rhpSignature]] (parity-tested). */
  def rhpSignatureDeclarative(v: Column, bits: Int, dim: Int, seed: Long): Column = {
    val vd = toDoubles(v)
    val bitCols = (0 until bits).map { i =>
      // pseudo-random ±1/√dim components from xxhash64(seed, i, j)
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), lit(dim - 1)),
          (x, j) => {
            val h = xxhash64(lit(seed), lit(i), j)
            // map hash to approximately-uniform double in [-1, 1]
            val u = (pmod(h, lit(2000001L)).cast("double") - 1000000.0) / 1000000.0
            x * u
          }),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }
}
