package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Token-window chunking — the context-window preparation step of a
  * training-data pipeline: each document becomes overlapping windows
  * of at most `chunkSize` whitespace tokens, stepping `chunkSize −
  * overlap` tokens between window starts, so every token appears in
  * ≥ 1 chunk and window boundaries share `overlap` tokens of context.
  *
  * Chunk count for an n-token doc: 1 when n ≤ chunkSize, else
  * ⌈(n − chunkSize)/step⌉ + 1 — the last window may be shorter than
  * chunkSize but always starts within the document (no empty windows,
  * no windows made only of overlap). Documents with zero tokens
  * produce zero chunks.
  *
  * Scale posture: tokenize → `sequence`/`explode` → `slice` is a
  * narrow per-row pipeline — no shuffle, whole-stage codegen'd,
  * output size ≈ input × (1 + overlap/step). Chunk ids are
  * (doc_id, chunk_idx), so downstream dedup/quality operators key on
  * them like any document.
  */
object Chunking {

  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be > 0, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    val n: Column = size(col("toks"))
    val nChunks: Column = when(n <= chunkSize, lit(1L))
      .otherwise(ceil((n - chunkSize).cast("double") / step) + 1L)
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col(idCol), col("toks"), n.as("n"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        array_join(slice(col("toks"),
          (col("chunk_idx") * step + 1L).cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize.toLong),
          col("n") - col("chunk_idx") * step).as("n_tokens"))
  }
}
