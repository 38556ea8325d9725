package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, n-grams/shingles, quality ratios, language-ID,
  * fingerprinting. All built from `org.apache.spark.sql.functions._`
  * (whole-stage-codegen'd higher-order array functions) — no UDFs, so the
  * hot path stays vectorizable on a 1000-executor cluster.
  *
  * The reference has no text analytics of its own (SURVEY §2.8); these are
  * the north-star LLM-pipeline operators the engine adds, operating on the
  * `documents` table (doc_id, text, lang, source, n_chars).
  */
object TextFunctions {

  /** Whitespace tokenization; empty strings removed (trim + split `\s+`). */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > 0)

  /** Token count without materializing the array (regexp_count of
    * non-space runs ≡ size(tokens(c))). */
  def tokenCount(c: Column): Column = regexp_count(c, lit("\\S+"))

  /** BPE-ish subword count: alnum chunks count as one token each,
    * punctuation counts per character — a cheap deterministic proxy for
    * a real BPE tokenizer's token count. Counted via regexp_count (no
    * array materialization; ≡ splitting at every alnum/non-alnum
    * boundary and dropping blanks). */
  def bpeishTokenCount(c: Column): Column =
    regexp_count(c, lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"))

  /** Word-level n-gram shingles: array of space-joined n-token windows.
    * Documents with fewer than n tokens yield a single shingle of the
    * whole text (so every doc has ≥1 shingle). Native expression —
    * bit-identical to [[wordShinglesDeclarative]] (parity-tested), one
    * tight loop per row instead of an interpreted HOF chain. */
  def wordShingles(c: Column, n: Int): Column = {
    import graft.functions.expressions.{NativeExpressions => NE, WordShinglesExpr}
    NE.col(WordShinglesExpr(NE.expr(tokens(c)), n))
  }

  /** HOF reference implementation of [[wordShingles]]. */
  def wordShinglesDeclarative(c: Column, n: Int): Column = {
    val toks = tokens(c)
    val nShingles = greatest(size(toks) - (n - 1), lit(1))
    transform(
      sequence(lit(0), nShingles - 1),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** Character n-grams of the raw string (whitespace collapsed).
    * Native expression, parity-tested against [[charNgramsDeclarative]]. */
  def charNgrams(c: Column, n: Int): Column = {
    import graft.functions.expressions.{CharNgramsExpr, NativeExpressions => NE}
    NE.col(CharNgramsExpr(
      NE.expr(regexp_replace(trim(c), "\\s+", " ")), n))
  }

  /** HOF reference implementation of [[charNgrams]]. */
  def charNgramsDeclarative(c: Column, n: Int): Column = {
    val s = regexp_replace(trim(c), "\\s+", " ")
    val cnt = greatest(length(s) - (n - 1), lit(1))
    array_distinct(transform(
      sequence(lit(1), cnt),
      i => substring(s, i, lit(n))))
  }

  // ---- quality ratios (all in [0,1], double) ----------------------------

  private def ratioOf(matched: Column, total: Column): Column =
    when(total > 0, matched.cast("double") / total.cast("double"))
      .otherwise(lit(0.0))

  /** Fraction of non-space characters that are punctuation/symbols. */
  def punctRatio(c: Column): Column = {
    val nonSpace = regexp_replace(c, "\\s", "")
    val punct = regexp_replace(nonSpace, "[a-zA-Z0-9]", "")
    ratioOf(length(punct), length(nonSpace))
  }

  /** Fraction of non-space characters that are digits. */
  def digitRatio(c: Column): Column = {
    val nonSpace = regexp_replace(c, "\\s", "")
    ratioOf(length(nonSpace) - length(regexp_replace(nonSpace, "[0-9]", "")),
      length(nonSpace))
  }

  /** Fraction of letters that are uppercase. */
  def upperRatio(c: Column): Column = {
    val letters = regexp_replace(c, "[^a-zA-Z]", "")
    ratioOf(length(letters) - length(regexp_replace(letters, "[A-Z]", "")),
      length(letters))
  }

  /** Mean token length in characters. */
  def meanTokenLen(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** English stopword list used by stopwordRatio / langId (fixed,
    * deterministic). */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from", "this")

  /** Fraction of tokens that are stopwords (lowercased match). */
  def stopwordRatio(c: Column, stopwords: Seq[String] = enStopwords): Column = {
    val toks = tokens(lower(c))
    val sw = array(stopwords.map(lit): _*)
    ratioOf(size(filter(toks, t => array_contains(sw, t))), size(toks))
  }

  /** Composite quality score in [0,1]: rewards moderate length, prose-like
    * punctuation, presence of stopwords; penalizes digit/symbol soup.
    * Weights are fixed and documented so the score is reproducible. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / 50.0, lit(1.0))
    val punctOk = lit(1.0) - least(punctRatio(c) * 4.0, lit(1.0))
    val digitOk = lit(1.0) - least(digitRatio(c) * 4.0, lit(1.0))
    val swScore = least(stopwordRatio(c) * 4.0, lit(1.0))
    round(lenScore * 0.25 + punctOk * 0.25 + digitOk * 0.25 + swScore * 0.25, 6)
  }

  // ---- language id ------------------------------------------------------

  /** Tiny per-language marker lexicons (deterministic n-gram/stopword
    * heuristic). Public-knowledge stopword sets. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"),
    "es" -> Seq("el", "los", "y", "es", "en", "que", "por", "una", "para", "con"))

  /** Predicted language: arg-max stopword-hit count over the marker
    * lexicons; ties break in lexicon order (en < de < fr < es as listed);
    * zero hits ⇒ "und" (undetermined). */
  def langId(c: Column): Column = {
    val toks = tokens(lower(c))
    val scored = langMarkers.zipWithIndex.map { case ((lang, ws), i) =>
      val sw = array(ws.map(lit): _*)
      struct(
        size(filter(toks, t => array_contains(sw, t))).as("hits"),
        lit(langMarkers.size - i).as("prio"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  // ---- fingerprinting ---------------------------------------------------

  /** Unicode NFC normalization — run before any content hash
    * (fingerprint/minhash/simhash/exact dedup) so canonically
    * equivalent strings (é composed vs e + combining acute) merge.
    * Native expression wrapping `java.text.Normalizer`; mirrored
    * exactly by DuckDB's `nfc_normalize` (the q90 gate). */
  def nfcNormalize(c: Column): Column = {
    import graft.functions.expressions.{NativeExpressions => NE, NfcNormalize}
    NE.col(NfcNormalize(NE.expr(c)))
  }

  /** Polynomial rolling-hash document fingerprint over the
    * whitespace-normalized text: h = Σ h*31 + codepoint (mod 1e9+7).
    * Native Catalyst expression (tight loop); the declarative HOF
    * formulation is kept below for parity testing. */
  def fingerprint(c: Column): Column = {
    import graft.functions.expressions.{Fingerprint64, NativeExpressions => NE}
    NE.col(Fingerprint64(NE.expr(c)))
  }

  /** HOF reference implementation of [[fingerprint]] (parity-tested).
    * Same explicit whitespace class as the native expression — see
    * Fingerprint64's scaladoc for why String.trim / `\s` are avoided. */
  def fingerprintDeclarative(c: Column): Column = {
    val s = regexp_replace(
      regexp_replace(c, "[ \t\n\r\f]+", " "), "^ | $", "")
    val chars = split(s, "")
    aggregate(
      chars,
      lit(0L),
      (acc, ch) => pmod(acc * 31L + ascii(ch), lit(1000000007L)))
  }

  /** 64-bit SimHash over whitespace tokens: per bit, sign of Σ(±1) across
    * token xxhash64 bits. Returned as a LongType. Native Catalyst
    * expression; declarative reference kept for parity testing. */
  def simHash(c: Column): Column = {
    import graft.functions.expressions.{SimHash64, NativeExpressions => NE}
    NE.col(SimHash64(NE.expr(tokens(lower(c)))))
  }

  /** HOF reference implementation of [[simHash]] (parity-tested). */
  def simHashDeclarative(c: Column): Column = {
    val toks = tokens(lower(c))
    // 64-length vector of per-bit counters (bit index is a Scala-level
    // constant so the shift amounts are literals in the generated code)
    val counters = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        val bits = array((0 until 64).map(i =>
          when(shiftright(h, i).bitwiseAND(1L) === 1L, 1).otherwise(-1)): _*)
        zip_with(acc, bits, (a, b) => a + b)
      })
    // fold sign bits into a long: bit i set iff counter_i > 0; NULL text
    // must yield NULL (not 0, which is the hash of an empty doc)
    val packed = (0 until 64).map(i =>
      when(element_at(counters, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    when(c.isNotNull, packed)
  }
}
