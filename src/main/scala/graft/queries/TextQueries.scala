package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Text-analysis + deduplication surface over the `documents` table —
  * the training-data-pipeline operators (langid, quality scoring, token
  * counting, fingerprinting, exact/fuzzy dedup). Hash-based signatures
  * (minhash/simhash/fingerprint) are not DuckDB-expressible ⇒ rows-only
  * driver check + golden-value unit tests in DedupSpec/TextFunctionsSpec.
  */
object TextQueries extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T5 explode + word count over the corpus.
    "q30_explode_wordcount" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
    }),

    // Per-doc token statistics (whitespace tokenizer).
    "q31_token_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars_actual"),
        round(meanTokenLen(col("text")), 4).as("mean_token_len"))
    }),

    // Quality ratios + composite score.
    "q32_quality" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        round(punctRatio(col("text")), 6).as("punct_ratio"),
        round(digitRatio(col("text")), 6).as("digit_ratio"),
        round(upperRatio(col("text")), 6).as("upper_ratio"),
        round(stopwordRatio(col("text")), 6).as("stopword_ratio"),
        qualityScore(col("text")).as("quality"))
    }),

    // Language ID: stopword-lexicon arg-max heuristic.
    "q33_langid" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"), col("lang").as("lang_declared"),
        langId(col("text")).as("lang_pred"))
    }),

    // Exact dedup groups: keeper id + copy count per distinct text.
    "q34_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), "text", "doc_id")
        .select("keeper_id", "n_copies")),

    // Unigram-set Jaccard between consecutive doc pairs (n-gram Jaccard
    // verification primitive with a SQL-expressible pairing).
    "q35_jaccard_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val pairs = d.select(col("doc_id").as("id_a"))
        .withColumn("id_b", col("id_a") + 1)
        .join(d.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
      Dedup.ngramJaccardPairs(pairs, d, "doc_id", "text", n = 1)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 4).as("jaccard"))
    }),

    // Rolling-hash fingerprint (rows-only: hash not oracle-expressible).
    "q36_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))),

    // BPE-ish token counting (alternation regex — RE2-compatible, so
    // DuckDB can mirror it exactly).
    "q37_bpeish_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          bpeishTokenCount(col("text")).as("n_bpeish"))),

    // MinHash+LSH near-dup pairs (rows-only; determinism + recall vs
    // exact Jaccard covered in DedupSpec).
    "q38_minhash_pairs" -> ((s, dir) =>
      Dedup.minHashPairs(t(s, dir, "documents"), "doc_id", "text",
          shingle = 3, numHashes = 32, rowsPerBand = 4, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))),

    // SimHash near-dup pairs (rows-only).
    "q39_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 8)),

    // Full MinHash dedup: pairs → connected-component clusters → keep
    // one doc per cluster (rows-only; clustering semantics unit-tested).
    "q46_minhash_dedup" -> ((s, dir) =>
      Dedup.dedupByMinHash(t(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5)
        .select("doc_id", "source", "n_chars")),

    // TF-IDF top-3 keywords per document (ln-based idf; score rounded
    // so libm ulp differences can't flip the oracle compare).
    "q52_tfidf_top_terms" -> ((s, dir) =>
      graft.operators.TfIdf.topTerms(t(s, dir, "documents"), "doc_id",
        "text", k = 3)),

    // Cross-source corpus overlap via the MinHashUnionAgg typed
    // Aggregator: one union-signature per source, pairwise Jaccard
    // estimate WITHOUT joining documents (rows-only: hash-based;
    // estimator accuracy asserted in MinHashUnionAggSpec).
    "q54_source_overlap" -> ((s, dir) => {
      import s.implicits._
      val k = 64
      val agg = new graft.functions.MinHashUnionAgg(k)
      val sigs = t(s, dir, "documents")
        .select(col("source"),
          Dedup.minHashSignature(col("text"), 3, k).as("sig"))
        .as[(String, Seq[Long])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg.toColumn.name("usig"))
        .toDF("source", "usig")
      val a = sigs.select(col("source").as("src_a"), col("usig").as("ua"))
      val b = sigs.select(col("source").as("src_b"), col("usig").as("ub"))
      a.join(b, col("src_a") < col("src_b"))
        .withColumn("est_jaccard", round(
          aggregate(zip_with(col("ua"), col("ub"),
            (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / k, 4))
        .select("src_a", "src_b", "est_jaccard")
    }),

    // Deterministic hash-based train/val/test split counts (rows-only:
    // xxhash64 isn't DuckDB-expressible; determinism + partitioning
    // invariance asserted in SamplingSpec).
    "q50_train_split" -> ((s, dir) =>
      graft.operators.Sampling.assignSplits(t(s, dir, "documents"),
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))))

  /** DuckDB mirror of [[graft.functions.TextFunctions.tokens]]. */
  private val toks =
    "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> len(x) > 0)"
  private val toksLower =
    "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0)"

  private def hits(words: Seq[String]): String =
    s"len(list_filter($toksLower, x -> list_contains(${words.mkString("['", "', '", "']")}, x)))"

  override val oracles: Map[String, String] = Map(
    "q30_explode_wordcount" ->
      s"""SELECT token, COUNT(*) AS n FROM (
         |  SELECT unnest($toks) AS token FROM documents
         |) GROUP BY token""".stripMargin,
    "q31_token_stats" ->
      s"""SELECT doc_id,
         |  len($toks) AS n_tokens,
         |  length(text) AS n_chars_actual,
         |  round(CASE WHEN len($toks) > 0
         |    THEN CAST(list_sum(list_transform($toks, x -> len(x))) AS DOUBLE) / len($toks)
         |    ELSE 0.0 END, 4) AS mean_token_len
         |FROM documents""".stripMargin,
    "q32_quality" -> {
      val nonSpace = "regexp_replace(text, '\\s', '', 'g')"
      val punct = s"length(regexp_replace($nonSpace, '[a-zA-Z0-9]', '', 'g'))"
      val nsLen = s"length($nonSpace)"
      val digits = s"($nsLen - length(regexp_replace($nonSpace, '[0-9]', '', 'g')))"
      val letters = "regexp_replace(text, '[^a-zA-Z]', '', 'g')"
      val uppers = s"(length($letters) - length(regexp_replace($letters, '[A-Z]', '', 'g')))"
      val swHits = s"len(list_filter($toksLower, x -> list_contains(${enStopwords.mkString("['", "', '", "']")}, x)))"
      val nToks = s"len($toks)"
      val punctR = s"CASE WHEN $nsLen > 0 THEN CAST($punct AS DOUBLE) / $nsLen ELSE 0.0 END"
      val digitR = s"CASE WHEN $nsLen > 0 THEN CAST($digits AS DOUBLE) / $nsLen ELSE 0.0 END"
      val upperR = s"CASE WHEN length($letters) > 0 THEN CAST($uppers AS DOUBLE) / length($letters) ELSE 0.0 END"
      val swR = s"CASE WHEN $nToks > 0 THEN CAST($swHits AS DOUBLE) / $nToks ELSE 0.0 END"
      s"""SELECT doc_id,
         |  round($punctR, 6) AS punct_ratio,
         |  round($digitR, 6) AS digit_ratio,
         |  round($upperR, 6) AS upper_ratio,
         |  round($swR, 6) AS stopword_ratio,
         |  round(least(CAST($nToks AS DOUBLE) / 50.0, 1.0) * 0.25
         |      + (1.0 - least(($punctR) * 4.0, 1.0)) * 0.25
         |      + (1.0 - least(($digitR) * 4.0, 1.0)) * 0.25
         |      + least(($swR) * 4.0, 1.0) * 0.25, 6) AS quality
         |FROM documents""".stripMargin
    },
    "q33_langid" -> {
      val Seq(en, de, fr, es) = langMarkers.map(m => hits(m._2))
      s"""SELECT doc_id, lang AS lang_declared,
         |  CASE
         |    WHEN $en > 0 AND $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
         |    WHEN $de > 0 AND $de > $en AND $de >= $fr AND $de >= $es THEN 'de'
         |    WHEN $fr > 0 AND $fr > $en AND $fr > $de AND $fr >= $es THEN 'fr'
         |    WHEN $es > 0 AND $es > $en AND $es > $de AND $es > $fr THEN 'es'
         |    ELSE 'und' END AS lang_pred
         |FROM documents""".stripMargin
    },
    "q37_bpeish_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS n_bpeish
        |FROM documents""".stripMargin,
    "q52_tfidf_top_terms" ->
      """WITH terms AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |           x -> len(x) > 0)) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
        |), dfreq AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |), corpus AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT doc_id, term, score, rnk FROM (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * ln(CAST(corpus.n AS DOUBLE) / dfreq.df), 6) AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY round(tf.tf * ln(CAST(corpus.n AS DOUBLE) / dfreq.df), 6) DESC,
        |               tf.term ASC) AS rnk
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN corpus
        |) WHERE rnk <= 3""".stripMargin,
    "q34_dedup_exact" ->
      """SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "q35_jaccard_pairs" -> {
      val g = (c: String) => s"list_distinct(list_filter(regexp_split_to_array(trim($c), '\\s+'), x -> len(x) > 0))"
      s"""WITH grams AS (SELECT doc_id, ${g("text")} AS g FROM documents)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CASE WHEN len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) > 0
         |    THEN CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |       / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
         |    ELSE 0.0 END, 4) AS jaccard
         |FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1""".stripMargin
    })
}
