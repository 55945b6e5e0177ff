package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators for training-data pipelines: tokenization,
  * quality scoring, heuristic language ID, and document fingerprinting.
  *
  * All pure column expressions (whole-stage-codegen friendly, no UDFs): at
  * 100 TB these run inside the parquet scan stage with zero shuffles —
  * per-document work only.
  */
object TextAnalysis {

  /** Whitespace tokenizer; trims first so edge whitespace yields no empty
    * token. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: alnum runs + isolated punctuation marks — the
    * common pre-tokenizer shape (letters/digits grouped, punct split off).
    * RE2-safe (no lookarounds) so any engine computes it identically. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0))) +
      size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))

  /** Canonical whitespace/case normalization used before hashing. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Deterministic document fingerprint: md5 over the normalized text.
    * Portable (identical in any engine with md5) which makes cross-engine
    * dedup joins possible.
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Number of distinct marker words present (padded substring match — no
    * array ops, so semantics are trivially portable). */
  def stopwordHits(text: Column, words: Seq[String] = EnglishStopwords): Column = {
    val padded = concat(lit(" "), lower(trim(text)), lit(" "))
    words.map(w => when(padded.contains(s" $w "), 1).otherwise(0))
      .reduce((a, b) => a + b)
  }

  /** N-gram-heuristic language ID: stopword-marker voting with an `en`
    * default threshold. (The container has no language-ID model; this is the
    * classic stopword-profile heuristic.) */
  def langId(text: Column, minHits: Int = 2): Column =
    when(stopwordHits(text) >= minHits, "en").otherwise("unknown")

  def vowelRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[^aeiou]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Composite document-quality heuristic: length band + token band + vowel
    * ratio — the length/punct/stopword-ratio family of filters used to score
    * web text for training corpora. 0..3, higher = better.
    */
  def qualityScore(text: Column): Column =
    when(length(text).between(20, 100000), 1).otherwise(0) +
      when(tokenCount(text).between(5, 20000), 1).otherwise(0) +
      when(vowelRatio(text) > 0.15, 1).otherwise(0)

  /** Gopher-style intra-document repetition metrics (the Rae et al. 2021
    * repetition filters, the standard web-corpus quality gate alongside
    * [[qualityScore]]):
    *
    *  - `dup_3gram_frac`: fraction of word-3-gram occurrences that are
    *    repeats of an earlier 3-gram in the same document;
    *  - `top_2gram_frac`: fraction of word-2-gram occurrences claimed by the
    *    document's single most frequent 2-gram;
    *  - `n_3grams`: 3-gram occurrence count (the denominator, for
    *    threshold tuning).
    *
    * Shape: two doc-keyed aggregation chains over the codegen'd
    * [[Dedup.shingleRows]] multiset (shuffles are keyed by (doc, shingle)
    * then doc — map-side combinable, never corpus-global) joined on the doc
    * key. A pure array-expression form (`array_distinct` on a per-doc
    * shingle array) would avoid the shuffles but needs an interpreted
    * higher-order fold for the top-count and holds each document's whole
    * shingle array in one row — the aggregation shape stays codegen'd and
    * bounded regardless of document length.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def stats(n: Int) = Dedup.shingleRows(df, idCol, textCol, n)
      .groupBy(col(idCol), col("shingle")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum(col("c")).as("total"),
        count(lit(1)).as("nd"),
        max(col("c")).as("top"))
    val g3 = stats(3).select(col(idCol), col("total"), col("nd"))
    val g2 = stats(2).select(col(idCol), col("total").as("total2"), col("top"))
    g3.join(g2, Seq(idCol))
      .select(col(idCol),
        (lit(1.0) - col("nd").cast("double") / col("total").cast("double"))
          .as("dup_3gram_frac"),
        (col("top").cast("double") / col("total2").cast("double"))
          .as("top_2gram_frac"),
        col("total").as("n_3grams"))
  }
}
