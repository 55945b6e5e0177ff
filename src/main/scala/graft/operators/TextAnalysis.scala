package graft.operators

import org.apache.spark.sql.Column
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
}
