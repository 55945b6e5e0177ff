package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary-driven document TAGGING and vocabulary-bounded association
  * mining — the labeling stages of a corpus pipeline: route documents to
  * topics with a curated phrase dictionary, and surface which terms
  * co-occur far above chance (PMI) for taxonomy building and leakage
  * review.
  *
  * Both operators are built on the same scale discipline: the dictionary
  * and the vocabulary are BOUNDED side relations (broadcast, never
  * shuffled with the corpus), and the corpus itself is touched by exactly
  * one explode-scan plus one aggregation — no self-join of the corpus, no
  * driver materialization of anything data-sized.
  */
object Tagging {

  /** Tag documents with a phrase dictionary: `dict` is (tag, phrase)
    * with phrases of 1..4 whitespace-separated tokens; a document gets
    * one output row per matched tag with the total number of phrase
    * hits. Matching is token-boundary exact (never substring — "art"
    * must not fire inside "part"), case-folded.
    *
    * Shape: the scan projects each document's n-gram stream once (all
    * lengths the dictionary actually uses, built with scan-stage
    * `transform` lambdas — no shuffle until the counts), the dictionary
    * joins BROADCAST on the phrase, and one (doc, tag) aggregation
    * produces the result. This is the multi-pattern-match layout that
    * scales: corpus-side cost is (maxPhraseLen × tokens) candidate
    * grams regardless of dictionary size, and dictionary growth only
    * widens the broadcast hash table. A LIKE/regex-union scan does the
    * same work re-compiled per pattern; an Aho-Corasick UDF would beat
    * this only for dictionaries too large to broadcast.
    */
  def dictionaryTags(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dict: Seq[(String, String)]): DataFrame = {
    require(dict.nonEmpty, "empty dictionary")
    // normalize dict phrases with the SAME pipeline the corpus n-grams
    // go through (case fold, whitespace runs → one space) — an entry
    // like "Hash  Join" must match, not silently never fire
    val normed = dict.map { case (t, p) =>
      (t, p.trim.toLowerCase.split("\\s+").mkString(" "))
    }
    val maxN = normed.map(_._2.split(" ").length).max
    require(maxN <= 4,
      "phrases longer than 4 tokens defeat the n-gram join; " +
        "pre-split them or use a dedicated matcher")
    val spark = df.sparkSession
    import spark.implicits._
    val dictDf = normed.toDF("tag", "phrase")
    val grams: Seq[Column] = (1 to maxN).map { n =>
      if (n == 1) col("ts")
      else when(size(col("ts")) >= n,
        transform(sequence(lit(1), size(col("ts")) - (n - 1)),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(col("ts"), i + k)): _*)))
        .otherwise(array().cast("array<string>"))
    }
    df.select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("ts"))
      .select(col(idCol), explode(flatten(array(grams: _*))).as("phrase"))
      .join(broadcast(dictDf), Seq("phrase"))
      .groupBy(col(idCol), col("tag"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Top-k pointwise-mutual-information token pairs over the top-`topV`
    * vocabulary: for tokens x < y, `pmi = ln(c_xy · N / (c_x · c_y))`
    * where counts are DOCUMENT frequencies (a pair counts once per
    * document co-occurring, the standard word-association form). Pairs
    * seen in fewer than `minPairDocs` documents are dropped before
    * scoring — raw PMI is maximized by hapax pairs, so the support
    * floor is part of the estimator, not a tuning nicety.
    *
    * The vocabulary restriction is what makes this tractable at scale:
    * per-document pair generation is quadratic in the number of DISTINCT
    * KEPT tokens, so capping the vocabulary at topV caps per-document
    * work at topV²/2 regardless of document length — and the top-V
    * relation itself is one tiny aggregate, broadcast everywhere it is
    * used. Pairs are emitted executor-side from each document's sorted
    * kept-token array (nested scan-stage `transform`, x strictly before
    * y, so every pair appears in exactly one orientation); the only
    * shuffles are the per-document `collect_list` and the (x, y) count.
    */
  def pmiPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topV: Int,
      minPairDocs: Int,
      k: Int): DataFrame = {
    require(topV >= 2 && k >= 1 && minPairDocs >= 1, "degenerate knobs")
    val dt = df
      .select(col(idCol),
        explode(array_distinct(TextAnalysis.tokens(lower(col(textCol)))))
          .as("t"))
      .filter(col("t") =!= "")
    val dfreq = dt.groupBy(col("t")).agg(count(lit(1)).as("df"))
    // deterministic top-V: frequency desc, token asc — a total order, so
    // the boundary of the vocabulary never depends on partitioning
    val vocab = dfreq.orderBy(col("df").desc, col("t")).limit(topV)
    val arrs = dt.join(broadcast(vocab.select("t")), Seq("t"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("t"))).as("ts"))
    val pairs = arrs
      .select(explode(when(size(col("ts")) >= 2,
        flatten(transform(sequence(lit(1), size(col("ts")) - 1),
          i => transform(sequence(i + 1, size(col("ts"))),
            j => struct(element_at(col("ts"), i).as("x"),
              element_at(col("ts"), j).as("y"))))))
        .otherwise(array().cast("array<struct<x:string,y:string>>")))
        .as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    pairs.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minPairDocs)
      .join(broadcast(vocab.select(col("t").as("x"), col("df").as("c_x"))),
        Seq("x"))
      .join(broadcast(vocab.select(col("t").as("y"), col("df").as("c_y"))),
        Seq("y"))
      .crossJoin(broadcast(total))
      .select(col("x"), col("y"), col("c_xy"),
        round(log(col("c_xy").cast("double") * col("n_docs") /
          (col("c_x") * col("c_y"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("x"), col("y"))
      .limit(k)
  }
}
