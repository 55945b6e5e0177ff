package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine the rankings of independent
  * retrieval systems (lexical BM25, dense ANN, MIPS, …) into one list per
  * query. The reference pipeline has no retrieval at all; this is the
  * extension-surface composition step that turns the engine's individual
  * rankers (q31/q33/q38/q64/q66/q86) into the two-tower + lexical hybrid
  * every production RAG stack runs.
  */
object Fusion {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher '09):
    * `score(d) = Σ_systems 1 / (rrfK + rank_s(d))`, summed over the
    * systems that returned the document at all. Rank-based, so systems
    * with incomparable score scales (BM25 vs cosine) fuse without
    * calibration — the reason RRF is the default hybrid in practice.
    *
    * Inputs are (q_id, id, rank) frames — each system's top-N per query.
    * Output: top-`k` per query by fused score, with the number of systems
    * that surfaced each hit. Determinism: with two systems the IEEE sum is
    * order-independent (a+b == b+a); for 3+ the 6dp rounding plus id
    * tiebreak absorbs addition-order ulps (the q64 rule).
    *
    * Shape at 100 TB: the inputs are already k-sized per query (the heavy
    * lifting happened inside each ranker); fusion is one union + one
    * grouped sum over |Q|·N·systems rows — dim-sized relative to the
    * corpus, never touching it.
    */
  def rrf(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 1 && rrfK >= 0, "k must be >= 1 and rrfK >= 0")
    // enforce the "one rank per (query, doc) PER SYSTEM" input contract:
    // a malformed ranking carrying the same doc twice (e.g. a union of
    // shards) would otherwise contribute two reciprocal terms from ONE
    // system and inflate n_systems — keep its best rank instead
    val union = rankings
      .map(_.groupBy(col("q_id"), col("id")).agg(min(col("rank")).as("rank")))
      .reduce(_.unionByName(_))
    val fused = union.groupBy(col("q_id"), col("id"))
      .agg(
        round(sum(lit(1.0) / (lit(rrfK.toDouble) + col("rank"))), 6)
          .as("rrf_score"),
        count(lit(1)).as("n_systems"))
    Windows.topKPerGroup(fused, Seq(col("q_id")),
      Seq(col("rrf_score").desc, col("id").asc), k, "rank")
      .select(col("q_id"), col("id"), col("rrf_score"), col("n_systems"),
        col("rank"))
  }
}
