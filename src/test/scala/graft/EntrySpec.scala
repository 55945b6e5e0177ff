package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() returns rows, and every declared
  * oracle key has a matching query. */
class EntrySpec extends AnyFunSuite with SparkSpec {

  test("entry() produces rows on the smoke corpus") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query implementation") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query names are unique and well-formed") {
    assert(SparkEntry.queries.keySet.forall(_.matches("qb?\\d+_[a-z0-9_]+")))
  }

  test("every query is gated: DuckDB oracle or a DOCUMENTED golden lane") {
    // the no-oracle lanes are a closed, deliberately-chosen set — each is
    // md5-pinned in GoldenSpec AND independently re-derived by a tools/
    // rederive_*.py script. A new query that lands outside oracleSql
    // without joining this list is an ungated query: fail loudly here
    // instead of silently entering the driver's weaker rows-only lane.
    // qb34–qb38 left this list in round 13: the parse boundary is exported
    // by tools/gen_bangumi_parsed.py and the projections/summary/quality
    // lanes replay in DuckDB SQL (SparkEntry.bangumiOracle) — they are now
    // fully oracle-gated (and still golden-pinned in GoldenSpec).
    val goldenLanes = Set(
      "q39_rolling_chunks",  // rederive_chunks.py
      "q83_deflate_ratio",   // rederive_deflate.py
      "qb39_media_decode", "qb40_media_frames", "qb41_audio_decode",
      "qb42_gif_frames", "qb43_audio_frames",
      "qb44_media_resize", "qb45_image_neardup",
      "qb46_audio_neardup") // rederive_media.py
    val ungated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(ungated === goldenLanes,
      s"queries outside the oracle gate and the documented golden set: " +
        s"${ungated -- goldenLanes}; stale golden entries: " +
        s"${goldenLanes -- ungated}")
  }
}
