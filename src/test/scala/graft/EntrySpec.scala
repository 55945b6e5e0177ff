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

  test("every query is gated by a DuckDB oracle — the golden list is CLOSED") {
    // As of round 14 EVERY lane has an oracleSql entry: the former
    // golden-only lanes (q39/q83 via tools/gen_text_fixtures.py,
    // qb39–qb46 via tools/gen_media_fixtures.py — both pin-checked
    // against the GoldenSpec md5s before writing) replay their
    // relational tails in DuckDB over typed-parquet boundary fixtures,
    // the qb34 precedent. A new query landing outside oracleSql is an
    // ungated query: fail loudly here instead of silently entering the
    // driver's weaker rows-only lane.
    val ungated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(ungated.isEmpty, s"queries outside the oracle gate: $ungated")
  }
}
