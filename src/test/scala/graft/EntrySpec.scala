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
}
