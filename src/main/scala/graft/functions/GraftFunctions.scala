package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration + Column wrappers for graft's custom Catalyst expressions.
  *
  * Registered through the session's `FunctionRegistry`, so the functions are
  * usable from SQL text as well as the DataFrame API (and the Column wrapper
  * avoids depending on any non-public Column constructor).
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "infobox_to_map", exprs => InfoboxToMap(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_chunks", exprs => RollingHashChunks(exprs.head,
        intArg(exprs, 1, 16), intArg(exprs, 2, 6)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    // Catalyst ships distributed bloom-filter expressions for its runtime
    // join filters but does not register them for users; exposing them
    // through the registry keeps the public-API-only Column path.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
          .toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain", exprs =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }

  private[functions] def intArg(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      i: Int, default: Int): Int =
    if (exprs.length > i) exprs(i).eval().asInstanceOf[Number].intValue
    else default

  /** Flatten a Bangumi infobox JSON array into map<string,string> (F1). */
  def infobox_to_map(c: Column): Column = call_function("infobox_to_map", c)

  /** Content-defined chunk fingerprints via Rabin–Karp rolling hash. */
  def rolling_chunks(c: Column, window: Int = 16, maskBits: Int = 6): Column =
    call_function("rolling_chunks", c,
      org.apache.spark.sql.functions.lit(window),
      org.apache.spark.sql.functions.lit(maskBits))

  /** 64-bit SimHash of a token array as 16 hex chars (codegen'd kernel). */
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)

  /** Distributed bloom-filter build over xxhash64 values (binary sketch of
    * `numBits` bits; partial sketches OR-merge map-side, so the shuffle
    * carries one sketch per task, never the keys). */
  def bloom_agg(h64: Column, estimatedItems: Long, numBits: Long): Column =
    call_function("graft_bloom_agg", h64,
      org.apache.spark.sql.functions.lit(estimatedItems),
      org.apache.spark.sql.functions.lit(numBits))

  /** Membership probe against a bloom sketch (no false negatives). The
    * sketch must be a literal or scalar subquery — Catalyst enforces it. */
  def bloom_might_contain(sketch: Column, h64: Column): Column =
    call_function("graft_bloom_might_contain", sketch, h64)
}
