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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
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

  /** Unicode NFC canonical composition (codegen'd; ASCII rows are an
    * allocation-free identity). */
  def nfc_normalize(text: Column): Column = call_function("nfc_normalize", text)

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

  /** Sketch size for `nItems` distinct keys: ~16 bits per item (false-
    * positive rate well under 1% at the optimal hash count), rounded up to
    * a power of two, clamped to [2^20, 2^27]. The upper clamp matters
    * because the sketch is inlined as a LITERAL into a scan filter — a
    * 2^27-bit sketch is a 16 MB plan constant, the practical ceiling;
    * past ~8M items the caller sees the [[bloomFillFactor]] saturation
    * warning instead of a silently useless filter. */
  def bloomBitsFor(nItems: Long): Long = {
    val want = math.max(1L << 20, 16L * math.max(1L, nItems))
    val pow =
      if (java.lang.Long.bitCount(want) == 1) want
      else java.lang.Long.highestOneBit(want) << 1
    math.min(1L << 27, pow)
  }

  /** Fraction of bits set in a serialized bloom sketch (the 12-byte
    * header — version, hash count, word count — is skipped). A fill
    * factor beyond ~0.5 means the sketch is saturating: results stay
    * exact (the bloom only prefilters), but its work-bounding collapses
    * and every probe tends toward "maybe". */
  def bloomFillFactor(sketch: Array[Byte], numBits: Long): Double = {
    var set = 0L
    var i = 12
    while (i < sketch.length) {
      set += java.lang.Integer.bitCount(sketch(i) & 0xff)
      i += 1
    }
    set.toDouble / math.max(1L, numBits)
  }
}
