package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact point-in-interval range join without a nested loop.
  *
  * Spark plans a raw `p BETWEEN lo AND hi` join as BroadcastNestedLoop (or
  * a cartesian product) — quadratic work that is unusable at corpus scale.
  * The standard fix is bin bucketing: pick a bin width `w`, give every
  * point the single bin `floor(p / w)`, explode every interval to one row
  * per bin it overlaps, then equi-join on the bin and re-check the exact
  * range predicate. Each matching (point, interval) pair meets in exactly
  * one bin — the point's own — so no dedup pass is needed.
  *
  * Scale shape: one hash shuffle on the bin key (AQE handles hot bins);
  * interval blow-up is `(hi - lo) / w + 1` rows per interval, so `w` should
  * be on the order of the typical interval length — the classic
  * time-series/genomics binning tradeoff. All expressions are codegen'd
  * builtins; the post-join range filter runs inside the join stage.
  */
object RangeJoin {

  /** Join `points` (long column `pointCol`) to `intervals` (long columns
    * `loCol`, `hiCol`, both inclusive) on `lo <= p <= hi`. Output: all
    * point columns + all interval columns. Intervals with `hi < lo` match
    * nothing (and are dropped before the explode — `sequence` would
    * otherwise generate a DESCENDING bin range).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, "bin width must be >= 1")
    val bin = "__bin"
    // floor-division in PURE LONG arithmetic: `floor(col / w)` would go
    // through double division, whose ~2^53 mantissa silently mis-bins
    // ns/µs-epoch-scale values (ulp ≈ 256 at 1.2e18) and drops matches.
    // pmod keeps the subtraction an exact multiple of w, so integral `div`
    // (truncation) equals mathematical floor for negatives too.
    def binOf(c: String) = expr(
      s"(CAST(`$c` AS BIGINT) - pmod(CAST(`$c` AS BIGINT), ${binWidth}L)) div ${binWidth}L")
    val p = points.withColumn(bin, binOf(pointCol))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn(bin, explode(sequence(binOf(loCol), binOf(hiCol))))
    p.join(iv, Seq(bin))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bin)
  }

  /** Interval × interval OVERLAP join (`loA <= hiB AND loB <= hiA`, all
    * inclusive) with the same bin-bucketing discipline — and WITHOUT a
    * dedup pass: an overlapping pair meets in every shared bin, so the
    * join keeps only the OVERLAP-START bin (`bin == bin(max(loA, loB))`),
    * where each pair appears exactly once. No `distinct()`, so nothing
    * data-sized is re-shuffled after the join.
    *
    * Column names must not collide across the two inputs (pre-rename on
    * the caller side, as with the as-of join). Output: all left + all
    * right columns for each overlapping pair.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftLo: String,
      leftHi: String,
      rightLo: String,
      rightHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, "bin width must be >= 1")
    val bin = "__bin"
    // pure-long floor-div (same ulp rationale as pointInInterval):
    // (x - pmod(x, w)) div w — never a double division
    def binOf(x: String) = expr(
      s"(CAST($x AS BIGINT) - pmod(CAST($x AS BIGINT), ${binWidth}L)) div ${binWidth}L")
    val l = left.filter(col(leftLo) <= col(leftHi))
      .withColumn(bin,
        explode(sequence(binOf(s"`$leftLo`"), binOf(s"`$leftHi`"))))
    val r = right.filter(col(rightLo) <= col(rightHi))
      .withColumn(bin,
        explode(sequence(binOf(s"`$rightLo`"), binOf(s"`$rightHi`"))))
    l.join(r, Seq(bin))
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi))
      .filter(col(bin) ===
        binOf(s"greatest(`$leftLo`, `$rightLo`)"))
      .drop(bin)
  }
}
