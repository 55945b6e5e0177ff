package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe grouped quantiles via fixed-width histograms.
  *
  * Spark's exact `percentile()` buffers EVERY value of a group in
  * aggregation state — the one aggregate whose memory grows linearly with
  * group size, an executor-OOM time bomb at 100 TB (a single hot group's
  * values must fit in one aggregation buffer). The classic fix is a
  * mergeable sketch; this operator uses the simplest one whose arithmetic
  * a SQL oracle can replay bit-for-bit: an equi-width histogram.
  * (`approx_percentile`'s Greenwald–Khanna state is also bounded, but its
  * merge order is plan-dependent, so no independent engine can reproduce
  * its exact output — untestable under this repo's hash gate.)
  *
  * Shape: pass 1 computes per-group `(lo, hi, n)` — constant state per
  * group; pass 2 bins values at scan stage (`floor((v - lo)/step)`, a
  * broadcast join against the bounds) and counts per `(group, bin)` —
  * map-side combinable with at most `bins` rows of state per group, so
  * executor memory is bounded by CONFIG (groups × bins longs), never by
  * data. The quantile is then read off the ≤`bins`-row cumulative
  * histogram with linear interpolation inside the containing bin:
  * deterministic, engine-portable IEEE arithmetic (one subtraction, one
  * division, one multiply-add per quantile — no libm calls), worst-case
  * value error ≤ (hi − lo)/bins.
  *
  * Two full scans beat one sort: at corpus scale the alternative exact
  * plan is a per-group sort of every value. Both passes are scan +
  * one bounded shuffle.
  *
  * Cardinality assumption: the bounds and rank-target relations carry one
  * row per GROUP, and both ride as broadcasts — so "bounded by config"
  * holds only while groupCol cardinality stays broadcast-sized (≲10M
  * groups). For a high-cardinality group key, drop the `broadcast` hints
  * at the two join sites and let AQE pick a shuffle join: still one row
  * per group, just exchanged instead of replicated.
  */
object Quantiles {

  /** One row per (group, quantile): columns `groupCol`, `q`, `est`, `n`.
    *
    * `quantiles` are rank fractions in (0, 1]; the estimate targets rank
    * `ceil(q·n)` (the inverse-CDF convention). Groups where every value is
    * identical (`hi == lo`) return that value exactly.
    */
  /** Ungrouped form: quantiles of `valueCol` over the whole relation —
    * the scale path for global threshold derivations (outlier bands,
    * length trims) where an exact `percentile()` would buffer EVERY value
    * of the corpus in ONE aggregation buffer. Output: one row per
    * quantile, columns `q`, `est`, `n`. */
  def globalHistogramQuantiles(
      df: DataFrame,
      valueCol: String,
      quantiles: Seq[Double],
      bins: Int = 256): DataFrame = {
    val g = Iterator.iterate("_g")(_ + "_").dropWhile(df.columns.contains).next()
    histogramQuantiles(df.withColumn(g, lit(1)), g, valueCol, quantiles, bins)
      .drop(g)
  }

  def histogramQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      quantiles: Seq[Double],
      bins: Int = 256): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
      "quantiles must be rank fractions in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._

    // null semantics match percentile(): null values neither count toward n
    // nor occupy a bin (an unfiltered null would floor() to a null bin that
    // sorts FIRST under the ascending cum window, shifting every estimate)
    val o = df.select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val rng = o.groupBy("g")
      .agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n"))
    val step = (col("hi") - col("lo")) / lit(bins.toDouble)
    // scan-stage binning: bounds ride as a broadcast, the only shuffle
    // carries (g, bin) pairs pre-combined map-side to <= bins per group
    val binned = o.join(broadcast(rng.select("g", "lo", "hi")), Seq("g"))
      .select(col("g"),
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((col("v") - col("lo")) / step).cast("int"))).as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy("g").orderBy("bin")
    val cum = binned
      .withColumn("cum", sum("c").over(wcum))
      .withColumn("cum_before", col("cum") - col("c"))
    // rank targets: ceil(q*n), one row per (group, quantile) — broadcast
    val targets = rng.crossJoin(broadcast(quantiles.toDF("q")))
      .withColumn("t", ceil(col("q") * col("n")))
    cum.join(broadcast(targets), Seq("g"))
      .filter(col("cum") >= col("t") && col("cum_before") < col("t"))
      .select(col("g").as(groupCol), col("q"),
        when(col("hi") === col("lo"), col("lo"))
          .otherwise(col("lo") + (col("hi") - col("lo")) / lit(bins.toDouble) *
            (col("bin") + (col("t") - col("cum_before")) / col("c"))).as("est"),
        col("n"))
  }
}
