package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid TIME-SERIES repair and slowly-changing-dimension history
  * builds over an event log — the two temporal reshapes every warehouse
  * needs before events become features: (1) a dense per-key bucket grid
  * with gaps made explicit and values carried forward, (2) validity
  * intervals from a change log (SCD Type 2).
  *
  * Scale shape (both): everything is keyed by the entity column, so the
  * only exchanges are the per-key hash shuffle plus the per-key window
  * sort — no global sort, no driver materialization. The dense grid is
  * generated EXECUTOR-SIDE per key with `sequence(lo, hi, step)` +
  * `explode` (the grid never crosses a shuffle: it is born after the
  * span aggregate, already partitioned by key). Grid volume is bounded
  * by keys × span/step — the caller picks the bucket so that per-key
  * row counts stay sane (hours over a year = 8,760 rows/key; that is
  * the intended envelope, and 1000 executors split keys, not spans).
  */
object Temporal {

  /** Dense per-key time grid with last-observation-carried-forward.
    *
    * Buckets `tsCol` to `bucket` granularity (`date_trunc` unit), sums
    * `valueCol` and counts events per (key, bucket), then fills every
    * missing bucket between each key's first and last observation:
    * `n_events = 0`, `is_gap = true`, and `value_filled` carried from
    * the most recent observed bucket (LOCF — `last(..., ignoreNulls)`
    * over the per-key bucket order; the first bucket is always
    * observed, so the fill is total).
    *
    * Two exchanges: the (key, bucket) aggregation hash shuffle, then
    * the per-key window sort (the span aggregate and the grid join both
    * reuse the same key partitioning). The LOCF window is
    * rows-unbounded-preceding — a single forward pass per key, no
    * second sort.
    */
  def gapFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      bucket: String = "hour"): DataFrame = {
    val step = bucket.toLowerCase match {
      case "hour" => expr("INTERVAL 1 HOUR")
      case "day" => expr("INTERVAL 1 DAY")
      case "minute" => expr("INTERVAL 1 MINUTE")
      case other => throw new IllegalArgumentException(
        s"unsupported bucket '$other' (hour|day|minute)")
    }
    val observed = events
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_obs"),
        round(sum(col(valueCol)), 2).as("v_obs"))
    val spans = observed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val dense = spans.select(col(keyCol),
      explode(sequence(col("lo"), col("hi"), step)).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(observed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_events"),
        col("n_obs").isNull.as("is_gap"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("value_filled"))
  }

  /** SCD Type-2 history: collapse an event log into validity intervals
    * of `attrCol` per key — consecutive equal values merge into one
    * segment; each segment gets `valid_from` (its first event),
    * `valid_to` (the next segment's `valid_from`, null for the open
    * segment), `is_current`, and `n_events` (events inside it).
    *
    * The segment id is the classic gaps-and-islands running sum of
    * change flags (`lag` null-safe-compared to the current value, so
    * the first row of every key always opens a segment). `tieCol`
    * breaks equal timestamps deterministically — interval boundaries
    * must not depend on partition order.
    *
    * One hash exchange on the key feeds every step: the change-flag
    * and running-sum windows, the per-(key, seg) aggregate (key-prefix
    * grouping on already-key-partitioned rows), and the valid_to
    * `lead` window all share the per-key partitioning, so Spark plans
    * a single Exchange and per-key sorts — no global ordering anywhere.
    */
  def scd2(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      attrCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val chg = when(lag(col(attrCol), 1).over(wOrd) <=> col(attrCol), lit(0L))
      .otherwise(lit(1L))
    val segs = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(attrCol))
      .withColumn("seg",
        sum(chg).over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(keyCol), col("seg"))
      .agg(min(col(attrCol)).as("attr_value"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    // seg is monotone in event order, so it totalizes the rare case of
    // two segments opening at the same instant (tie-broken events with
    // different attr values) — lead() must never see an ambiguous order
    val wSeq = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from"), col("seg"))
    segs.select(col(keyCol), col("attr_value"), col("valid_from"),
      lead(col("valid_from"), 1).over(wSeq).as("valid_to"),
      col("n_events"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Time-weighted average of `valueCol` per key over [first, last] event
    * — the IoT/metrics summary where a value that HELD for an hour must
    * outweigh one that held for a second, which a plain `avg` gets
    * backwards. Each event's value is weighted by its holding time
    * (`lead(ts) − ts`, zero-order hold; the last event closes the
    * integral). Time deltas are computed on EXACT microsecond longs
    * (`unix_micros`), never on timestamps cast to double — at epoch
    * magnitude a double has already lost the microseconds, and both
    * engines must agree bit-for-bit on the weights.
    *
    * Keys with a degenerate span (single event, or every event at the
    * same instant) fall back to the plain max — deterministic because
    * the window order is tie-broken by `tieCol`.
    *
    * One hash exchange on the key: the lead() window and the final
    * aggregate share the per-key partitioning. Output: (key, n_events,
    * span_seconds, twa).
    */
  def timeWeightedAvg(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    val stepped = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("dt_us", (lead(us, 1).over(w) - us).cast("double"))
    stepped.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round((max(us) - min(us)).cast("double") / lit(1e6), 6)
          .as("span_seconds"),
        sum(col(valueCol) * col("dt_us")).as("wsum"),
        sum(col("dt_us")).as("wtot"),
        max(col(valueCol)).as("vmax"))
      .select(col(keyCol), col("n_events"), col("span_seconds"),
        when(col("wtot") > 0, round(col("wsum") / col("wtot"), 4))
          .otherwise(round(col("vmax"), 4)).as("twa"))
  }
}
