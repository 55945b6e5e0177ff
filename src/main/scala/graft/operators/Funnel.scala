package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for each user, the earliest chain of event
  * times completing `stages` IN ORDER (t1 < t2 < ... < tk, each stage's
  * event strictly after the previous stage's chosen event).
  *
  * The greedy earliest-first choice is exact for subsequence matching:
  * taking the minimum time for stage i never forecloses a completion a
  * later choice would have allowed. That makes the whole funnel a chain of
  * per-stage conditional aggregations — one `groupBy(user)` + semi-join
  * round per stage, all map-side-combinable `min`s keyed by user, no
  * per-user event sorting and no session state. Users missing a stage (or
  * whose stage events never occur after the previous stage) drop out via
  * the inner joins.
  *
  * Scale shape: k small (funnels are 3–5 stages); each round shuffles only
  * (user, t1..ti) aggregates plus the one stage's filtered events — the
  * event table is scanned once per stage with the stage filter pushed to
  * the scan, never materialized whole.
  */
object Funnel {

  /** Output: userCol, t1..tk (timestamps of the earliest in-order
    * completion) for users completing every stage. */
  def stageTimes(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val ev = events.select(col(userCol), col(typeCol).as("__stage"),
      col(tsCol).as("__ts"))
    val first = ev.filter(col("__stage") === stages.head)
      .groupBy(col(userCol)).agg(min(col("__ts")).as("t1"))
    stages.tail.zipWithIndex.foldLeft(first) { case (acc, (stage, i)) =>
      val k = i + 2
      val carried = col(userCol) +: (1 until k).map(j => col(s"t$j"))
      ev.filter(col("__stage") === stage)
        .join(acc, Seq(userCol))
        .filter(col("__ts") > col(s"t${k - 1}"))
        .groupBy(carried: _*)
        .agg(min(col("__ts")).as(s"t$k"))
    }
  }

  /** Weekly cohort retention: users bucketed by first-activity week, then
    * the classic retention triangle — for every (cohort_week, week_index)
    * the count and fraction of that cohort active in that week.
    *
    * Three aggregates, all keyed where their data already lives: first
    * activity per user and distinct (user, week) share the user hash
    * partitioning (one exchange feeds both), cohort sizes are a
    * weeks-sized relation that broadcasts into the final join. Nothing
    * is ever materialized per-event beyond the first scan.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val week = (c: org.apache.spark.sql.Column) =>
      to_date(date_trunc("week", c))
    val firsts = events.groupBy(col(userCol))
      .agg(week(min(col(tsCol))).as("cohort_week"))
    val activity = events
      .select(col(userCol), week(col(tsCol)).as("week"))
      .distinct()
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(firsts, Seq(userCol))
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("week_index"))
      .groupBy(col("cohort_week"), col("week_index"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_index"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 4)
          .as("retention"))
  }

  /** First-touch AND last-touch revenue attribution in one relation: each
    * conversion's value credited (a) to the latest touch at or before it
    * (last-touch — an as-of join, [[AsofJoin]]'s union-merge, so the
    * touch table is never theta-joined) and (b) to the user's first touch
    * ever, provided it precedes the conversion (first-touch — one
    * min-struct aggregate per user, deterministic via the tie column).
    * Conversions with no qualifying touch credit the `none` row, so both
    * value columns total the same number — the self-auditing property.
    *
    * Output: (touch_type, n_first, value_first, n_last, value_last), one
    * row per touch type seen by either model. The touch-type relation is
    * bounded by the event vocabulary; every per-event step is keyed by
    * the user column.
    */
  def attribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      valueCol: String,
      touchTypes: Seq[String],
      convType: String): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touch types must be non-empty and exclude the conversion type")
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(tsCol).as("touch_ts"),
        col(tieCol).as("touch_tie"), col(typeCol).as("touch_type"))
    val convs = events.filter(col(typeCol) === convType)
      .select(col(userCol), col(tsCol), col(valueCol).as("conv_value"))
    val lastAgg = AsofJoin.asofJoin(convs,
      touches.drop("touch_tie"), userCol, tsCol, "touch_ts", inner = false)
      .select(coalesce(col("touch_type"), lit("none")).as("touch_type"),
        col("conv_value"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_last"),
        round(sum(col("conv_value")), 2).as("value_last"))
    val firsts = touches.groupBy(col(userCol))
      .agg(min(struct(col("touch_ts"), col("touch_tie"),
        col("touch_type"))).as("f"))
    val firstAgg = convs.join(firsts, Seq(userCol), "left")
      .select(when(col("f").isNull || col("f.touch_ts") > col(tsCol),
        lit("none")).otherwise(col("f.touch_type")).as("touch_type"),
        col("conv_value"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_first"),
        round(sum(col("conv_value")), 2).as("value_first"))
    firstAgg.join(lastAgg, Seq("touch_type"), "full_outer")
      .select(col("touch_type"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("value_first"), lit(0.0)).as("value_first"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        coalesce(col("value_last"), lit(0.0)).as("value_last"))
  }

  /** Count ADJACENT occurrences of an event-type pattern per user — the
    * CEP-lite batch form ("view then click then purchase, consecutively"),
    * complementing [[stageTimes]], whose funnel semantics are subsequence
    * (anything may happen between stages). Each user's type sequence is
    * assembled once (sorted by (ts, tie) — collect order never matters)
    * and the pattern is counted with a scan-stage filter over window
    * starts; per-user cost is linear in events, the only exchange is the
    * per-user collect.
    */
  def adjacentPatternCounts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      pattern: Seq[String]): DataFrame = {
    require(pattern.size >= 2, "a pattern needs at least two stages")
    val n = pattern.size
    val seqs = events.groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("t"),
        col(tieCol).as("i"), col(typeCol).as("e")))).as("evs"))
      .select(col(userCol),
        transform(col("evs"), e => e.getField("e")).as("tl"))
    val hits = filter(
      sequence(lit(1), size(col("tl")) - (n - 1)),
      i => pattern.zipWithIndex.map { case (p, k) =>
        element_at(col("tl"), i + k) === p
      }.reduce(_ && _))
    seqs.select(col(userCol),
      size(col("tl")).cast("long").as("n_events"),
      when(size(col("tl")) >= n, size(hits).cast("long"))
        .otherwise(lit(0L)).as("n_matches"))
  }
}
