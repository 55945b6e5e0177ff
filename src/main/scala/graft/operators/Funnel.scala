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
}
