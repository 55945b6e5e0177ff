package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-shaped operators: ranked top-k per group (the distributed,
  * order-enforced form of the reference's top-5-tags pivot, SURVEY §2.6 W1)
  * and running totals.
  *
  * Scale notes: `row_number` over `Window.partitionBy(keys)` is one shuffle
  * on the keys with per-partition sort — no global sort, no driver
  * involvement. Ordering columns must form a total order (callers pass
  * tiebreakers) so results are reproducible across cluster sizes.
  */
object Windows {

  /** Keep the top `k` rows per group under a deterministic ordering. */
  def topKPerGroup(
      df: DataFrame,
      partitionCols: Seq[Column],
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Running (cumulative) sum of `valueCol` per group in `orderCols` order. */
  def runningTotal(
      df: DataFrame,
      partitionCols: Seq[Column],
      orderCols: Seq[Column],
      valueCol: Column,
      outCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, sum(valueCol).over(w))
  }

  /** Tumbling event-time buckets as a batch expression: floor(ts) to
    * `widthSeconds`. Identical semantics to Structured Streaming's
    * `window($"ts", ...)` start bound; used by both the batch query and the
    * streaming pipeline so the two stay consistent.
    */
  def tumble(ts: Column, widthSeconds: Int): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / widthSeconds) * widthSeconds)
}
