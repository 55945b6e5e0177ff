package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

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

  /** Scale-safe GLOBAL `row_number` — the distributed replacement for
    * `Window.orderBy(...)` with no `partitionBy`, which funnels EVERY row
    * through one task (a single-partition Exchange + Sort: the plan shape
    * that turns a 10^8-node ranking into one straggler).
    *
    * Shape: range-partition on the order (each partition holds a
    * contiguous slice of the global order, partitions stay parallel),
    * sort within partitions, then `rank = partition offset + local
    * row_number`. The offsets come from per-partition counts — at most
    * `spark.sql.shuffle.partitions` rows, bounded by cluster CONFIG, not
    * by data — so the driver-side cumulative sum is a bounded collect by
    * construction (the codebook-read-back discipline). The local
    * row_number windows are partitioned by partition id and run in
    * parallel; the offset table rides back as a broadcast join.
    *
    * `orderCols` must form a TOTAL order (callers pass tiebreakers);
    * under a total order the result is deterministic regardless of where
    * the range boundaries fall. The intermediate `localCheckpoint` pins
    * partition ids so the count pass and the rank pass see the same
    * layout (and cuts the caller's lineage, which for iterative callers
    * like PageRank is already the house rule).
    */
  def globalRowNumber(
      df: DataFrame,
      orderCols: Seq[Column],
      rankCol: String): DataFrame = {
    val ranged = df
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("_gpid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("_gpid")).agg(count(lit(1)).as("_cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = acc; acc += c; (pid, o) }
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq.map(Row.fromTuple), 1),
      StructType(Seq(StructField("_gpid", IntegerType, nullable = false),
        StructField("_off", LongType, nullable = false))))
    val w = Window.partitionBy(col("_gpid")).orderBy(orderCols: _*)
    ranged.join(broadcast(offDf), Seq("_gpid"))
      .withColumn(rankCol, (col("_off") + row_number().over(w)).cast("int"))
      .drop("_gpid", "_off")
  }
}
