package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training shards: assign documents to
  * fixed-token-budget packs, greedily, in deterministic order.
  *
  * Real pipelines pack per shard (bucket), not globally — a global greedy
  * pack would serialize the whole corpus through one task. Here the corpus
  * is split into `nBuckets` by `pmod(id, nBuckets)` (engine-portable,
  * unlike a hash; pmod keeps negative ids in [0, nBuckets) instead of
  * silently minting negative buckets) and packed independently per bucket
  * in ascending id order:
  * a document goes into the current pack unless it would push the pack
  * over `budget` tokens, in which case it opens the next pack. A document
  * longer than the budget occupies a pack of its own.
  *
  * Scale shape: ONE shuffle (repartition on bucket) followed by a
  * `sortWithinPartitions` external sort and a streaming `mapPartitions`
  * fold with O(1) state (current bucket, running token count, pack index)
  * — no bucket is ever materialized in memory, so bucket size is bounded
  * by disk, not RAM. The fold is deterministic because the sort key
  * (bucket, id) is total and the bucket→partition mapping is a pure
  * function of the bucket value.
  */
object Packing {

  /** Per-document pack assignment: (idCol, bucket, pack_idx, n_tokens).
    * `pack_idx` restarts at 1 within each bucket. */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      nBuckets: Int,
      tokenCounter: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextAnalysis.tokenCount): DataFrame = {
    require(budget >= 1, "token budget must be >= 1")
    require(nBuckets >= 1, "bucket count must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long"),
        pmod(col(idCol), lit(nBuckets)).cast("long"),
        // clamp to >= 0: the fold below tolerates 0-token docs (they join
        // the current pack without advancing it) but a negative count
        // would corrupt the running budget
        greatest(tokenCounter(col(textCol)), lit(0)))
      .toDF("id", "bucket", "n_tokens")
    base.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // several buckets may share a partition; reset state on change
        var curBucket = Long.MinValue
        var acc = 0L
        var pack = 0
        it.map { case (id, bucket, n) =>
          if (bucket != curBucket) { curBucket = bucket; pack = 1; acc = n.toLong }
          else if (acc + n > budget) { pack += 1; acc = n.toLong }
          else acc += n
          (id, bucket, pack, n)
        }
      }
      .toDF(idCol, "bucket", "pack_idx", "n_tokens")
  }

  /** GPT-style concat-and-split packing: within each bucket, documents are
    * concatenated in ascending id order and the token stream is cut into
    * fixed `blockSize` blocks that CROSS document boundaries — zero padding
    * waste, the standard causal-LM pretraining layout ([[packGreedy]] is
    * the no-split variant that pads instead of splitting). Returns one row
    * per (bucket, block): how many documents the block spans, its token
    * occupancy (only each bucket's last block is partial), and the
    * spanning id range.
    *
    * Shape: per-doc token offsets come from one running-sum window per
    * bucket (sort width = one bucket, the [[packGreedy]]/epoch-shuffle
    * bound — never a global sort), each doc then explodes into just the
    * blocks it intersects (`sequence(first, last)` — a doc adds
    * ceil(n/blockSize)+1 rows max), and one grouped aggregation emits the
    * block stats. All codegen'd expressions; no fold state.
    */
  def concatBlocks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockSize: Int,
      nBuckets: Int,
      tokenCounter: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextAnalysis.tokenCount): DataFrame = {
    require(blockSize >= 1, "block size must be >= 1")
    require(nBuckets >= 1, "bucket count must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("bucket"))
    val offs = df.select(col(idCol).cast("long").as("id"),
        pmod(col(idCol), lit(nBuckets)).cast("long").as("bucket"),
        greatest(tokenCounter(col(textCol)), lit(0)).cast("long").as("n"))
      .withColumn("off", sum(col("n")).over(w) - col("n"))
      .withColumn("total", sum(col("n")).over(wAll))
    val bs = blockSize.toLong
    offs
      // a 0-token doc occupies no block — and, unguarded, its span
      // sequence(floor(off/bs), floor((off+n-1)/bs)) would be DESCENDING
      // (start k, stop k-1: Spark generates [k, k-1], double-counting the
      // doc into the previous block). Unreachable via tokenCount (an empty
      // string still tokenizes to one '' token) but bpeishTokenCount does
      // return 0 for empty text, so the guard keeps the tokenizer swappable.
      // Filtered AFTER the window offsets so surviving docs keep exact
      // positions (an empty doc contributes 0 to every running sum).
      .filter(col("n") >= 1L)
      .select(col("id"), col("bucket"), col("total"),
        explode(sequence(floor(col("off") / bs),
          floor((col("off") + col("n") - 1L) / bs))).as("block_id"))
      .groupBy(col("bucket"), col("block_id"), col("total"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("id")).as("first_doc"),
        max(col("id")).as("last_doc"))
      .select(col("bucket"), col("block_id").cast("int").as("block_id"),
        col("n_docs"),
        least(lit(bs), col("total") - col("block_id") * bs).as("n_tokens"),
        col("first_doc"), col("last_doc"))
  }
}
