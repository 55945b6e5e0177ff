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
      nBuckets: Int): DataFrame = {
    require(budget >= 1, "token budget must be >= 1")
    require(nBuckets >= 1, "bucket count must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long"),
        pmod(col(idCol), lit(nBuckets)).cast("long"),
        TextAnalysis.tokenCount(col(textCol)))
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
}
