package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Checkpoints, Similarity}
import graft.operators.TextAnalysis

/** Dev measurement (r17, verdict task 4): block-manager growth across a
  * LONG-LIVED session composing many pair-generator calls — the leak
  * `graft.Bench`'s between-lane quiesce works around (round-4 measured
  * 2.5–4.7× timing inflation), now measured directly against the
  * [[graft.operators.Checkpoints]] lifecycle.
  *
  * Runs N (default 50) `cellNearDupPairs` queries in ONE session, in two
  * modes:
  *   - `leak`   — the pre-r17 behavior: materialize each result, never
  *                release (operator checkpoints accumulate);
  *   - `scoped` — call `Checkpoints.releaseTracked()` after each result
  *                is materialized (the documented session-hygiene point).
  * After every query: persistent-RDD count, storage memory used, tracked
  * count. One JSON line per mode with first/last/max.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.CkptGrowth"
  */
object CkptGrowth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_CKPT_QUERIES", "50").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val vecs = TextAnalysis.hashedTfVectors(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text", dim = 64)
      .select(col("doc_id"), col("vec"))
      .localCheckpoint(eager = true) // the shared INPUT, outside the A/B

    def storageBytes(): Long =
      spark.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum

    // the r17 adoption sweep covers far more than the pair generators —
    // SPARK_GRAFT_CKPT_MIX=1 cycles four tracked operator families
    // (cell pairs, per-group sampled quantiles, KMV sketch overlap,
    // global row number) so the growth measurement exercises them all
    val mixed = sys.env.get("SPARK_GRAFT_CKPT_MIX").contains("1")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .localCheckpoint(eager = true) // shared input, outside the A/B
    val mixQueries: Array[() => org.apache.spark.sql.DataFrame] = Array(
      () => Similarity.cellNearDupPairs(vecs, "doc_id", "vec", 0.9),
      () => graft.operators.Sampling.sampledQuantilesByGroup(
        docs, "lang", "doc_id", length(col("text")), Seq(0.5, 0.9), 256),
      () => TextAnalysis.kmvBigramOverlap(docs, "lang", "text", "en", "zh"),
      () => graft.operators.Windows.globalRowNumber(
        docs.select(col("doc_id"), length(col("text")).as("len")),
        Seq(col("len").desc, col("doc_id").asc), "rank"))

    def run(mode: String): Unit = {
      // clear the previous mode's residue (all operator-internal
      // checkpoints are tracked) WITHOUT touching the shared input above
      Checkpoints.releaseTracked()
      System.gc()
      val rddCounts = Array.ofDim[Int](nQueries)
      val bytes = Array.ofDim[Long](nQueries)
      val t0 = System.nanoTime()
      (0 until nQueries).foreach { q =>
        // materialize the output (the caller's side of the contract)
        val df = if (mixed) mixQueries(q % mixQueries.length)()
          else Similarity.cellNearDupPairs(vecs, "doc_id", "vec", 0.9)
        df.write.format("noop").mode("overwrite").save()
        if (mode == "scoped") Checkpoints.releaseTracked()
        rddCounts(q) = spark.sparkContext.getPersistentRDDs.size
        bytes(q) = storageBytes()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"metric":"ckpt_growth","mode":"$mode","mixed":$mixed,""" +
        s""""queries":$nQueries,""" +
        s""""rdds_first":${rddCounts.head},"rdds_last":${rddCounts.last},""" +
        s""""rdds_max":${rddCounts.max},""" +
        s""""mb_first":${bytes.head / 1048576},"mb_last":${bytes.last / 1048576},""" +
        s""""mb_max":${bytes.max / 1048576},"secs":${
          String.format(java.util.Locale.ROOT, "%.1f", Double.box(secs))}}""")
    }

    run("leak")
    run("scoped")
    spark.stop()
  }
}
