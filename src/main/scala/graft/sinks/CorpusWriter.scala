package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned + sorted corpus layout writer — the output half of a
  * training-data pipeline (the reference's exports are driver-side
  * Excel/CSV, `bangumi_data_ingestion.py:467-516`; at 100 TB the export
  * surface is a partition-pruned columnar layout instead).
  *
  * Layout contract:
  *  - hive-style directory partitioning on `partitionCols` → a reader
  *    filtering on them prunes whole directories at planning time;
  *  - rows sorted by `sortCols` within every output file → parquet
  *    row-group min/max statistics are tight, so range predicates on the
  *    sort key prune row groups inside the surviving files.
  *
  * Shape at 100 TB: ONE shuffle, keyed by (partitionCols, salt). Without
  * it, `partitionBy` makes every write task emit a file per partition
  * value it sees — tasks × values small files; with it, each hive
  * partition is written by exactly `filesPerPartition` tasks.
  * `filesPerPartition` is the skew control: a heavy partition value (one
  * dominant language, one hot day) splits across N sorted files instead of
  * bottlenecking one task — raise it until the largest partition ÷ N fits
  * an executor. Both the partition spray and the per-file sort scale per
  * row, never per partition count.
  */
object CorpusWriter {

  def writePartitioned(
      df: DataFrame,
      outDir: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      filesPerPartition: Int = 1): Unit = {
    require(partitionCols.nonEmpty && sortCols.nonEmpty,
      "need at least one partition column and one sort column")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    require(!df.columns.contains("__salt"),
      "input frame must not contain reserved column __salt")
    // deterministic salt from the sort key: same row → same file, and the
    // split stays balanced even when the sort key is clustered
    val salted = df.withColumn("__salt",
      pmod(hash(sortCols.map(col): _*), lit(filesPerPartition)))
    // explicit partition count: a layout-controlling shuffle must not be
    // AQE-coalesced (merging tasks would re-merge the salt split and fuse
    // partition values back into shared files)
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    salted
      .repartition(n, (partitionCols :+ "__salt").map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .drop("__salt")
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(outDir)
  }

  case class CompactionReport(filesBefore: Long, filesAfter: Long, rows: Long)

  /** Small-file compaction (the OPTIMIZE-style maintenance job): rewrite a
    * fragmented parquet corpus — e.g. what weeks of [[graft.streaming
    * .EventStreams.corpusIngest]] micro-batches leave behind — into
    * `filesPerPartition` sorted files per hive partition via
    * [[writePartitioned]] (same one-shuffle shape; file count becomes
    * partitions × filesPerPartition instead of partitions × micro-batches).
    * Writes to a NEW directory: at 100 TB the atomic swap is a catalog /
    * table-format pointer flip, never an in-place rewrite over live
    * readers. Returns before/after data-file counts + row count for the
    * maintenance log.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inDir: String,
      outDir: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      filesPerPartition: Int = 1): CompactionReport = {
    def dataFiles(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        // data files only: skip commit logs / _SUCCESS / checksums
        if (!name.startsWith("_") && !name.startsWith(".")) n += 1
      }
      n
    }
    val before = dataFiles(inDir)
    val df = spark.read.parquet(inDir)
    writePartitioned(df, outDir, partitionCols, sortCols, filesPerPartition)
    CompactionReport(before, dataFiles(outDir),
      spark.read.parquet(outDir).count())
  }

  /** JSONL corpus interchange (the `.jsonl.gz` shard format most public
    * text corpora ship as): one JSON object per line, gzip per part file.
    * Pure `DataFrameWriter` surface — distributed, splittable input on
    * re-read (gzip parts are not splittable individually, but one file per
    * task is exactly how these corpora are laid out and consumed). */
  def writeJsonl(df: DataFrame, outDir: String,
      compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(outDir)

  /** Schema-pinned JSONL read-back: an explicit schema (never inference —
    * at 100 TB schema inference is a full extra pass over the corpus, and
    * a malformed shard would silently widen types). */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(dir)
}
