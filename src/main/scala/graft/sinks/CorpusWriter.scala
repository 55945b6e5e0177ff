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
      filesPerPartition: Int = 1,
      mode: String = "overwrite"): Unit = {
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
      .mode(mode)
      .parquet(outDir)
  }

  case class CompactionReport(filesBefore: Long, filesAfter: Long, rows: Long)

  /** Count the DATA files under `dir`: skip any file with a `_`- or
    * `.`-prefixed component anywhere in its path RELATIVE TO `dir`, not
    * just in its basename — corpusIngest's streaming sink leaves a
    * `_spark_metadata/` commit log whose entries are named `0`, `1`,
    * `9.compact`… and would otherwise count as data files. This is the
    * same hidden-path rule the parquet reader's file listing applies. */
  def countDataFiles(spark: org.apache.spark.sql.SparkSession,
      dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(p).toUri
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val rel = rootUri.relativize(fs.makeQualified(f.getPath).toUri).getPath
      val hidden = rel.split('/')
        .exists(c => c.startsWith("_") || c.startsWith("."))
      if (!hidden) n += 1
    }
    n
  }

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
      filesPerPartition: Int = 1,
      mode: String = "overwrite"): CompactionReport = {
    val before = countDataFiles(spark, inDir)
    val df = spark.read.parquet(inDir)
    writePartitioned(df, outDir, partitionCols, sortCols, filesPerPartition,
      mode)
    CompactionReport(before, countDataFiles(spark, outDir),
      spark.read.parquet(outDir).count())
  }

  /** Name of the manifest pointer file under a versioned corpus root. */
  val LatestManifest = "_latest"

  /** Publish `version` (a directory name under `rootDir`) as the current
    * corpus version by atomically replacing the `_latest` manifest. The
    * write is temp-file + atomic rename (`Options.Rename.OVERWRITE` — a
    * metadata-only atomic op on HDFS-like stores and POSIX), so a reader
    * calling [[resolveLatest]] at ANY instant sees either the old version
    * or the new one, never a torn pointer. The manifest starts with a `_`
    * so every hive-layout reader (and [[compact]]'s dataFiles counter)
    * already ignores it.
    */
  def publish(spark: org.apache.spark.sql.SparkSession, rootDir: String,
      version: String): Unit = {
    require(!version.contains("/") && version.nonEmpty &&
      !version.startsWith("_") && !version.startsWith("."),
      s"version must be a plain child-directory name, got '$version'")
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(hadoopConf)
    if (!fs.exists(root)) fs.mkdirs(root)
    val tmp = new org.apache.hadoop.fs.Path(root,
      s".${LatestManifest}.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    // FileContext.rename(OVERWRITE) is the atomic replace; FileSystem
    // .rename refuses an existing destination (delete-then-rename would
    // open a window with NO manifest)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, hadoopConf)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(root, LatestManifest),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Resolve the currently published version directory under `rootDir`,
    * or None when nothing has been published yet. Readers open
    * `resolveLatest(root)` instead of a raw path, so maintenance jobs can
    * rewrite into a fresh version directory and flip the pointer without
    * ever mutating files a live reader may hold open. */
  def resolveLatest(spark: org.apache.spark.sql.SparkSession,
      rootDir: String): Option[String] = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val manifest = new org.apache.hadoop.fs.Path(rootDir, LatestManifest)
    val fs = manifest.getFileSystem(hadoopConf)
    if (!fs.exists(manifest)) None
    else {
      val in = fs.open(manifest)
      val version =
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
      Some(s"$rootDir/$version")
    }
  }

  /** [[compact]] with a reader-safe atomic swap: rewrites the CURRENT
    * published version into the next version directory (`v000001`,
    * `v000002`, …) and flips the `_latest` pointer only after the rewrite
    * completes. A reader resolving mid-compact gets the old, fully intact
    * version; a reader resolving after gets the compacted one. The old
    * directory is left for the retention sweep (deleting it immediately
    * would pull files out from under readers that resolved before the
    * flip — at 100 TB old versions age out asynchronously, after the
    * longest-running reader horizon).
    *
    * Concurrent maintenance jobs are allocation-safe: each candidate slot
    * is claimed by an atomic create-no-overwrite marker before anything is
    * written, so two racing compactions land in DIFFERENT version
    * directories and the last `publish` wins (publishing is itself an
    * atomic pointer swap). The loser's directory ages out with the
    * retention sweep like any other superseded version.
    */
  def compactAndPublish(
      spark: org.apache.spark.sql.SparkSession,
      rootDir: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      filesPerPartition: Int = 1): CompactionReport = {
    val current = resolveLatest(spark, rootDir).getOrElse(
      throw new IllegalStateException(
        s"no published version under $rootDir — publish() the initial " +
          "ingest directory first"))
    // next version = max existing v<digits> dir + 1, NEVER derived from the
    // current pointer alone: a published non-versioned name (or a version
    // dir left by an aborted run) must not make the rewrite land on — and
    // overwrite — a directory a reader may still be scanning.
    // List-then-allocate alone would race a concurrent maintenance job
    // (both compute the same next version and write into one directory
    // before either publishes), so the slot is CLAIMED first: an atomic
    // create-no-overwrite of `<version>/.claim` — the loser of a tie gets
    // FileAlreadyExists and probes the next number. The marker is
    // dot-prefixed, so every hive-layout reader and the data-file counter
    // already ignore it.
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = fs.listStatus(root).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .collect { case s if s.length > 1 && s.startsWith("v") &&
        s.drop(1).forall(_.isDigit) => s.drop(1).toLong }
    var candidate = existing.foldLeft(-1L)(math.max) + 1
    var nextName: String = null
    while (nextName == null) {
      val name = f"v$candidate%06d"
      val claim = new org.apache.hadoop.fs.Path(root, s"$name/.claim")
      try {
        fs.create(claim, /* overwrite = */ false).close()
        nextName = name
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.io.IOException if fs.exists(claim) ||
              fs.exists(new org.apache.hadoop.fs.Path(root, name)) =>
          candidate += 1 // lost the race for this slot; probe the next
      }
    }
    // append, not overwrite: the claimed slot is empty by construction,
    // and an overwrite would delete-and-recreate the directory — removing
    // the .claim marker and briefly un-listing the slot, which is exactly
    // the window the claim exists to close
    val report = compact(spark, current, s"$rootDir/$nextName",
      partitionCols, sortCols, filesPerPartition, mode = "append")
    publish(spark, rootDir, nextName)
    report
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

  /** ORC interchange — the other columnar format warehouse pipelines
    * exchange (ships with Spark core; same predicate-pushdown/column-
    * pruning surface as parquet). */
  def writeOrc(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").orc(outDir)

  def readOrc(spark: org.apache.spark.sql.SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(dir)

  /** CSV interchange — the reference's own export format
    * (`bangumi_data_ingestion.py:522-524`) at engine scale. The options
    * make the round trip lossless where default CSV is not:
    * RFC 4180 quote-escaping (`escape="` — embedded quotes double, not
    * backslash), `multiLine` re-read for embedded newlines, and a
    * distinct `nullValue` sentinel (`\N`, the Hive/MySQL convention) so
    * NULL and empty string survive as different values (default CSV
    * writes both as "" and reads both back null).
    *
    * Known caveat, pinned in CorpusWriterSpec: a data string EQUAL to the
    * sentinel itself reads back as NULL — Spark's reader compares the
    * sentinel after unquoting, so no quoting scheme can disambiguate it.
    * This is inherent to CSV-with-sentinel; corpora that could contain
    * the literal sentinel should interchange via JSONL/ORC/parquet
    * (q82/q95), which have real type systems. */
  def writeCsv(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", "\\N")
      .csv(outDir)

  def readCsv(spark: org.apache.spark.sql.SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", "\\N")
      .option("multiLine", "true")
      .csv(dir)
}
