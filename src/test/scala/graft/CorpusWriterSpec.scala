package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned/sorted write path: hive layout, within-file sort order,
  * tight per-file min/max, and partition pruning on re-read — the output
  * half of the 100 TB pipeline (SURVEY §2.2 extension).
  */
class CorpusWriterSpec extends AnyFunSuite with SparkSpec {

  private def docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private def dataFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq

  private def withOut[A](body: Path => A): A = {
    val dir = Files.createTempDirectory("graft_corpus_writer")
    try body(dir)
    finally {
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("hive layout + within-file sort + lossless round trip") {
    withOut { dir =>
      sinks.CorpusWriter.writePartitioned(docs, dir.toString,
        partitionCols = Seq("lang", "source"), sortCols = Seq("doc_id"))

      // layout: every data file sits under lang=…/source=… directories
      val files = dataFiles(dir)
      assert(files.nonEmpty)
      assert(files.forall { f =>
        val rel = dir.relativize(f).toString
        rel.matches("lang=[^/]+/source=[^/]+/[^/]+\\.parquet")
      }, s"unexpected layout: ${files.map(dir.relativize).mkString(", ")}")

      // within-file sort: each file's doc_ids are ascending (tight parquet
      // row-group stats), and per-file [min,max] match the file content
      files.foreach { f =>
        val ids = spark.read.parquet(f.toString)
          .select("doc_id").collect().map(_.getLong(0))
        assert(ids.sameElements(ids.sorted),
          s"file ${dir.relativize(f)} is not sorted by doc_id")
      }

      // lossless: re-read equals input (partition cols come back from dirs)
      val back = spark.read.parquet(dir.toString)
      assert(back.columns.sorted.sameElements(docs.columns.sorted))
      val a = docs.select(docs.columns.sorted.map(col): _*)
        .collect().map(_.toString).sorted
      val b = back.select(docs.columns.sorted.map(col): _*)
        .collect().map(_.toString).sorted
      assert(a.sameElements(b))
    }
  }

  test("filtered re-read prunes partitions at planning time") {
    withOut { dir =>
      sinks.CorpusWriter.writePartitioned(docs, dir.toString,
        partitionCols = Seq("lang", "source"), sortCols = Seq("doc_id"))
      val enFiles = dataFiles(dir)
        .count(_.toString.contains("lang=en/"))
      val all = dataFiles(dir).size
      assert(enFiles > 0 && enFiles < all, "fixture must have several langs")

      val filtered = spark.read.parquet(dir.toString)
        .filter(col("lang") === "en")
      filtered.collect()
      val scan = filtered.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      assert(scan.metadata("PartitionFilters").contains("lang"),
        s"partition filter not pushed: ${scan.metadata("PartitionFilters")}")
      assert(scan.metrics("numFiles").value === enFiles,
        "scan read more files than the lang=en partitions")
    }
  }

  test("filesPerPartition splits heavy partitions into N sorted files") {
    withOut { dir =>
      // enough shuffle partitions that the 5 langs × 3 salts rarely collide
      withSQLConf("spark.sql.shuffle.partitions" -> "64") {
        sinks.CorpusWriter.writePartitioned(docs, dir.toString,
          partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
          filesPerPartition = 3)
      }
      val byDir = dataFiles(dir).groupBy(_.getParent.getFileName.toString)
      assert(byDir.nonEmpty)
      // the heavy partitions split into multiple files (small ones may
      // hash all salts into one task), every file stays sorted, and
      // nothing is lost in the salt spray
      assert(byDir.values.map(_.size).max > 1,
        s"no partition split: ${byDir.view.mapValues(_.size).toMap}")
      byDir.foreach { case (d, fs) =>
        assert(fs.size <= 3, s"$d got ${fs.size} files")
        fs.foreach { f =>
          val ids = spark.read.parquet(f.toString)
            .select("doc_id").collect().map(_.getLong(0))
          assert(ids.sameElements(ids.sorted))
        }
      }
      assert(spark.read.parquet(dir.toString).count() === docs.count())
    }
  }

  test("compact: fragmented corpus collapses to one sorted file per partition, lossless") {
    withOut { frag => withOut { out =>
      // simulate weeks of micro-batch ingest: 12 tiny files per partition
      docs.repartition(12).write.partitionBy("lang")
        .mode("overwrite").parquet(frag.toString)
      val fragFiles = dataFiles(frag).size
      assert(fragFiles > 10, s"fixture not fragmented: $fragFiles files")

      val report = sinks.CorpusWriter.compact(spark, frag.toString,
        out.toString, partitionCols = Seq("lang"), sortCols = Seq("doc_id"))
      assert(report.filesBefore === fragFiles)
      assert(report.rows === docs.count())
      val langs = spark.read.parquet(frag.toString)
        .select("lang").distinct().count()
      assert(report.filesAfter === langs,
        s"expected one file per partition, got ${report.filesAfter}")

      // content identical, order aside
      val a = spark.read.parquet(frag.toString)
        .select("doc_id", "lang", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val b = spark.read.parquet(out.toString)
        .select("doc_id", "lang", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(a === b)
      // and every compacted file is sorted by the sort key
      dataFiles(out).foreach { f =>
        val ids = spark.read.parquet(f.toString)
          .select("doc_id").collect().map(_.getLong(0))
        assert(ids.sameElements(ids.sorted), s"$f not sorted")
      }
    }}
  }

  test("countDataFiles ignores commit logs and hidden dirs, not just basenames") {
    withOut { frag =>
      docs.repartition(3).write.partitionBy("lang")
        .mode("overwrite").parquet(frag.toString)
      val pure = dataFiles(frag).size
      // what a streaming file sink leaves behind: a _spark_metadata commit
      // log whose entries are NOT underscore-prefixed themselves — only
      // the DIRECTORY is, so a basename-only filter counts them as data
      val meta = frag.resolve("_spark_metadata")
      Files.createDirectories(meta)
      Files.writeString(meta.resolve("0"), "v1")
      Files.writeString(meta.resolve("9.compact"), "v1")
      // plus an orphaned task-staging dir (dot-prefixed component)
      val staging = frag.resolve(".staging-123")
      Files.createDirectories(staging)
      Files.writeString(staging.resolve("part-orphan.parquet"), "x")
      assert(sinks.CorpusWriter.countDataFiles(spark, frag.toString) === pure,
        "commit-log / staging entries counted as data files")
    }
  }

  test("publish/resolveLatest: atomic pointer flip, reader-safe mid-compact") {
    withOut { root =>
      // nothing published yet
      assert(sinks.CorpusWriter.resolveLatest(spark, root.toString).isEmpty)

      // initial ingest lands in v000000 and is published
      val v0 = root.resolve("v000000")
      docs.repartition(6).write.partitionBy("lang")
        .mode("overwrite").parquet(v0.toString)
      sinks.CorpusWriter.publish(spark, root.toString, "v000000")
      assert(sinks.CorpusWriter.resolveLatest(spark, root.toString)
        === Some(s"$root/v000000"))

      // a reader that resolved BEFORE the maintenance job keeps a fully
      // intact directory for its whole scan
      val preSwapDir = sinks.CorpusWriter.resolveLatest(spark, root.toString).get
      val preSwapRows = spark.read.parquet(preSwapDir).count()

      val report = sinks.CorpusWriter.compactAndPublish(spark, root.toString,
        partitionCols = Seq("lang"), sortCols = Seq("doc_id"))
      assert(report.rows === docs.count())

      // the pointer now names the compacted version; the old version is
      // still on disk (retention sweep deletes it later, after the
      // longest-running reader horizon)
      assert(sinks.CorpusWriter.resolveLatest(spark, root.toString)
        === Some(s"$root/v000001"))
      assert(spark.read.parquet(preSwapDir).count() === preSwapRows)
      assert(spark.read.parquet(s"$root/v000001").count() === preSwapRows)

      // the manifest itself is invisible to a hive-layout read of a version
      // dir (it lives at the root, underscore-prefixed)
      val manifest = root.resolve(sinks.CorpusWriter.LatestManifest)
      assert(Files.exists(manifest))
      assert(Files.readString(manifest) === "v000001")
    }
  }

  test("lossless CSV: null vs empty, quotes, newlines, CJK all survive") {
    val spark2 = spark
    import spark2.implicits._
    val hostile = Seq(
      (1L, "plain text"),
      (2L, ""), // empty string — naive CSV reads this back as null
      (3L, null.asInstanceOf[String]), // real null
      (4L, "line one\nline two\r\nline three"), // embedded newlines
      (5L, "she said \"hi\", twice"), // quotes + the delimiter
      (6L, "多语言 текст mixed") // CJK/Cyrillic
    ).toDF("doc_id", "text")
    withOut { dir =>
      sinks.CorpusWriter.writeCsv(hostile, dir.toString)
      val back = sinks.CorpusWriter.readCsv(spark, dir.toString, hostile.schema)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toMap
      val want = hostile.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
      assert(back === want)
    }
    // the documented caveat, pinned: a data string equal to the null
    // sentinel itself is the ONE value CSV-with-sentinel cannot round-trip
    // (Spark compares the sentinel post-unquote) — it reads back as null.
    // If this pin ever FAILS, the limitation is gone: delete the caveat
    // from the writeCsv scaladoc.
    withOut { dir =>
      val sentinel = Seq((1L, "\\N")).toDF("doc_id", "text")
      sinks.CorpusWriter.writeCsv(sentinel, dir.toString)
      val back = sinks.CorpusWriter
        .readCsv(spark, dir.toString, sentinel.schema).collect()
      assert(back.length === 1 && back(0).isNullAt(1))
    }
    // ORC: same hostile set, schema-pinned, full-map equality
    withOut { dir =>
      sinks.CorpusWriter.writeOrc(hostile, dir.toString)
      val back = sinks.CorpusWriter.readOrc(spark, dir.toString, hostile.schema)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toMap
      val want = hostile.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
      assert(back === want)
    }
  }

  test("Avro round trip: logical types, unions, and hostile strings survive") {
    import org.apache.spark.sql.Row
    val spark2 = spark
    import spark2.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val preEpoch = java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999")
    val rows = Seq(
      Row(1L, "plain", new java.math.BigDecimal("12345.67"), ts,
        Array[Byte](1, 2, 3), java.sql.Date.valueOf("2024-03-01")),
      Row(2L, "多语言\nline2", new java.math.BigDecimal("-0.01"), preEpoch,
        Array[Byte](), java.sql.Date.valueOf("1969-01-01")),
      Row(3L, null, new java.math.BigDecimal("0.00"), null, null, null))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("d",
        org.apache.spark.sql.types.DecimalType(10, 2)),
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("dt",
        org.apache.spark.sql.types.DateType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    withOut { dir =>
      sinks.AvroCorpus.writeAvro(df, dir.toString)
      val back = sinks.AvroCorpus.readAvro(spark, dir.toString, schema)
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.select(col("id"), col("s"), col("d"),
          unix_micros(col("t")).as("t_us"), hex(col("b")).as("bh"),
          col("dt").cast("string").as("dts"))
          .collect().map(_.toString).sorted.toSeq
      assert(canon(back) === canon(df))
      // µs precision explicitly: .123456 survives, .999999 pre-epoch too
      val us = back.filter(col("id") === 1L)
        .select(unix_micros(col("t"))).head().getLong(0)
      assert(us % 1000000L === 123456L)
      val pre = back.filter(col("id") === 2L)
        .select(unix_micros(col("t"))).head().getLong(0)
      assert(pre === -1L)
    }
  }

  test("compactAndPublish never lands on an existing version directory") {
    withOut { root =>
      // v000000 and v000001 already exist (v000001 = an earlier compaction
      // a reader may still be scanning); the CURRENT pointer names a
      // non-versioned ingest dir — the next rewrite must allocate v000002,
      // not fall back onto v000001 and overwrite it
      val v0 = root.resolve("v000000")
      docs.repartition(4).write.partitionBy("lang")
        .mode("overwrite").parquet(v0.toString)
      sinks.CorpusWriter.publish(spark, root.toString, "v000000")
      sinks.CorpusWriter.compactAndPublish(spark, root.toString,
        partitionCols = Seq("lang"), sortCols = Seq("doc_id"))
      val v1Files = dataFiles(root.resolve("v000001")).map(_.toString).toSet

      val hotfix = root.resolve("hotfix-ingest")
      docs.repartition(2).write.partitionBy("lang")
        .mode("overwrite").parquet(hotfix.toString)
      sinks.CorpusWriter.publish(spark, root.toString, "hotfix-ingest")
      sinks.CorpusWriter.compactAndPublish(spark, root.toString,
        partitionCols = Seq("lang"), sortCols = Seq("doc_id"))
      assert(sinks.CorpusWriter.resolveLatest(spark, root.toString)
        === Some(s"$root/v000002"))
      // v000001 is byte-untouched
      assert(dataFiles(root.resolve("v000001")).map(_.toString).toSet
        === v1Files)
      assert(spark.read.parquet(s"$root/v000001").count() === docs.count())
    }
  }

  test("compactAndPublish skips a slot already claimed by a concurrent job") {
    withOut { root =>
      val v0 = root.resolve("v000000")
      docs.repartition(2).write.partitionBy("lang")
        .mode("overwrite").parquet(v0.toString)
      sinks.CorpusWriter.publish(spark, root.toString, "v000000")
      // simulate a concurrent maintenance job that claimed v000001 but has
      // not written (or published) yet: only its .claim marker exists —
      // a plain list-then-allocate would land on the same slot
      val claimed = root.resolve("v000001")
      java.nio.file.Files.createDirectories(claimed)
      java.nio.file.Files.createFile(claimed.resolve(".claim"))
      sinks.CorpusWriter.compactAndPublish(spark, root.toString,
        partitionCols = Seq("lang"), sortCols = Seq("doc_id"))
      // this job probed past the claimed slot and published v000002
      assert(sinks.CorpusWriter.resolveLatest(spark, root.toString)
        === Some(s"$root/v000002"))
      // the concurrent job's claimed slot is untouched
      assert(java.nio.file.Files.list(claimed).iterator().next()
        .getFileName.toString === ".claim")
      assert(spark.read.parquet(s"$root/v000002").count() === docs.count())
      // the winner's own claim marker survives its append-mode write
      assert(java.nio.file.Files.exists(
        root.resolve("v000002").resolve(".claim")))
    }
  }
}
