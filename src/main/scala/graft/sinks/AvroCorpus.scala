package graft.sinks

import java.nio.ByteBuffer

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interchange — the remaining mainstream corpus
  * exchange format next to JSONL (q82), ORC (q95) and lossless CSV (q96).
  * The Spark distribution in this environment ships Avro CORE (the codec
  * and container format) but not the `spark-avro` DataSource module, so
  * this lane drives the Avro Java API directly from per-partition tasks —
  * the same pure-library pattern as the OOXML workbook writer
  * ([[Workbook]]) and the media codecs ([[graft.operators.Multimodal]]):
  * the Spark-side plumbing (schema mapping, distribution, task-deterministic
  * file naming) is the operator; the codec is the library.
  *
  * Logical-type mapping (the part naive Avro exports corrupt):
  *  - TimestampType ↔ `long` + `timestamp-micros` (µs precision exactly —
  *    Spark's own internal timestamp resolution);
  *  - DateType ↔ `int` + `date` (days since epoch);
  *  - DecimalType(p, s) ↔ `bytes` + `decimal(p, s)` (two's-complement
  *    unscaled big-endian, the Avro spec encoding — exact, no
  *    double-rounding);
  *  - nullable fields ↔ `union { null, T }`.
  *
  * Scale shape: one container file per input partition, written/read by
  * the task that owns it (no driver funnel); file names are deterministic
  * in the partition id, so a retried task overwrites its own output
  * instead of duplicating it. Avro blocks are internally compressed
  * (deflate) and the container is splittable by block at read time —
  * here each file is one read task, the same layout contract as the
  * gzip-JSONL lane.
  */
object AvroCorpus {

  private def avroFieldType(dt: DataType): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case other =>
      throw new IllegalArgumentException(
        s"AvroCorpus: unsupported Spark type $other")
  }

  /** Spark StructType → Avro record schema (nullable → union{null, T}). */
  def avroSchema(schema: StructType, name: String = "GraftRecord"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val base = avroFieldType(f.dataType)
      val t =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      val default =
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null
      fields.add(new Schema.Field(f.name, t, null, default))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  /** µs since epoch from a java.sql.Timestamp (floor division keeps
    * pre-1970 instants exact; getTime carries ms, getNanos the full
    * sub-second). */
  private def toMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
    t
  }

  private def encode(v: Any, dt: DataType): AnyRef = (v, dt) match {
    case (null, _) => null
    case (ts: java.sql.Timestamp, TimestampType) => Long.box(toMicros(ts))
    case (ldt: java.time.LocalDateTime, TimestampNTZType) =>
      Long.box(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L)
    case (d: java.sql.Date, DateType) =>
      Int.box(d.toLocalDate.toEpochDay.toInt)
    case (bd: java.math.BigDecimal, dec: DecimalType) =>
      ByteBuffer.wrap(
        bd.setScale(dec.scale).unscaledValue().toByteArray)
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (x, _) => x.asInstanceOf[AnyRef]
  }

  private def decode(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (us: java.lang.Long, TimestampType) => fromMicros(us)
    case (us: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us.longValue(), 1000000L),
        Math.floorMod(us.longValue(), 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC)
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (bb: ByteBuffer, dec: DecimalType) =>
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
      new java.math.BigDecimal(new java.math.BigInteger(bytes), dec.scale)
    case (bb: ByteBuffer, BinaryType) =>
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
      bytes
    case (s: CharSequence, StringType) => s.toString
    case (x, _) => x
  }

  /** Write `df` as Avro container files under `outDir` (one
    * `part-NNNNN.avro` per partition, deflate-compressed blocks). Empty
    * partitions produce no file. */
  def writeAvro(df: DataFrame, outDir: String): Unit = {
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema).toString // Schema is not serializable
    val dir = new org.apache.hadoop.fs.Path(outDir)
    val driverFs = dir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    driverFs.mkdirs(dir)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // executor-side default Configuration: resolves file:// locally and
        // the cluster defaults (core-site.xml on the classpath) elsewhere
        val conf = new org.apache.hadoop.conf.Configuration()
        // write to an ATTEMPT-scoped temp, rename into place on success:
        // a bare create(dst, overwrite) is only sequential-retry-safe —
        // under speculative execution two live attempts of the same
        // partition would interleave into one stream and corrupt the
        // container. Each attempt owns its temp; rename is atomic, and a
        // losing attempt (rename refused because a sibling committed
        // first) just discards its temp — both attempts hold identical
        // content, so either winner is correct.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val dst = new org.apache.hadoop.fs.Path(outDir, f"part-$pid%05d.avro")
        val tmp = new org.apache.hadoop.fs.Path(
          outDir, f"part-$pid%05d.avro.$attempt%d.tmp")
        val fs = dst.getFileSystem(conf)
        val out = fs.create(tmp, /* overwrite = */ true) // retry of THIS attempt id
        val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        writer.create(schema, out)
        try {
          rows.foreach { row =>
            val rec = new GenericData.Record(schema)
            sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
              rec.put(f.name, encode(row.get(i), f.dataType))
            }
            writer.append(rec)
          }
        } finally writer.close() // closes the stream; flushes the container
        if (!fs.rename(tmp, dst)) {
          fs.delete(tmp, /* recursive = */ false)
          if (!fs.exists(dst)) throw new java.io.IOException(
            s"writeAvro: could not commit $tmp to $dst")
        }
      }
    }
  }

  /** Schema-pinned Avro read-back: one task per container file (the
    * caller's schema decides field order and types — inference would be a
    * second pass and a silent-widening hazard, same rule as
    * [[CorpusWriter.readJsonl]]). */
  def readAvro(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(new org.apache.hadoop.fs.Path(p, "part-*.avro"))
      .map(_.getPath.toString).sorted
    if (files.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    val fields = schema.fields
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap { file =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = new FsInput(new org.apache.hadoop.fs.Path(file), conf)
        val reader = new DataFileReader[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        // the exhausted-iterator close below never fires for an
        // early-terminated consumer (limit/failed task) — the task
        // completion listener covers those; close() is idempotent
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => reader.close()))
        val it = new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(fields.toIndexedSeq.map(f =>
              decode(rec.get(f.name), f.dataType)))
          }
        }
        it
      }
    spark.createDataFrame(rows, schema)
  }
}
