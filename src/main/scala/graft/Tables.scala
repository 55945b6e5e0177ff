package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampNTZType}

/** Loaders for the synthetic star-schema corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All queries go through here so
  * scans stay declarative: Catalyst prunes columns and pushes predicates
  * into the parquet reader (verify with `.explain` → `PushedFilters` /
  * `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Normalize events.ts to a µs TimestampType regardless of the fixture's
    // physical layout, so every downstream operator (withWatermark,
    // unix_micros, window(...)) sees one logical type:
    //  - parquet TIMESTAMP(NANOS): Spark 4 only reads it with
    //    spark.sql.legacy.parquet.nanosAsLong=true, i.e. as epoch-nanos
    //    longs — truncate to µs like engines with native ns support do.
    //  - parquet timestamp[us] isAdjustedToUTC=false: Spark reads it as
    //    TIMESTAMP_NTZ, which withWatermark rejects. The session timezone
    //    is pinned to UTC, so the cast is value-preserving.
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Normalize `events.ts` to a µs `TimestampType` from any physical layout
    * the fixture generator has produced. Shared by the batch loader and the
    * streaming reader ([[graft.SparkEntry.eventFileStream]]) so both paths
    * see one logical type; the physical-schema tripwire spec runs both over
    * the real fixture so `sbt test` goes red if a new layout appears.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
    // ISO-formatted string ts (a generator emitting strings instead of a
    // parquet timestamp type): session tz is pinned UTC, so the cast is
    // value-preserving and deterministic
    case StringType       => df.withColumn("ts", col("ts").cast("timestamp"))
    // INT96 (legacy parquet) and TIMESTAMP(MICROS/MILLIS) adjusted-to-UTC
    // already surface as TimestampType — passthrough
    case _                => df
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
