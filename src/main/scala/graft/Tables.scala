package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 only reads with
    // spark.sql.legacy.parquet.nanosAsLong=true (as epoch-nanos longs).
    // Normalize to a µs TimestampType so downstream operators see a real
    // timestamp, exactly as engines with native ns support truncate it.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
