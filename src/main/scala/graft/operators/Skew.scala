package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Skew and shuffle-placement controls for 100 TB operation.
  *
  * - [[saltedAggregate]]: two-phase aggregation for hot grouping keys — a
  *   random salt splits each key across `numSalts` reducers for the heavy
  *   partial phase, then a cheap final phase over `keys × numSalts` rows
  *   recombines. Results are identical to a direct groupBy (counts/sums are
  *   associative); only the shuffle placement changes.
  * - [[Bucketing]]: persist both sides of a recurring join bucketed on the
  *   join key so the join is co-located — zero Exchange at query time, the
  *   standard warehouse layout for repeated large-scale joins.
  */
object Skew {

  /** Two-phase count/sum aggregation with key salting. `sums` maps output
    * column name → column to sum. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      sums: Map[String, Column],
      numSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      (rand(42) * numSalts).cast("int"))
    val partialAggs = sums.toSeq.map { case (name, c) =>
      sum(c).as(s"__p_$name")
    } :+ count(lit(1)).as("__p_cnt")
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sums.keys.toSeq.map { name =>
      sum(col(s"__p_$name")).as(name)
    } :+ sum(col("__p_cnt")).as("n_rows")
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  object Bucketing {

    /** Persist `df` bucketed (and sorted) on `key` into the session
      * warehouse. Subsequent equi-joins between tables bucketed with the
      * same count on the same key need no shuffle.
      */
    def writeBucketed(df: DataFrame, table: String, key: String,
        numBuckets: Int): Unit = {
      val spark = df.sparkSession
      // parse (and thereby validate) the identifier; the catalog maps it to
      // the real managed location (lowercasing, db.tbl → <db>.db/<tbl>) so
      // the orphan cleanup below can never touch an unrelated directory
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
      spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
      // a previously interrupted write can leave an orphaned managed
      // location behind; clear it or CREATE TABLE refuses. Hadoop's
      // FileSystem resolves the warehouse URI whatever its scheme
      // (file:, hdfs:, s3a:, ...) — java.io.File would throw on any
      // non-local warehouse.
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      df.write.mode(SaveMode.Overwrite)
        .bucketBy(numBuckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    }

    def table(spark: SparkSession, name: String): DataFrame =
      spark.table(name)
  }
}
