package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Physical-schema tripwire for the REAL events fixture.
  *
  * Round 10 lesson: the driver regenerated `/root/testdata` with
  * `events.ts` as parquet `timestamp[us] isAdjustedToUTC=false`
  * (read as TIMESTAMP_NTZ) where it had been TIMESTAMP(NANOS)
  * (read as nanos-longs), and nine event-time lanes broke while all
  * 250 unit tests stayed green — no spec read the real fixture, so
  * the suite could not see the failure class. This spec closes it:
  * it drives the exact operations that broke (`withWatermark`, which
  * rejects NTZ, and `unix_micros`, which rejects anything but µs
  * TimestampType) over `Tables.load` of the real sf0.001 fixture,
  * plus the two gated lanes that died first. If the fixture's
  * physical layout drifts again, `sbt test` goes red here before the
  * correctness gate does.
  */
class EventFixtureSpec extends AnyFunSuite with SparkSpec {
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("Tables.load normalizes events.ts to TimestampType for any physical layout") {
    val events = Tables.load(spark, sfDir, "events")
    assert(events.schema("ts").dataType == TimestampType,
      s"events.ts must load as TimestampType, got ${events.schema("ts").dataType}; " +
        "add a branch to Tables.normalizeEventTs for the new physical layout")
    // unix_micros is the strictest consumer: DATATYPE_MISMATCH on NTZ or long.
    val bounds = events.agg(
      min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi")).head()
    assert(bounds.getLong(0) < bounds.getLong(1))
  }

  test("withWatermark accepts the loaded events stream (rejects NTZ drift)") {
    // Same shape as SparkEntry.eventFileStream: schema pinned from the batch
    // read, then normalized. withWatermark throws at ANALYSIS time on a
    // TIMESTAMP_NTZ event-time column, so .explain() alone trips the wire.
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val counts = Tables.normalizeEventTs(raw)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .count()
    assert(counts.isStreaming)
    counts.queryExecution.assertAnalyzed()
  }

  test("normalizeEventTs drift matrix: all four physical layouts converge") {
    import spark.implicits._
    // The generator has already shipped two layouts (nanos-as-long through
    // r9, NTZ-micros from r10). Enumerate the plausible next ones too —
    // int96 (legacy parquet) and ISO strings — and require every layout to
    // normalize to the SAME µs TimestampType instants.
    val micros = Seq(1735689600000000L, 1735689600123456L, 1735693200000000L)
    def check(df: org.apache.spark.sql.DataFrame, layout: String): Unit = {
      val n = Tables.normalizeEventTs(df)
      assert(n.schema("ts").dataType == TimestampType, s"$layout type")
      val got = n.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
      assert(got.toSeq === micros, s"$layout values")
    }
    // 1. nanos-as-long (what nanosAsLong=true surfaces for TIMESTAMP(NANOS))
    check(micros.map(_ * 1000L).toDF("ts"), "nanos-long")
    // 2. TIMESTAMP_NTZ (timestamp[us] isAdjustedToUTC=false)
    check(micros.toDF("m")
      .select(timestamp_micros(col("m")).cast("timestamp_ntz").as("ts")),
      "ntz-micros")
    // 3. int96: write with the legacy physical type, read back
    val p96 = java.nio.file.Files.createTempDirectory("graft_int96").toString
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      micros.toDF("m").select(timestamp_micros(col("m")).as("ts"))
        .write.mode("overwrite").parquet(p96)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    check(spark.read.parquet(p96), "int96")
    // 4. ISO strings (a generator emitting text timestamps)
    check(micros.toDF("m")
      .select(date_format(timestamp_micros(col("m")),
        "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts")), "iso-string")
  }

  test("gated event-time lanes run end-to-end on the real fixture") {
    // q35 (watermarked streaming tumbling) and q62 (unix_micros funnel) were
    // the first two lanes to die in round 10 — drive them exactly as the
    // driver's Verify does and require non-empty output.
    for (lane <- Seq("q35_streaming_tumbling", "q62_funnel")) {
      val out = SparkEntry.queries(lane)(spark, sfDir)
      assert(out.count() > 0, s"$lane returned no rows on $sfDir")
    }
  }
}
