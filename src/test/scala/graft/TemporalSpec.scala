package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** Temporal reshapes: the gap-fill grid must be dense and LOCF-total; the
  * SCD2 intervals must tile each key's timeline exactly (no gap, no
  * overlap, one open segment). */
class TemporalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFill: dense hourly grid, LOCF values, gaps explicit") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:15:00"), 2.0),
      (1L, ts("2024-01-01 10:45:00"), 4.0),
      // 11:00 and 12:00 missing for key 1
      (1L, ts("2024-01-01 13:05:00"), 10.0),
      (2L, ts("2024-01-01 00:30:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = Temporal.gapFill(ev, "user_id", "ts", "value", "hour")
      .orderBy("user_id", "bucket").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getTimestamp(1).toString.substring(11, 13)).toSeq ===
      Seq("10", "11", "12", "13"), "grid must cover every hour in the span")
    // observed: 10:00 sums both events; 13:00 has one
    assert(k1.map(r => (r.getLong(2), r.getBoolean(3), r.getDouble(4))).toSeq ===
      Seq((2L, false, 6.0), (0L, true, 6.0), (0L, true, 6.0),
        (1L, false, 10.0)), "LOCF must carry the last observed value")
    // single-bucket key: one row, observed, no fill needed
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length === 1 && !k2.head.getBoolean(3) &&
      k2.head.getDouble(4) === 1.0)
  }

  test("gapFill: first bucket per key is always observed (fill is total)") {
    val ev = Seq((7L, ts("2024-03-01 05:59:59"), 3.5),
      (7L, ts("2024-03-01 09:00:00"), 1.5)).toDF("user_id", "ts", "value")
    val out = Temporal.gapFill(ev, "user_id", "ts", "value", "hour").collect()
    assert(out.forall(!_.isNullAt(4)), "value_filled must never be null")
    assert(out.count(_.getBoolean(3)) === 3, "span 05..09 with 06,07,08 gaps")
  }

  test("gapFill: rejects unknown bucket units") {
    val ev = Seq((1L, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    intercept[IllegalArgumentException] {
      Temporal.gapFill(ev, "user_id", "ts", "value", "fortnight")
    }
  }

  test("scd2: consecutive duplicates collapse; intervals tile the timeline") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "free"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "free"),
      (1L, ts("2024-01-03 00:00:00"), 3L, "pro"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "pro"),
      (1L, ts("2024-01-05 00:00:00"), 5L, "free"),
      (2L, ts("2024-02-01 00:00:00"), 6L, "pro")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Temporal.scd2(ev, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "valid_from").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq === Seq("free", "pro", "free"),
      "same attr value re-opens a NEW segment after a change")
    assert(k1.map(_.getLong(4)).toSeq === Seq(2L, 2L, 1L), "n_events per segment")
    // valid_to chains: each segment ends where the next begins
    assert(k1.init.map(_.getTimestamp(3)).toSeq ===
      k1.tail.map(_.getTimestamp(2)).toSeq, "intervals must tile, no gaps")
    assert(out.count(_.getBoolean(5)) === 2, "exactly one open segment per key")
    assert(k1.last.isNullAt(3) && k1.last.getBoolean(5))
  }

  test("scd2: equal timestamps break ties by tieCol, not partition order") {
    val t = ts("2024-01-01 12:00:00")
    val ev = Seq((1L, t, 2L, "b"), (1L, t, 1L, "a"), (1L, t, 3L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Temporal.scd2(ev.repartition(3), "user_id", "ts", "event_id",
      "event_type").orderBy("valid_from", "attr_value").collect()
    // event order by id: a, b, a → three segments... but equal valid_from
    // for all; the segmentation itself must still be the id-ordered one
    assert(out.map(_.getString(1)).sorted.toSeq === Seq("a", "a", "b"),
      "id-order a|b|a gives three segments (a,b,a), deterministically")
    assert(out.map(_.getLong(4)).sum === 3L)
  }

  test("timeWeightedAvg: zero-order hold weights, degenerate-span fallback") {
    val ev = Seq(
      // u1: v=10 holds 10s, v=20 holds 30s, v=40 closes the integral
      (1L, new Timestamp(0L), 1L, 10.0),
      (1L, new Timestamp(10000L), 2L, 20.0),
      (1L, new Timestamp(40000L), 3L, 40.0),
      // u2: single event — span 0, twa = the value
      (2L, new Timestamp(5000L), 4L, 5.0),
      // u3: two events at the SAME instant — wtot 0, fallback max
      (3L, new Timestamp(7000L), 5L, 3.0),
      (3L, new Timestamp(7000L), 6L, 9.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Temporal.timeWeightedAvg(ev, "user_id", "ts", "event_id",
      "value").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    // twa = (10·10 + 20·30) / 40 = 17.5 — NOT the plain avg 23.33
    assert(out(1L) === ((3L, 40.0, 17.5)))
    assert(out(2L) === ((1L, 0.0, 5.0)))
    assert(out(3L) === ((2L, 0.0, 9.0)))
  }

  test("scd2 lane shape at fixture scale: intervals reconstruct the event count") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val out = Temporal.scd2(ev, "user_id", "ts", "event_id", "event_type")
    val total = out.agg(sum("n_events")).head().getLong(0)
    assert(total === ev.count(), "every event lands in exactly one segment")
    val open = out.filter(col("is_current")).groupBy("user_id").count()
      .filter(col("count") =!= 1).count()
    assert(open === 0L, "exactly one current segment per user")
  }
}
