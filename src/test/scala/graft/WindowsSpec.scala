package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Windows

class WindowsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Multi-partition fixture with duplicate order keys so the tiebreaker
  // matters and range boundaries fall inside key runs: (key, tie, payload).
  private def fixture = {
    val rows = (0 until 500).map { i =>
      ((i * 37) % 50, (i * 13) % 100, s"p$i")
    }
    rows.toDF("key", "tie", "payload").repartition(7)
  }

  private def reference(df: org.apache.spark.sql.DataFrame,
      orderCols: Seq[org.apache.spark.sql.Column]) =
    df.withColumn("rank", row_number().over(Window.orderBy(orderCols: _*))
      .cast("long"))

  test("globalRowNumber matches single-partition row_number (asc + tiebreakers)") {
    val order = Seq(col("key").asc, col("tie").asc, col("payload").asc)
    val got = Windows.globalRowNumber(fixture, order, "rank")
    assert(got.schema("rank").dataType == LongType)
    val exp = reference(fixture, order)
    assert(got.select("key", "tie", "payload", "rank").collect().toSet ===
      exp.select("key", "tie", "payload", "rank").collect().toSet)
  }

  test("globalRowNumber matches single-partition row_number (desc mix)") {
    val order = Seq(col("key").desc, col("tie").asc, col("payload").desc)
    val got = Windows.globalRowNumber(fixture, order, "rank")
    val exp = reference(fixture, order)
    assert(got.select("key", "tie", "payload", "rank").collect().toSet ===
      exp.select("key", "tie", "payload", "rank").collect().toSet)
  }

  test("globalRowNumber is dense, 1-based, and preserves caller columns") {
    val got = Windows.globalRowNumber(
      fixture, Seq(col("key").asc, col("tie").asc, col("payload").asc), "rn")
    assert(got.columns.toSeq === Seq("key", "tie", "payload", "rn"))
    val ranks = got.select("rn").as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 500L))
  }

  test("globalRowNumber rejects a rank column that already exists") {
    val e = intercept[IllegalArgumentException] {
      Windows.globalRowNumber(fixture, Seq(col("key").asc), "payload")
    }
    assert(e.getMessage.contains("payload"))
  }

  test("globalRowNumber on empty input returns empty with the rank column") {
    val got = Windows.globalRowNumber(
      fixture.filter(lit(false)), Seq(col("key").asc), "rank")
    assert(got.count() === 0L)
    assert(got.columns.contains("rank"))
  }
}
