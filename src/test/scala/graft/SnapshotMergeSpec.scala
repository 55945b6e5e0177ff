package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapshotMerge

/** I1–I3 snapshot merge algebra (insert/update/delete/unchanged lanes,
  * soft delete, null-key passthrough, idempotence). */
class SnapshotMergeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def src = Seq(
    (Some(1L), "a", 10.0), // unchanged
    (Some(2L), "b", 99.0), // update (target has 20.0)
    (Some(4L), "d", 40.0) // insert
  ).toDF("id", "name", "bal")

  private def tgt = Seq(
    (Some(1L), "a", 10.0),
    (Some(2L), "b", 20.0),
    (Some(3L), "c", 30.0), // delete
    (None, "na-row", -1.0) // null-key passthrough
  ).toDF("id", "name", "bal")

  test("action lanes classify correctly") {
    val actions = SnapshotMerge.mergeActions(src, tgt, "id", Seq("bal"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("action")).toMap
    assert(actions === Map(1L -> "unchanged", 2L -> "update",
      3L -> "delete", 4L -> "insert"))
  }

  test("hard merge = source rows + null-key passthrough") {
    val merged = SnapshotMerge.merge(src, tgt, "id")
    assert(merged.count() === 4) // 3 source + 1 NA row
    val bals = merged.filter($"id".isNotNull)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("bal")).toMap
    assert(bals === Map(1L -> 10.0, 2L -> 99.0, 4L -> 40.0))
    assert(merged.filter($"id".isNull).count() === 1)
  }

  test("soft delete keeps tombstones with is_active=false") {
    val merged = SnapshotMerge.merge(src, tgt, "id", softDelete = true)
    assert(merged.count() === 5)
    val dead = merged.filter(!$"is_active").collect()
    assert(dead.map(_.getAs[Long]("id")).toSeq === Seq(3L))
  }

  test("merge is idempotent: re-merging the result is all unchanged") {
    val once = SnapshotMerge.merge(src, tgt, "id").drop("is_active")
    val again = SnapshotMerge.mergeActions(src, once, "id", Seq("bal"))
    assert(again.filter($"action" =!= "unchanged").count() === 0)
  }
}
