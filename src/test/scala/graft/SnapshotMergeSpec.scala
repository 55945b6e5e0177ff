package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapshotMerge

/** I1–I3 snapshot merge algebra (insert/update/delete/unchanged lanes,
  * soft delete, null-key passthrough, idempotence). */
class SnapshotMergeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def src = Seq(
    (Some(1L), "a", 10.0), // unchanged
    (Some(2L), "b", 99.0), // update (target has 20.0)
    (Some(4L), "d", 40.0), // insert
    (None, "src-na", -1.0) // null-key passthrough (reference keeps SOURCE NA)
  ).toDF("id", "name", "bal")

  private def tgt = Seq(
    (Some(1L), "a", 10.0),
    (Some(2L), "b", 20.0),
    (Some(3L), "c", 30.0), // delete
    (None, "tgt-na", -2.0) // discarded (reference drops target NA rows)
  ).toDF("id", "name", "bal")

  test("action lanes classify correctly") {
    val actions = SnapshotMerge.mergeActions(src, tgt, "id", Seq("bal"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("action")).toMap
    assert(actions === Map(1L -> "unchanged", 2L -> "update",
      3L -> "delete", 4L -> "insert"))
  }

  test("hard merge = source rows + SOURCE null-key passthrough") {
    val merged = SnapshotMerge.merge(src, tgt, "id")
    assert(merged.count() === 4) // 3 keyed source rows + 1 source NA row
    val bals = merged.filter($"id".isNotNull)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("bal")).toMap
    assert(bals === Map(1L -> 10.0, 2L -> 99.0, 4L -> 40.0))
    val na = merged.filter($"id".isNull).collect()
    assert(na.map(_.getAs[String]("name")).toSeq === Seq("src-na"))
  }

  test("update-by-replace: a source NULL overwrites the target value") {
    val s = Seq((Some(1L), Option.empty[String], 5.0)).toDF("id", "name", "bal")
    val t = Seq((Some(1L), Some("old-name"), 5.0)).toDF("id", "name", "bal")
    val merged = SnapshotMerge.merge(s, t, "id")
    assert(merged.head().getAs[String]("name") === null) // not "old-name"
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

  test("compactChangelog: last-writer-wins with tombstone semantics") {
    def t(i: Int) = new java.sql.Timestamp(i * 1000L)
    val log = Seq(
      // k1: upsert, upsert — survives with the later value
      (1L, t(1), 1L, "U", 10.0), (1L, t(2), 2L, "U", 20.0),
      // k2: upsert then tombstone LAST — key vanishes
      (2L, t(1), 3L, "U", 5.0), (2L, t(2), 4L, "D", 0.0),
      // k3: tombstone beaten by a later upsert — resurrected
      (3L, t(1), 5L, "D", 0.0), (3L, t(2), 6L, "U", 7.0),
      // k4: equal timestamps — the tie column decides (id 8 wins)
      (4L, t(5), 7L, "U", 1.0), (4L, t(5), 8L, "U", 2.0)
    ).toDF("k", "ts", "id", "op", "v")
    val out = SnapshotMerge.compactChangelog(log, "k", "ts", "id",
      col("op") === "D", "v").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L) === ((2L, 20.0)))
    assert(!out.contains(2L), "trailing tombstone removes the key")
    assert(out(3L) === ((2L, 7.0)), "later upsert resurrects")
    assert(out(4L) === ((2L, 2.0)), "equal ts resolved by the tie column")
    // n_versions counts tombstones too
    assert(out.values.map(_._1).sum === 6L)
  }
}
