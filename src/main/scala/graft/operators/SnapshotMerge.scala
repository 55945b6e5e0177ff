package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental snapshot merge (CDC-style set-diff), the Spark-first
  * re-expression of the reference's hash-set diff sync
  * (`/root/reference/data_loading_to_mysql_database.py:185-277`, SURVEY §2.9
  * I1–I3, §2.4 J1–J3).
  *
  * The reference computes three Python-set differences (insert/delete/update
  * id sets) and rebuilds the target frame. Distributed, the same semantics
  * are ONE full-outer shuffle join on the key — Catalyst/AQE picks broadcast
  * vs shuffled-hash vs sort-merge by size, and at 100 TB the join shuffles
  * each side exactly once on the key (no driver-side id sets, no collect).
  */
object SnapshotMerge {

  /** Rows of `source ⟗ target` classified into insert / update / delete /
    * unchanged lanes. Null-key rows are excluded (the reference splits them
    * out first — P6; [[merge]] passes the *source's* null-key rows through).
    *
    * Output: key, action, and every non-key column taken wholesale from the
    * source row when one exists, else from the target (true
    * update-by-replace: a source NULL overwrites a target value, matching
    * the reference's `df_updated = df_source_with_id[...]`).
    */
  def mergeActions(
      source: DataFrame,
      target: DataFrame,
      key: String,
      compareCols: Seq[String]): DataFrame = {
    val s = source.filter(col(key).isNotNull).as("s")
    val t = target.filter(col(key).isNotNull).as("t")
    val changed: Column = compareCols
      .map(c => !(col(s"s.$c") <=> col(s"t.$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    val action = when(col(s"t.$key").isNull, "insert")
      .when(col(s"s.$key").isNull, "delete")
      .when(changed, "update")
      .otherwise("unchanged")
    val srcPresent = col(s"s.$key").isNotNull
    val dataCols = source.columns.filterNot(_ == key).toSeq.map { c =>
      (if (target.columns.contains(c))
        when(srcPresent, col(s"s.$c")).otherwise(col(s"t.$c"))
       else col(s"s.$c")).as(c)
    }
    s.join(t, col(s"s.$key") === col(s"t.$key"), "full_outer")
      .select(
        coalesce(col(s"s.$key"), col(s"t.$key")).as(key) +:
          action.as("action") +: dataCols: _*)
  }

  /** Applied merge result — the new target snapshot.
    *
    * Parity with the reference: inserts + updates + unchanged come from the
    * source row; deletes are dropped (hard delete) or kept with
    * `is_active=false` (soft delete, `notion_data_ingestion.py:206-244`);
    * the SOURCE's null-key rows pass through untouched while the target's
    * are discarded (`data_loading_to_mysql_database.py:265` concatenates
    * `df_source_na_id` and never re-adds `df_target_na_id`).
    */
  def merge(
      source: DataFrame,
      target: DataFrame,
      key: String,
      softDelete: Boolean = false): DataFrame = {
    val actions = mergeActions(source, target, key,
      source.columns.filterNot(_ == key).toSeq.filter(target.columns.contains))
    val live = actions.filter(col("action") =!= "delete").drop("action")
      .withColumn("is_active", lit(true))
    val deleted =
      if (softDelete)
        actions.filter(col("action") === "delete").drop("action")
          .withColumn("is_active", lit(false))
      else actions.limit(0).drop("action").withColumn("is_active", lit(true))
    val naRows = source.filter(col(key).isNull)
      .select(actions.columns.filter(_ != "action").toSeq.map(col): _*)
      .withColumn("is_active", lit(true))
    live.unionByName(deleted).unionByName(naRows)
  }

  /** Changelog COMPACTION — last-writer-wins per key with tombstones: the
    * CDC-apply / compacted-topic read. Each key's surviving row is its
    * latest version by (ts, tie) — `tie` totalizes equal timestamps, so
    * the winner never depends on partition order — and keys whose latest
    * version satisfies `deletePred` vanish (a delete beaten by a later
    * upsert does NOT delete).
    *
    * Deliberately NOT a row_number window: `max(struct(ts, tie, payload))`
    * is a map-side-combinable aggregate, so each executor reduces its
    * slice of a key's history to one candidate before the shuffle — at
    * 100 TB changelog volume that is the difference between shuffling
    * every version and shuffling one row per (key, input partition). The
    * same argmax-by-struct idiom as the q110 cluster representative.
    *
    * Output: (key, n_versions, last_ts, current_value) for surviving
    * keys; `n_versions` counts ALL versions including the tombstones the
    * compaction removed.
    */
  def compactChangelog(
      log: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      deletePred: Column,
      valueCol: String): DataFrame = {
    log.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_versions"),
        max(struct(col(tsCol).as("t"), col(tieCol).as("i"),
          deletePred.as("del"), col(valueCol).as("v"))).as("last"))
      .filter(!col("last.del"))
      .select(col(keyCol), col("n_versions"),
        col("last.t").as("last_ts"), col("last.v").as("current_value"))
  }
}
