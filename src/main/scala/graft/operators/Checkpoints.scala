package graft.operators

import java.lang.ref.WeakReference

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle management for operator-internal `localCheckpoint` blocks.
  *
  * Operators here checkpoint shared subtrees (pair generators reuse the
  * quantizer assignment on both self-join sides; iterative graph loops
  * re-seed each round) and historically never unpersisted them — the
  * blocks accumulate in the block manager for the life of the session
  * (round-4 measured 2.5–4.7× timing inflation on late lanes, which is
  * why `graft.Bench` quiesces between queries). A long-lived production
  * session composing many operator calls has no quiesce; this object is
  * the scoped lifecycle that closes the leak (r16 verdict, defect 5):
  *
  *  - [[release]] — free ONE checkpoint's blocks once nothing can read
  *    through it. `localCheckpoint` TRUNCATES lineage, so its blocks are
  *    the only copy: releasing a checkpoint that a still-lazy result
  *    depends on makes that result unrecomputable. Iterative operators
  *    ([[Components.alternatingStars]], [[Components.hostPagerank]]) call
  *    this on generation n−1 once generation n is eagerly materialized —
  *    the rolling form of acquire → use → unpersist, which turns
  *    O(rounds) leaked generations into O(1).
  *  - [[track]]/[[releaseTracked]] — the session-hygiene form for
  *    checkpoints that must OUTLIVE their operator call (a pair
  *    generator's assignment relation feeds the lazily-returned pair
  *    DataFrame, so the operator itself can never free it without
  *    forcing materialization and rewriting every pinned plan). Pair
  *    generators register their internal checkpoints; a long-lived
  *    session calls `releaseTracked()` between logical queries — after
  *    materializing the previous query's results, the same contract as
  *    Bench's quiesce — and frees exactly the operator-internal blocks
  *    without touching user-managed caches.
  *  - [[releaseAll]] — the blanket sweep (every persistent RDD), what
  *    Bench's quiesce does; for sessions that own their SparkContext.
  *
  * All releases are `blocking = false`: removal is asynchronous and the
  * caller never waits on the block manager.
  */
object Checkpoints {

  /** The persisted RDDs behind a `localCheckpoint`ed DataFrame — the
    * `LogicalRDD` leaves of its analyzed plan. For a DataFrame that IS a
    * checkpoint result this is exactly one RDD; for derived plans it
    * finds every checkpoint leaf (used by tests; operators pass the
    * checkpoint result itself). */
  private def checkpointRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }

  /** Free the checkpoint blocks behind `df` (a DataFrame returned by
    * `localCheckpoint`). SAFETY: only call once every consumer of the
    * checkpoint has been eagerly materialized — lineage is truncated, so
    * the blocks are the only copy of the data. */
  def release(df: DataFrame): Unit =
    checkpointRdds(df).foreach(_.unpersist(blocking = false))

  /** Operator-internal checkpoints registered for deferred release —
    * weak refs so an unpersisted-by-GC RDD never pins heap here. */
  private val tracked =
    new java.util.concurrent.ConcurrentHashMap[Integer, WeakReference[RDD[_]]]()

  /** Register `df`'s checkpoint blocks for [[releaseTracked]] and return
    * it unchanged — the acquire half of the session-hygiene lifecycle;
    * plan-neutral (the DataFrame itself is untouched). */
  private[graft] def track(df: DataFrame): DataFrame = {
    checkpointRdds(df).foreach(r => tracked.put(r.id, new WeakReference(r)))
    df
  }

  /** Chainable acquire: `df.transform(Checkpoints.trackedEager)` ≡
    * eager localCheckpoint + [[track]] — the one-line adoption form for
    * operator-internal shared subtrees. */
  private[graft] def trackedEager(df: DataFrame): DataFrame =
    track(df.localCheckpoint(eager = true))

  /** How many tracked checkpoints are currently registered (diagnostic —
    * the 50-query growth measurement reads this next to the block
    * manager's own RDD count). */
  def trackedCount: Int = tracked.size()

  /** Free every operator-internal checkpoint registered since the last
    * call. Call between logical queries in a long-lived session, AFTER
    * materializing the previous query's results (the Bench-quiesce
    * contract): the released blocks are unrecoverable by design.
    *
    * ONE-ACTION-WINDOW CONTRACT (also documented on every operator
    * object whose entries return tracked frames — Dedup, Similarity,
    * TextAnalysis, Sampling, Windows, Components): a frame returned by
    * a tracked operator cannot be re-executed after this call, even if
    * it was already materialized once — `localCheckpoint` TRUNCATES
    * lineage, so a second action (count-then-collect, a common
    * interactive pattern) fails with block-not-found. If you need
    * repeated actions on a result across release boundaries, persist it
    * yourself (`.localCheckpoint()` / write it out) before releasing. */
  def releaseTracked(): Unit = {
    val it = tracked.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val r = e.getValue.get()
      if (r != null) r.unpersist(blocking = false)
      it.remove()
    }
  }

  /** The blanket sweep: every persistent RDD in the session's context
    * (operator checkpoints, user caches, everything) plus the tracked
    * registry. What `graft.Bench`'s quiesce does between lanes. */
  def releaseAll(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    releaseTracked()
  }
}
