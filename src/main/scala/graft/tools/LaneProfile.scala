package graft.tools

import org.apache.spark.sql.SparkSession

/** r18 measurement harness (optimization guide §1): run any declared
  * lane under a SparkListener and decompose its wall clock into
  * scheduled work (jobs, stages, summed executor task time) vs driver
  * residue (wall − task-parallel time). A lane whose wall is far above
  * summedTaskMs / cores is paying scheduling floor, driver compute, or
  * barrier latency — the shapes §2.6/§5 target — while a lane whose
  * task time dominates needs per-task work (§2.3/§4).
  *
  * Usage: SPARK_GRAFT_LANES=q63_dedup_clusters,... SPARK_GRAFT_SF_DIR=...
  *        sbt "runMain graft.tools.LaneProfile"
  * Evidence tool for OPTIMIZATION_r18.md, not a gate.
  */
object LaneProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val lanes = sys.env.getOrElse("SPARK_GRAFT_LANES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks)
          taskTimeMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        }
      })
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    def quiesce(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      graft.operators.Checkpoints.releaseTracked()
      org.apache.spark.sql.GraftStateStoreBridge.unloadAllStateStores()
      spark.streams.resetTerminated()
      System.gc()
    }
    lanes.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm pass, unmeasured
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      quiesce()
      for (rep <- 1 to 2) {
        jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
        val t0 = System.nanoTime()
        // phase 1: lane construction — includes any eager work the lane
        // does while building its DataFrame (bounded sample collects,
        // driver-side quantizer training, eager checkpoints)
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        // phase 2: analysis + optimization + physical planning (driver)
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        // phase 3: execution (incl. AQE re-planning between stages)
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val wall = (t3 - t0) / 1e9
        Thread.sleep(300) // listener drain
        val taskSec = taskTimeMs.get / 1e3
        println(f"PROFILE $name rep=$rep wall=$wall%.2f s " +
          f"construct=${(t1 - t0) / 1e9}%.2f plan=${(t2 - t1) / 1e9}%.2f " +
          f"exec=${(t3 - t2) / 1e9}%.2f jobs=${jobs.get} " +
          f"stages=${stages.get} tasks=${tasks.get} " +
          f"summedTaskSec=$taskSec%.1f idealParSec=${taskSec / cpus.toInt}%.2f")
        quiesce()
      }
    }
    spark.stop()
  }
}
