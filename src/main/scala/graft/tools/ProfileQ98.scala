package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profile harness for the q98 scheduling-floor adjudication: runs
  * bpeTrain once and reports wall time, job count, and stage count from
  * the status store — evidence for OPERATORS.md bench provenance, not a
  * gate. */
object ProfileQ98 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          taskTimeMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        }
      })
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count() // warm scan
    for (aqe <- Seq("true", "false"); rep <- 1 to 2) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      jobs.set(0); stages.set(0); taskTimeMs.set(0)
      val t0 = System.nanoTime()
      graft.operators.TextAnalysis.bpeTrain(docs, "text", 20)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      println(f"PROFILE q98 aqe=$aqe rep=$rep wall=$wall%.2f s " +
        f"jobs=${jobs.get} stages=${stages.get} summedTaskMs=${taskTimeMs.get}")
    }
    spark.stop()
  }
}
