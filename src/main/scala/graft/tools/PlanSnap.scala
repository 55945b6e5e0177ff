package graft.tools

import org.apache.spark.sql.SparkSession

/** r18 evidence tool: write `.explain("formatted")` of named lanes to
  * one file per lane (plans/r18/<lane>_<tag>.txt) — the before/after
  * plan record OPTIMIZATION_r18.md's claims point at. Same session
  * shape as the Bench (sf from env, cpus from env).
  *
  * Usage: SPARK_GRAFT_LANES=q26_jaccard_pairs,... SPARK_GRAFT_PLAN_TAG=before
  *        SPARK_GRAFT_PLAN_DIR=plans/r18 sbt "runMain graft.tools.PlanSnap"
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r18")
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    lanes.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val nEx = "Exchange".r.findAllIn(plan).length
      val header = s"== $name ($tag, $sfDir, local[$cpus]) ==\n" +
        s"== Exchange occurrences: $nEx ==\n\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        (header + plan).getBytes("UTF-8"))
      println(s"[plansnap] wrote $outDir/${name}_$tag.txt (Exchange x$nEx)")
      graft.operators.Checkpoints.releaseTracked()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
