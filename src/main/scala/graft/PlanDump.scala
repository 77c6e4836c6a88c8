package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round helper: write `.explain("formatted")` output for the
  * selected queries (substring filters, like Bench/Verify) to a directory —
  * the plan evidence the round records under `plans/<round>/`.
  *
  * Usage: `runMain graft.PlanDump <outDir> [suffix] [q63 q200 ...]`
  * writes `<outDir>/<query>_<suffix>.txt` (suffix defaults to "before").
  * Queries that RUN work inside their builder (state-store lifecycles)
  * still produce the plan of the RETURNED frame — that is the timed shape.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [suffix] [filters...]")
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else "before"
    val filters = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val selected =
      if (filters.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => filters.exists(n.contains) }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
