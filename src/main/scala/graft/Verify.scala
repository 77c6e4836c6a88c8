package graft
import org.apache.spark.sql.SparkSession
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args = substring filters for local iteration
    // (`runMain graft.Verify <sf> <out> q79`); the driver passes none.
    val filters = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    locally { val (fs, od) = graft.sources.Bundle.fsPath(outDir)
      fs.mkdirs(od) }
    val selected =
      if (filters.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => filters.exists(n.contains) }
    // sorted: a Map's iteration order reshuffles whenever a query is
    // added, which turns any cross-query session interaction into a
    // round-over-round heisenbug; fixed order keeps runs comparable
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries that persist() would otherwise leak storage into every
      // later query in the session (same fix as Bench); the GC lets the
      // ContextCleaner release localCheckpoint blocks too
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    locally { val (fs, od) = graft.sources.Bundle.fsPath(outDir)
      graft.sources.Bundle.writeStringCommitted(fs, od, "oracle_sql.json", json) }
    spark.stop()
  }
}
