package graft.scratch
import org.apache.spark.sql.SparkSession
object Q53Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q53_a1_azimuth_range")(spark, "/root/testdata/sf0.1")
    val plan = df.queryExecution.executedPlan.toString
    println("DBG plan head:\n" + plan.split("\n").take(25).mkString("\n"))
    val cg = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    println("DBG codegen sizes: " + cg.split("\n").filter(l => l.contains("WholeStageCodegen") || l.contains("Found")).take(10).mkString(" | "))
    spark.stop()
  }
}
