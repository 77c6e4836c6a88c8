package graft

/** Dev-only plan audit (not a test): prints the formatted physical plan
  * of selected registry queries at sf0.001 for hand inspection.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.001"
    args.foreach { q =>
      val name = graft.queries.Registry.queries.keys
        .find(_.startsWith(q)).getOrElse(sys.error(s"no query $q"))
      println(s"===== $name =====")
      val df = graft.queries.Registry.queries(name)(spark, dir)
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
  }
}
