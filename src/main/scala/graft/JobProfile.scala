package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev-only per-query job profiler (guide §1/§7): runs selected queries
  * exactly like Bench (noop sink, same session settings) with a listener
  * that attributes the query's wall time to its Spark jobs vs the gaps
  * between them (driver-side planning/analysis/scheduling). The output is
  * the evidence for per-job-overhead claims: how many jobs a query
  * launches, how long each runs, how much wall is spent with NO job
  * running.
  *
  * Usage: `runMain graft.JobProfile q63 q200` (substring filters, like
  * Bench). Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    final case class J(id: Int, desc: String, submitted: Long,
                       var completed: Long = -1L,
                       var nTasks: Int = 0, var taskTime: Long = 0L)
    val jobs = mutable.ArrayBuffer.empty[J]
    val byId = mutable.HashMap.empty[Int, J]
    val stageToJob = mutable.HashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        // the result stage's callsite names the action that launched the
        // job — the line-level attribution the per-job analysis needs
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("")
        val j = J(e.jobId,
          Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .filter(_.nonEmpty).getOrElse(site), e.time)
        jobs += j; byId(e.jobId) = j
        e.stageIds.foreach(sid => stageToJob(sid) = j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        byId.get(e.jobId).foreach(_.completed = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        stageToJob.get(e.stageId).foreach { j =>
          j.nTasks += 1
          if (e.taskInfo != null) j.taskTime += e.taskInfo.duration
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.exists(n.contains) }

    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // one untimed warmup so JIT/codegen doesn't pollute the attribution
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"$name warmup: $e") }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      jobs.synchronized { jobs.clear(); byId.clear(); stageToJob.clear() }
      val t0 = System.currentTimeMillis()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"$name run: $e") }
      val t1 = System.currentTimeMillis()
      // let late listener events drain (listenerBus is private[spark])
      Thread.sleep(150)
      val js = jobs.synchronized(jobs.toVector.sortBy(_.submitted))
      // wall covered by >=1 running job (merge intervals)
      val iv = js.filter(_.completed > 0)
        .map(j => (j.submitted, j.completed)).sortBy(_._1)
      var covered = 0L; var curS = -1L; var curE = -1L
      iv.foreach { case (s0, e0) =>
        if (curE < 0) { curS = s0; curE = e0 }
        else if (s0 <= curE) curE = math.max(curE, e0)
        else { covered += curE - curS; curS = s0; curE = e0 }
      }
      if (curE >= 0) covered += curE - curS
      println(f"== $name wall=${t1 - t0}%dms jobs=${js.size}%d " +
        f"jobWall=${covered}ms driverGap=${t1 - t0 - covered}ms")
      js.foreach { j =>
        val d = if (j.completed > 0) j.completed - j.submitted else -1
        println(f"   job ${j.id}%4d ${d}%6dms tasks=${j.nTasks}%4d " +
          f"taskSum=${j.taskTime}%6dms ${j.desc.take(80)}")
      }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
