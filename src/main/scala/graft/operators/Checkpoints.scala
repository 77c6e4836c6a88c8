package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for iterative operators.
  *
  * Every closure-shaped loop here (connected components, star
  * contraction, label propagation, k-means|| scoring) eagerly
  * checkpoints per round to truncate lineage — the
  * exponential-plan trap documented on [[Clusters]]. Each checkpoint
  * pins its blocks in storage memory, and by default those blocks are
  * only freed when the JVM garbage-collects the RDD handle and the
  * ContextCleaner notices — so a 10-round closure holds ~10 rounds of
  * blocks, which on a production executor is storage pressure inside
  * every closure job (and was visible locally as driver-suite spread on
  * the closure-bearing queries). [[release]] frees a superseded round's
  * blocks as soon as its successor is materialized: the checkpointed
  * frame's plan is a [[LogicalRDD]] leaf holding the persisted RDD, so
  * unpersisting that RDD (non-blocking) returns the memory immediately
  * while the frame itself remains recomputable-free garbage.
  *
  * Fault tolerance at cluster scale: `localCheckpoint` blocks are
  * NON-REPLICATED executor state — one lost executor mid-loop kills the
  * job unrecoverably, which is fine at local[32] but means a multi-hour
  * PageRank on a 1000-executor cluster restarts from zero on any
  * preemption. [[eagerCheckpoint]] therefore supports an opt-in RELIABLE
  * mode: set `spark.graft.checkpointDir` to a shared-storage directory
  * (HDFS/S3) and every closure round goes through Spark's reliable
  * `Dataset.checkpoint` instead — rounds are persisted files, lost
  * partitions recompute from storage, and [[release]] deletes a
  * superseded round's files as soon as its successor is materialized so
  * the loop holds at most two rounds on disk. Default off: the local
  * path stays the fast one, and results are identical in both modes
  * (spec-pinned).
  *
  * Only call [[release]] on frames that are (a) the result of an EAGER
  * checkpoint (optionally through one projection — the shape the
  * closure loops produce when they drop a convergence column) and (b) no
  * longer referenced by any plan that has yet to execute — a released
  * frame cannot be evaluated again.
  */
private[graft] object Checkpoints {

  /** Session conf naming the reliable checkpoint root; empty/unset keeps
    * the localCheckpoint fast path.
    */
  private[graft] val DirConf = "spark.graft.checkpointDir"

  /** Per-round lineage truncation for closure loops: eager
    * `localCheckpoint` by default, eager reliable `checkpoint` when
    * [[DirConf]] is set (the SparkContext checkpoint dir is adopted from
    * the conf once; an explicit `sc.setCheckpointDir` made beforehand
    * wins and is left untouched).
    */
  implicit final class EagerOps(private val df: DataFrame) extends AnyVal {
    def eagerCheckpoint(): DataFrame = {
      val spark = df.sparkSession
      spark.conf.getOption(DirConf).map(_.trim).filter(_.nonEmpty) match {
        case Some(dir) =>
          val sc = spark.sparkContext
          if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
          df.checkpoint(eager = true)
        case None => df.localCheckpoint(eager = true)
      }
    }
  }

  /** Unpersist the storage blocks behind `df`'s checkpoint, and for a
    * RELIABLE checkpoint also delete its files (the successor round is
    * already materialized to its own files, so the superseded round's
    * directory is dead weight a month-long loop must not accumulate).
    * Matches ONLY a root [[LogicalRDD]] leaf or a single projection over
    * one — never a deep traversal: checkpoint data is not recomputable
    * (lineage truncated), so unpersisting a LogicalRDD found anywhere
    * inside a larger unevaluated plan would destroy blocks that plan
    * still needs and fail later actions with missing-block errors.
    * Frames of any other shape are a no-op, making misuse inert instead
    * of destructive.
    */
  def release(df: DataFrame): Unit = {
    def free(lr: LogicalRDD): Unit = {
      lr.rdd.unpersist(blocking = false)
      lr.rdd.getCheckpointFile.foreach { f =>
        try {
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
            .delete(p, true)
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    df.queryExecution.logical match {
      case lr: LogicalRDD => free(lr)
      case org.apache.spark.sql.catalyst.plans.logical
          .Project(_, lr: LogicalRDD) =>
        free(lr)
      case _ => ()
    }
  }
}
