package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for iterative operators.
  *
  * Every closure-shaped loop here (connected components, star
  * contraction, label propagation, k-means|| scoring) eagerly
  * `localCheckpoint`s per round to truncate lineage — the
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
  * Only call it on frames that are (a) the result of an EAGER
  * localCheckpoint (optionally through one projection — the shape the
  * closure loops produce when they drop a convergence column) and (b) no
  * longer referenced by any plan that has yet to execute — a released
  * frame cannot be evaluated again.
  */
private[graft] object Checkpoints {

  /** Unpersist the storage blocks behind `df`'s localCheckpoint. Matches
    * ONLY a root [[LogicalRDD]] leaf or a single projection over one —
    * never a deep traversal: checkpoint data is not recomputable
    * (lineage truncated), so unpersisting a LogicalRDD found anywhere
    * inside a larger unevaluated plan would destroy blocks that plan
    * still needs and fail later actions with missing-block errors.
    * Frames of any other shape are a no-op, making misuse inert instead
    * of destructive.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case org.apache.spark.sql.catalyst.plans.logical
          .Project(_, lr: LogicalRDD) =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
