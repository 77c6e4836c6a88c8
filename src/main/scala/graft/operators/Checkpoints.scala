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
  * localCheckpoint and (b) no longer referenced by any plan that has
  * yet to execute — a released frame cannot be evaluated again.
  */
private[graft] object Checkpoints {

  /** Unpersist the storage blocks behind `df`'s localCheckpoint. No-op
    * on frames that are not checkpoint results.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
