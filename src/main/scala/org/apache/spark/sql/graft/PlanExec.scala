package org.apache.spark.sql.graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Bridge into Spark's `private[sql]` plan-execution entry point, so an
  * optimizer rule can evaluate a SMALL statistics subquery it constructed
  * (e.g. the range-join bucket-width percentile over the interval side)
  * at planning time. `Dataset.ofRows` is the exact mechanism every
  * DataFrame action uses; it is `private[sql]` only as an API-surface
  * choice, and placing this one-liner inside the `org.apache.spark.sql`
  * namespace is the standard extension pattern open-source Spark
  * libraries use for it. Nothing here touches internals beyond that one
  * constructor call.
  */
object PlanExec {

  /** Execute `plan` and return its first row (the plan is expected to be
    * a global aggregation — exactly one row).
    */
  def head(plan: LogicalPlan): Row = df(plan).head()

  /** Wrap a Catalyst expression as a `Column` — the same one-liner
    * `functions._` uses internally. Lets the library's native codegen
    * kernels ([[graft.functions.VectorExpressions]]) be used directly
    * from Column-level helpers without requiring a session that has the
    * function registry extensions installed.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Inverse of [[column]]: the Catalyst expression behind a `Column`. */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Wrap an analyzed logical plan as a DataFrame, so a rewrite rule can
    * construct its replacement plan with the full DataFrame API instead
    * of hand-assembling Window/Union Catalyst nodes.
    */
  def df(plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(
      org.apache.spark.sql.SparkSession.active.asInstanceOf[SparkSession],
      plan)

  /** Spark's own Catalyst-conjunct → `sources.Filter` translation
    * (`DataSourceStrategy.translateFilter`), exposed so an optimizer
    * rule can derive pruning bounds through the EXACT code path the
    * DSv1 pushdown uses — one bound-derivation implementation
    * ([[graft.sources.ZOrderRelation.ranges]]) instead of a parallel
    * Expression-level copy that drifts.
    */
  def translateFilter(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)

  /** Re-wrap a streaming micro-batch Dataset as a PLAIN batch DataFrame
    * — the exact move Spark's own ForeachBatchSink makes in `addBatch`:
    * execute the incremental plan once (`toRdd`, rows copied out of the
    * reused buffers) and rebuild a non-streaming frame over the result,
    * so a DSv1 `Sink` can run ordinary batch actions on the data
    * without re-triggering incremental execution.
    */
  def freshBatchDF(data: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = data.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      data.queryExecution.toRdd.map(_.copy()), data.schema,
      isStreaming = false)
  }
}
