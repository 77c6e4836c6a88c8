package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.graft.PlanExec
import graft.operators.Layout
import graft.sources.{ZOrderRelation, ZOrderSource}

/** Planner-level upgrade of the `graft-zorder` read path: a (filtered)
  * scan over the registered source is REPLACED with Spark's NATIVE
  * parquet relation over exactly the files the saved skipping index
  * keeps — so the physical plan is a vectorized `FileScan parquet` with
  * codegen and pushed filters, not a DSv1 `RDD[Row]` bridge paying an
  * external↔internal row conversion per row (noise locally; a real scan
  * tax at 100 TB). The DSv1 [[graft.sources.ZOrderRelation]] keeps
  * working as the fallback when the extensions are not installed; with
  * them, it is effectively a marker the planner resolves away.
  *
  * Shapes handled (transformDown, so the Filter case wins before its
  * child relation is visited):
  *   - `Filter(cond, zorder)` → `Filter(cond, parquet(keptFiles))` —
  *     per-column ranges derived from the attribute-vs-literal
  *     conjuncts, files pruned via [[Layout.loadStats]]; the full
  *     predicate stays on top (skipping is a superset guarantee) and
  *     reaches the parquet scan as pushed filters at strategy time;
  *   - a bare `zorder` relation → `parquet(path)` — no pruning, but the
  *     scan goes native.
  * The replacement projects back onto the original attribute ids, so
  * the surrounding plan is untouched. Bounds are per-column range
  * UNIONS — In-lists and Or-of-ranges prune as interval sets; truly
  * unbounded conjuncts (IsNull, strings, mixed-column Or) derive
  * nothing — conservative, never wrong; a missing index means no
  * pruning (native full scan).
  */
object ZOrderPruneRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, lr @ LogicalRelation(z: ZOrderRelation, _, _, _, _)) =>
      val pushed = splitConjuncts(cond)
        .flatMap(PlanExec.translateFilter).toArray
      Filter(cond, swap(lr, z, ZOrderRelation.ranges(pushed), pushed))
    case lr @ LogicalRelation(z: ZOrderRelation, _, _, _, _) =>
      swap(lr, z, Map.empty, Array.empty)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** The native parquet relation over the kept files (per-column range
    * unions via the DSv1 relation's ONE bound implementation —
    * [[ZOrderRelation.ranges]] — then the Bloom-sidecar narrowing for
    * pushed equality/IN probes, same as buildScan), re-projected onto
    * the zorder relation's original attribute ids.
    */
  private def swap(lr: LogicalRelation, z: ZOrderRelation,
      rangeMap: Map[String, Seq[(Double, Double)]],
      pushed: Array[org.apache.spark.sql.sources.Filter]): LogicalPlan = {
    val spark = z.spark
    val (paths, total) = Layout.loadStats(spark, z.path) match {
      case Some(stats) =>
        val all = stats.map(_.file).distinct
        val keep =
          if (rangeMap.isEmpty) all
          else stats.filter(g => ZOrderRelation.mayMatch(g, rangeMap))
            .map(_.file).distinct
        val narrowed =
          if (pushed.isEmpty) keep
          else ZOrderRelation.bloomNarrow(spark, z.path, pushed, keep)
        (narrowed, all.size)
      case None => (Seq(z.path), 1)
    }
    ZOrderSource.lastScan.set((paths.size, total))
    val df =
      if (paths.isEmpty)
        PlanExec.df(LocalRelation(lr.output.map(a =>
          AttributeReference(a.name, a.dataType, a.nullable)())))
      else spark.read.schema(z.schema).parquet(paths: _*)
    val ap = df.queryExecution.analyzed
    val byName = ap.output.map(a => a.name -> a).toMap
    Project(lr.output.map(o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId)), ap)
  }
}
