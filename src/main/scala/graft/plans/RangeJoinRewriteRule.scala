package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Conf-gated optimizer rule: rewrite point-in-interval joins into the
  * bucketized equi-join [[graft.operators.RangeJoin.pointInInterval]]
  * computes by hand — so a user can STATE the range join declaratively
  * (`p JOIN i ON p.k = i.k AND p.ts >= i.lo AND p.ts < i.hi`) and still
  * get a shuffle-partitionable plan instead of the
  * BroadcastNestedLoopJoin (or per-key residual scan) Spark would
  * otherwise run. This is the overlap-join decomposition every warehouse
  * engine applies as a planner rewrite; here it is a
  * `Rule[LogicalPlan]` injected through `SparkSessionExtensions`
  * ([[GraftExtensions]]).
  *
  * Fires only when `spark.graft.rangeJoin.bucketWidth` is set to a
  * positive long (the width is workload knowledge — near the typical
  * interval length — exactly the argument the operator form takes), on
  * INNER joins whose condition contains a `x >= lo` / `x < hi` pair with
  * `x` (LongType) from one side and `lo`, `hi` (LongType) from the
  * other. The rewrite adds a bucket column on the point side
  * (`floor(x / w)`, the operator's exact arithmetic), explodes each
  * interval to its covered buckets behind a `hi > lo` guard (an
  * empty/inverted interval satisfies no range predicate, and the guard
  * keeps `sequence()` ascending), joins on the bucket PLUS the original
  * condition (range conjuncts stay as the residual filter), and projects
  * back to the original output attributes — ids preserved, so the
  * surrounding plan is untouched. A matching pair co-occurs in exactly
  * the point's bucket: no duplicates, no dedup.
  *
  * The generated bucket attribute name marks rewritten joins so the
  * fixed-point optimizer batch cannot re-fire on its own output.
  */
object RangeJoinRewriteRule extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"
  private val BucketName = "_graft_rjbkt"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width =
      try conf.getConfString(WidthConf, "").trim match {
        case "" => 0L
        case s => s.toLong
      } catch { case _: NumberFormatException => 0L }
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if j.resolved && eligible(j, cond) =>
        rewrite(j, cond, width)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** The (point, lo, hi, pointSideIsLeft) of the first qualifying range
    * pair, if any.
    */
  private def rangePair(j: Join, cond: Expression)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val left = j.left.outputSet
    val right = j.right.outputSet
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left)) Some(true)
      else if (e.references.subsetOf(right)) Some(false)
      else None
    val conjuncts = splitConjuncts(cond)
    // normalized lower bounds: (x, lo); upper bounds: (x, hi)
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(x, lo) => (x, lo)
      case LessThanOrEqual(lo, x) => (x, lo)
    }
    val uppers = conjuncts.collect {
      case LessThan(x, hi) => (x, hi)
      case GreaterThan(hi, x) => (x, hi)
    }
    (for {
      (x, lo) <- lowers.iterator
      (x2, hi) <- uppers.iterator
      if x.semanticEquals(x2)
      if x.dataType == LongType && lo.dataType == LongType &&
        hi.dataType == LongType
      xSide <- sideOf(x)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide == hiSide && loSide != xSide
    } yield (x, lo, hi, xSide)).nextOption()
  }

  private def eligible(j: Join, cond: Expression): Boolean = {
    val marked = splitConjuncts(cond).exists(_.references.exists {
      case a: Attribute => a.name == BucketName
      case _ => false
    })
    !marked && rangePair(j, cond).isDefined
  }

  private def bucket(e: Expression, width: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(width.toDouble))),
      LongType)

  private def rewrite(j: Join, cond: Expression, width: Long): LogicalPlan = {
    val Some((x, lo, hi, pointIsLeft)) = rangePair(j, cond)
    val (pointSide, intervalSide) =
      if (pointIsLeft) (j.left, j.right) else (j.right, j.left)

    val pBktAlias = Alias(bucket(x, width), BucketName)()
    val pointPlan = Project(pointSide.output :+ pBktAlias, pointSide)

    // Sequence is TimeZoneAwareExpression: post-analysis nobody runs
    // ResolveTimeZone, so the tz must be supplied here or the plan
    // "becomes unresolved" under rule validation
    val gen = Explode(Sequence(bucket(lo, width),
      bucket(Subtract(hi, Literal(1L)), width), None,
      Some(conf.sessionLocalTimeZone)))
    val iBktAttr = AttributeReference(BucketName, LongType,
      nullable = false)()
    val intervalPlan = Generate(gen, unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(iBktAttr),
      child = Filter(GreaterThan(hi, lo), intervalSide))

    val (newLeft, newRight) =
      if (pointIsLeft) (pointPlan, intervalPlan)
      else (intervalPlan, pointPlan)
    val newCond = And(cond,
      EqualTo(pBktAlias.toAttribute, iBktAttr))
    Project(j.output,
      Join(newLeft, newRight, Inner, Some(newCond), JoinHint.NONE))
  }
}
