package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, TimestampType}

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
  * `x` from one side and `lo`, `hi` from the other, all of one
  * bucketable type — LongType, IntegerType, or TimestampType
  * (timestamps bucket at second grain via the long cast; bucketing only
  * needs a MONOTONE coarsening, the original predicate stays as the
  * exact residual). The rewrite adds a bucket column on the point side
  * (`floor(x / w)`, the operator's exact arithmetic), explodes each
  * interval to its covered buckets behind a `hi > lo` guard (an
  * empty/inverted interval satisfies no range predicate, and the guard
  * keeps `sequence()` ascending), joins on the bucket PLUS the original
  * condition (range conjuncts stay as the residual filter), and projects
  * back to the original output attributes — ids preserved, so the
  * surrounding plan is untouched. A matching pair co-occurs in exactly
  * the point's bucket: no duplicates, no dedup. For LongType bounds the
  * explosion ends at `bucket(hi - 1)` (exact); for the other types the
  * end bucket is inclusive — at most one extra bucket whose
  * non-matching pairs the residual filters, never a missed match.
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
          if j.resolved && !marked(cond) =>
        if (rangePair(j, cond).isDefined) rewrite(j, cond, width)
        else overlapPair(j, cond) match {
          case Some(p) => rewriteOverlap(j, cond, width, p)
          case None => j
        }
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** The (point, lo, hi, pointSideIsLeft) of the first qualifying range
    * pair, if any.
    */
  /** Types the bucket arithmetic supports: the long cast is monotone for
    * each (identity, widening, and second-truncation for timestamps), so
    * bucketing coarsens without reordering and the original predicate
    * remains the exact residual.
    */
  private def bucketable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | TimestampType => true
    case _ => false
  }

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
      if bucketable(x.dataType) && lo.dataType == x.dataType &&
        hi.dataType == x.dataType
      xSide <- sideOf(x)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide == hiSide && loSide != xSide
    } yield (x, lo, hi, xSide)).nextOption()
  }

  private def marked(cond: Expression): Boolean =
    splitConjuncts(cond).exists(_.references.exists {
      case a: Attribute => a.name == BucketName
      case _ => false
    })

  /** The (lStart, lEnd, rStart, rEnd) of the first interval-overlap
    * pattern: two STRICT cross-side inequalities in opposite directions,
    * `lStart < rEnd AND rStart < lEnd`, all LongType. `(lStart, lEnd)`
    * always names the LEFT side's pair regardless of which conjunct came
    * first. Point-in-interval (`x >= lo AND x < hi`) never matches — its
    * lower bound is non-strict — so [[rangePair]] keeps priority.
    */
  private def overlapPair(j: Join, cond: Expression)
      : Option[(Expression, Expression, Expression, Expression)] = {
    val left = j.left.outputSet
    val right = j.right.outputSet
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left)) Some(true)
      else if (e.references.subsetOf(right)) Some(false)
      else None
    // normalized strict bounds: (x, y) meaning x < y
    val stricts = splitConjuncts(cond).collect {
      case LessThan(x, y) => (x, y)
      case GreaterThan(y, x) => (x, y)
    }.filter { case (x, y) =>
      bucketable(x.dataType) && y.dataType == x.dataType }
    (for {
      (ls, re) <- stricts.iterator
      if sideOf(ls).contains(true) && sideOf(re).contains(false)
      (rs, le) <- stricts.iterator
      if sideOf(rs).contains(false) && sideOf(le).contains(true)
      // ALL FOUR bounds must share one type, not just each conjunct's
      // pair: a Long pair + an Int pair would otherwise match, and the
      // rewrite's Greatest/Filter mix the types into invalid Catalyst
      if ls.dataType == rs.dataType
    } yield (ls, le, rs, re)).nextOption()
  }

  private def bucket(e: Expression, width: Long): Expression =
    Cast(Floor(Divide(Cast(Cast(e, LongType), DoubleType),
      Literal(width.toDouble))), LongType)

  /** The last bucket an interval's explosion must cover: exact
    * `bucket(hi - 1)` for Long bounds; the inclusive `bucket(hi)` for
    * the other types (one possibly-extra bucket, filtered by the
    * residual — `hi - 1` is not expressible uniformly there).
    */
  private def endBucket(hi: Expression, width: Long): Expression =
    if (hi.dataType == LongType)
      bucket(Subtract(hi, Literal(1L)), width)
    else bucket(hi, width)

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
      endBucket(hi, width), None,
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

  /** Interval-overlap rewrite (`lStart < rEnd AND rStart < lEnd`): the
    * [[graft.operators.RangeJoin.intervalOverlap]] plan, stated
    * declaratively — both sides explode to the buckets their [start, end)
    * interval covers, the join runs on the bucket (plus the original
    * condition as residual), and only the overlap's FIRST bucket —
    * `bucket(greatest(lStart, rStart))`, which both explosions
    * necessarily cover — survives, so each overlapping pair is emitted
    * exactly once with no distinct.
    *
    * The raw predicate is NOT confined to well-formed intervals, and an
    * optimizer rule must preserve semantics for every input — including
    * rows whose "interval" is empty or inverted (`end <= start`), which
    * the explode guard would silently drop. Those rows can still satisfy
    * the predicate: with `lEnd <= lStart`, `lStart < rEnd AND rStart <
    * lEnd` forces `rStart < lEnd <= lStart < rEnd`, i.e. the row reduces
    * to a POINT PROBE at `lStart` into the other side's intervals (the
    * open-interval point-in-range `lo < x AND x < hi` is exactly this
    * degenerate case, with the left "interval" [x, x) always empty).
    * So the rewrite is a three-leg union, every leg an equi-join:
    *   1. valid × valid — double explode + first-overlap-bucket;
    *   2. inverted-left rows at `bucket(lStart)` × exploded right;
    *   3. exploded left × inverted-right rows at `bucket(rStart)`.
    * Inverted × inverted pairs are unsatisfiable (`lStart < rEnd <=
    * rStart < lEnd <= lStart`). Legs 2/3 carry a BROADCAST hint on the
    * (normally empty) inverted side, so AQE collapses them to empty
    * relations at runtime before the re-exploded probe side is ever
    * scanned — correctness costs nothing on well-formed data and the
    * plan stays free of nested loops either way.
    */
  private def rewriteOverlap(j: Join, cond: Expression, width: Long,
      pat: (Expression, Expression, Expression, Expression)): LogicalPlan = {
    val (lS, lE, rS, rE) = pat

    def exploded(side: LogicalPlan, s: Expression,
                 e: Expression): (LogicalPlan, Attribute) = {
      val gen = Explode(Sequence(bucket(s, width),
        endBucket(e, width), None,
        Some(conf.sessionLocalTimeZone)))
      val attr = AttributeReference(BucketName, LongType,
        nullable = false)()
      (Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(attr),
        child = Filter(GreaterThan(e, s), side)), attr)
    }
    def pointBucket(side: LogicalPlan, s: Expression,
                    e: Expression): (LogicalPlan, Attribute) = {
      val a = Alias(bucket(s, width), BucketName)()
      (Project(side.output :+ a,
        Filter(LessThanOrEqual(e, s), side)), a.toAttribute)
    }
    val bcast = Some(HintInfo(strategy = Some(BROADCAST)))

    val (lx, lb) = exploded(j.left, lS, lE)
    val (rx, rb) = exploded(j.right, rS, rE)
    val leg1 = Join(lx, rx, Inner,
      Some(And(And(cond, EqualTo(lb, rb)),
        EqualTo(lb, bucket(Greatest(Seq(lS, rS)), width)))),
      JoinHint.NONE)

    val (lInv, lInvB) = pointBucket(j.left, lS, lE)
    val (rx2, rb2) = exploded(j.right, rS, rE)
    val leg2 = Join(lInv, rx2, Inner,
      Some(And(cond, EqualTo(lInvB, rb2))), JoinHint(bcast, None))

    val (lx2, lb2) = exploded(j.left, lS, lE)
    val (rInv, rInvB) = pointBucket(j.right, rS, rE)
    val leg3 = Join(lx2, rInv, Inner,
      Some(And(cond, EqualTo(lb2, rInvB))), JoinHint(None, bcast))

    Union(Seq(Project(j.output, leg1), Project(j.output, leg2),
      Project(j.output, leg3)))
  }
}
