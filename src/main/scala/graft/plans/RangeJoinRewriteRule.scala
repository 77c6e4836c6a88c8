package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Max, Sum}
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DateType, DoubleType, IntegerType, LongType, TimestampType}

/** Optimizer rule: rewrite point-in-interval joins into the bucketized
  * equi-join [[graft.operators.RangeJoin.pointInInterval]] computes by
  * hand — so a user can STATE the range join declaratively
  * (`p JOIN i ON p.k = i.k AND p.ts >= i.lo AND p.ts < i.hi`) and still
  * get a shuffle-partitionable plan instead of the
  * BroadcastNestedLoopJoin (or per-key residual scan) Spark would
  * otherwise run. This is the overlap-join decomposition every warehouse
  * engine applies as a planner rewrite; here it is a
  * `Rule[LogicalPlan]` injected through `SparkSessionExtensions`
  * ([[GraftExtensions]]).
  *
  * Bucket width — `spark.graft.rangeJoin.bucketWidth`:
  *   - a positive long: that fixed width, for every rewritten join;
  *   - "auto" or UNSET (the default): the width is derived PER JOIN from
  *     the interval side itself — first statically (an interval built as
  *     `hi = lo + literal` carries its exact length in the plan, chased
  *     through the projection aliases between the join and the
  *     arithmetic), else by a tiny planning-time aggregation over the
  *     filtered two-column interval side: `approx_percentile(len, 0.75)`
  *     floored at 1 — the same rule of thumb as
  *     [[graft.operators.RangeJoin.suggestBucketWidth]] ("near the
  *     typical interval length": explosion factor ~1–2×). At warehouse
  *     scale the interval side is the dimension side, and the sampling
  *     job scans just its two bound columns once per planned join;
  *   - "off" (or 0/negative/unparseable): the rule never fires.
  *
  * Pattern scope: the CLOSED-OPEN point-in-interval shape
  * (`x >= lo AND x < hi`, bounds cross-side) fires in every mode — it is
  * unambiguous. The interval-OVERLAP shape (two opposite STRICT
  * cross-side inequalities) fires only when the conf is EXPLICITLY set
  * (numeric or "auto"): any incidental pair of opposite strict
  * inequalities in an ordinary join condition matches it structurally,
  * so it stays opt-in.
  *
  * Bucketable bound types: LongType, IntegerType, TimestampType
  * (second-grain long cast), DateType (epoch-day grain via UnixDate)
  * and DoubleType (the reference's native delay
  * type — float seconds, trx id9.py:49-56). Bucketing only needs a
  * MONOTONE coarsening — the original predicate stays as the exact
  * residual — and `floor(x / w)` is monotone for all four. Double NaN/∞
  * BOUNDS cannot bucketize (a `[lo, NaN)` interval matches every point
  * above lo under Spark's NaN-largest ordering, which no finite
  * explosion covers — and `floor` on a double is SILENT about it:
  * floor(NaN)=0, floor(±∞/huge) saturates at ±Long.MaxValue, so the
  * failure mode is wrong buckets and lost matches, not an error). Every
  * mode therefore verifies DoubleType interval bounds at planning time:
  * the static literal-shift path is safe by construction (a non-finite
  * start yields a non-finite end, which fails the `hi > lo` explode
  * guard and satisfies the predicate for no point), the sampling path
  * counts non-finite and saturation-magnitude bounds in the width pass,
  * and FIXED mode runs the same statistics as a dedicated check
  * ([[doubleSafe]]) — any offender and the rewrite is refused; the
  * nested-loop plan is the only exact one then. Non-finite POINT values
  * are always safe: points never explode, a saturated point bucket can
  * equal no admitted interval bucket, and the residual rejects NaN
  * points.
  *
  * The rewrite adds a bucket column on the point side (`floor(x / w)`,
  * the operator's exact arithmetic), explodes each interval to its
  * covered buckets behind a `hi > lo` guard (an empty/inverted interval
  * satisfies no range predicate, and the guard keeps `sequence()`
  * ascending), joins on the bucket PLUS the original condition (range
  * conjuncts stay as the residual filter), and projects back to the
  * original output attributes — ids preserved, so the surrounding plan
  * is untouched. A matching pair co-occurs in exactly the point's
  * bucket: no duplicates, no dedup. For LongType bounds the explosion
  * ends at `bucket(hi - 1)` (exact); for the other types the end bucket
  * is inclusive — at most one extra bucket whose non-matching pairs the
  * residual filters, never a missed match.
  *
  * The generated bucket attribute name (shared with the operator form,
  * [[graft.operators.RangeJoin.BucketName]]) marks rewritten joins so
  * the fixed-point optimizer batch cannot re-fire on its own output —
  * and so the rule never re-buckets the operator form's own join.
  */
/** Width-free declarative interval-overlap join: the marker predicate a
  * user states in a plain join condition —
  * {{{
  *   meetings.join(outages,
  *     meetings("room") === outages("room") &&
  *       expr("interval_overlap(m_start, m_end, o_start, o_end)"))
  * }}}
  * — meaning the [start, end) intervals STRICTLY overlap
  * (`aS < bE AND bS < aE`). The raw two-strict-inequalities shape is
  * structurally ambiguous (any incidental pair of opposite `<`
  * conjuncts matches it), so the conf-free rewrite needs this explicit
  * statement of intent; the marker fires the three-leg bucketized
  * rewrite with auto-derived width in EVERY mode — no
  * `spark.graft.rangeJoin.bucketWidth` required (a set numeric conf is
  * honored as the width). INNER, LEFT/RIGHT OUTER and FULL OUTER joins:
  * the outer forms ("sessions with NO incident window" keeps the
  * session with nulls) rewrite as the inner three-leg union PLUS the
  * anti-complement(s) — unmatched rows found by an all-columns
  * null-safe equi-anti-join against the DISTINCT matched tuples of
  * their side (sound because the overlap condition reads only a row's
  * own columns, so value-identical rows share their match fate;
  * multiplicity preserved, no row ids, no nested loop anywhere); LEFT
  * SEMI and LEFT ANTI run directly against the distinct matched tuples
  * ("sessions with / without an incident" as one declarative join).
  * Non-deterministic sides refuse every complement form (a side is
  * evaluated more than once there). [[Unevaluable]] on purpose: an
  * unrewritable marker join (bounds mixed across sides, >1 marker,
  * non-deterministic complement side) fails loudly instead of silently
  * scanning pairs — [[AsofJoinMarker]]'s contract.
  */
case class IntervalOverlapMarker(aStart: Expression, aEnd: Expression,
                                 bStart: Expression, bEnd: Expression)
    extends Expression with Unevaluable {
  override def children: Seq[Expression] = Seq(aStart, aEnd, bStart, bEnd)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "interval_overlap"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val dts = children.map(_.dataType)
    val ok = dts.forall(_ == dts.head) && (dts.head match {
      case LongType | IntegerType | TimestampType | DoubleType |
           DateType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis
      .TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"$prettyName needs four bounds of ONE long/int/timestamp/date/" +
          s"double type, got ${dts.map(_.sql).mkString(", ")}")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IntervalOverlapMarker =
    IntervalOverlapMarker(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3))
}

object RangeJoinRewriteRule extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  /** Opt-in TTL (milliseconds) for caching the planning-time width/
    * safety sample per (interval side, lo, hi) — for pipelines that plan
    * the SAME range join many times per session (every action on a frame
    * containing one re-optimizes it). 0/unset (the default) keeps the
    * deliberate no-cache behaviour: the sampled statistics include the
    * DoubleType NaN/∞ safety verdict, and a stale "finite" verdict could
    * admit a bound that arrived after the cache fill — setting a TTL is
    * the user's assertion that the interval side is static on that
    * horizon. Keys are CANONICALIZED plan/expression objects compared
    * structurally (never hashes alone — a hash collision here could
    * admit an unsafe rewrite); the cache is bounded and cleared
    * wholesale when full.
    */
  val StatsCacheConf = "spark.graft.rangeJoin.statsCacheTtlMs"

  private val MaxCacheEntries = 128
  private val statsCache = new java.util.concurrent.ConcurrentHashMap[
    (LogicalPlan, Expression, Expression),
    (Long, Option[(Double, Int)])]()

  private def cacheTtlMs(): Long =
    try conf.getConfString(StatsCacheConf, "0").trim.toLong
    catch { case _: Exception => 0L }

  /** Test hook: entries currently cached. */
  private[graft] def statsCacheSize: Int = statsCache.size()
  private def BucketName = graft.operators.RangeJoin.BucketName
  private def LevelName = graft.operators.RangeJoin.LevelName

  private sealed trait Mode
  private case object Off extends Mode
  private final case class Fixed(w: Double) extends Mode
  private final case class Auto(explicit: Boolean) extends Mode

  private def currentMode(): Mode = {
    val explicit =
      try conf.contains(WidthConf) catch { case _: Exception => false }
    val raw =
      try conf.getConfString(WidthConf, "auto").trim.toLowerCase
      catch { case _: Exception => "auto" }
    raw match {
      case "" | "auto" => Auto(explicit)
      case "off" => Off
      case s =>
        // fractional widths are first-class: sub-1.0 interval lengths
        // (millisecond-scale double delays) would otherwise floor to
        // w=1 and put ~1/len points in every probed bucket
        try { val w = s.toDouble; if (w > 0 && w.isFinite) Fixed(w) else Off }
        catch { case _: NumberFormatException => Off }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode = currentMode()
    plan.transformUp {
      case j @ Join(_, _, LeftOuter, Some(cond), _)
          if j.resolved && !marked(cond) &&
            cond.exists(_.isInstanceOf[IntervalOverlapMarker]) =>
        markedOverlapOuter(j, cond, mode).getOrElse(j)
      case j @ Join(_, _, RightOuter, Some(cond), _)
          if j.resolved && !marked(cond) &&
            cond.exists(_.isInstanceOf[IntervalOverlapMarker]) =>
        // the left-outer machinery on the FLIPPED join; the overlap
        // condition is side-symmetric, only the output column order
        // needs restoring
        markedOverlapOuter(
            Join(j.right, j.left, LeftOuter, Some(cond), JoinHint.NONE),
            cond, mode)
          .map(p => Project(j.output, p)).getOrElse(j)
      case j @ Join(_, _, FullOuter, Some(cond), _)
          if j.resolved && !marked(cond) &&
            cond.exists(_.isInstanceOf[IntervalOverlapMarker]) =>
        markedOverlapFull(j, cond, mode).getOrElse(j)
      case j @ Join(_, _, LeftSemi | LeftAnti, Some(cond), _)
          if j.resolved && !marked(cond) &&
            cond.exists(_.isInstanceOf[IntervalOverlapMarker]) =>
        markedOverlapSemiAnti(j, cond, mode).getOrElse(j)
      case j @ Join(_, _, Inner, Some(cond), _)
          if j.resolved && !marked(cond) &&
            (mode != Off ||
              cond.exists(_.isInstanceOf[IntervalOverlapMarker])) =>
        // a stated marker is explicit user intent: it fires in every
        // mode (incl. Off), and an unrewritable marker join FAILS at
        // execution (the marker is Unevaluable) instead of silently
        // running something else — the as-of marker's contract
        if (cond.exists(_.isInstanceOf[IntervalOverlapMarker]))
          markedOverlap(j, cond, mode).getOrElse(j)
        else if (mode == Off) j
        else rangePair(j, cond) match {
          case Some((_, lo, hi, pointIsLeft)) =>
            val intervalSide = if (pointIsLeft) j.right else j.left
            pointWidth(mode, intervalSide, lo, hi) match {
              case Some((w, maxLvl)) => rewrite(j, cond, w, maxLvl)
              case None => j
            }
          case None =>
            val overlapEnabled = mode match {
              case Fixed(_) => true
              case Auto(explicit) => explicit
              case Off => false
            }
            if (!overlapEnabled) j
            else overlapPair(j, cond) match {
              case Some(p) =>
                val (lS, lE, rS, rE) = p
                widthOf(mode,
                    Seq((j.left, lS, lE), (j.right, rS, rE))) match {
                  case Some(w) => rewriteOverlap(j, cond, w, p)
                  case None => j
                }
              case None => j
            }
        }
    }
  }

  /** The width-free declarative overlap join: one
    * `interval_overlap(aS, aE, bS, bE)` conjunct, one pair per side (in
    * either order), all four bounds one bucketable type. The marker is
    * REPLACED by its meaning — the strict-overlap predicate
    * `lS < rE AND rS < lE` over [start, end) intervals — and the
    * three-leg overlap rewrite runs with auto-derived width (or the
    * conf's fixed width when one is set). None ⇒ the marker stays in
    * the plan and execution fails loudly.
    */
  private def markedOverlapParts(j: Join, cond: Expression, mode: Mode)
      : Option[(Expression, Double, (Expression, Expression, Expression, Expression))] = {
    val conjs = splitConjuncts(cond)
    val markers = conjs.collect { case m: IntervalOverlapMarker => m }
    if (markers.size != 1) return None
    val m = markers.head
    val left = j.left.outputSet
    val right = j.right.outputSet
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left)) Some(true)
      else if (e.references.subsetOf(right)) Some(false)
      else None
    val pat = (sideOf(m.aStart), sideOf(m.aEnd),
        sideOf(m.bStart), sideOf(m.bEnd)) match {
      case (Some(true), Some(true), Some(false), Some(false)) =>
        (m.aStart, m.aEnd, m.bStart, m.bEnd)
      case (Some(false), Some(false), Some(true), Some(true)) =>
        (m.bStart, m.bEnd, m.aStart, m.aEnd)
      case _ => return None
    }
    val (lS, lE, rS, rE) = pat
    if (!bucketable(lS.dataType) ||
        Seq(lE, rS, rE).exists(_.dataType != lS.dataType)) return None
    val real = And(LessThan(lS, rE), LessThan(rS, lE))
    val newCond = (conjs.filterNot(_ eq m) :+ real).reduce(And)
    val widthMode = mode match {
      case f: Fixed => f // an explicit width is honored (and verified)
      case _ => Auto(explicit = true)
    }
    widthOf(widthMode, Seq((j.left, lS, lE), (j.right, rS, rE)))
      .map(w => (newCond, w, pat))
  }

  private def markedOverlap(j: Join, cond: Expression,
                            mode: Mode): Option[LogicalPlan] =
    markedOverlapParts(j, cond, mode).map { case (c, w, pat) =>
      rewriteOverlap(j, c, w, pat) }

  /** LEFT OUTER marked overlap: the inner three-leg rewrite unioned with
    * the anti-complement (left rows with NO overlapping right row, right
    * columns null) — the "sessions with no error window" shape as one
    * declarative join.
    *
    * The complement never needs a nested loop OR a row id: the join
    * condition references only a left row's own columns, so two
    * value-identical left rows have identical match sets — membership of
    * the row's VALUE TUPLE in the matched set decides, and a null-safe
    * all-columns equi-anti-join against `Distinct(matched left tuples)`
    * preserves multiplicity exactly. Honest cost: the three-leg inner
    * rewrite appears twice in the plan (once for the matched rows, once
    * under the Distinct feeding the anti) — 2× the inner work, still
    * shuffle-partitionable everywhere, vs the O(|L|·|R|) nested loop
    * this is the alternative to. Refused (marker stays, fails loudly)
    * when a left column type cannot join-compare (map columns).
    */
  /** The complement machinery evaluates a side more than once (semi
    * legs + anti probe), so a non-deterministic side (rand()-derived
    * columns) would compare DIFFERENT datasets between evaluations —
    * refuse, the marker fails loudly.
    */
  private def deterministicSides(j: Join): Boolean =
    !Seq(j.left, j.right).exists(_.exists(_.expressions.exists(e =>
      e.exists(!_.deterministic))))

  private def markedOverlapOuter(j: Join, cond: Expression,
                                 mode: Mode): Option[LogicalPlan] = {
    if (!joinComparable(j.left.output) || !deterministicSides(j))
      return None
    val innerTwin = j.copy(joinType = Inner)
    markedOverlapParts(innerTwin, cond, mode).map { case (c, w, pat) =>
      val inner = rewriteOverlap(innerTwin, c, w, pat)
      val matched = matchedTuples(keepLeft = true, innerTwin, c, w, pat)
      Union(Seq(Project(j.output, inner),
        Project(j.output, unmatchedNullLeg(matched, j.left, j.right))))
    }
  }

  /** FULL OUTER marked overlap: the inner rewrite plus BOTH
    * anti-complements — unmatched left rows with null right columns and
    * unmatched right rows with null left columns, each found by the
    * same distinct-tuple null-safe equi-anti as the left-outer form.
    */
  private def markedOverlapFull(j: Join, cond: Expression,
                                mode: Mode): Option[LogicalPlan] = {
    if (!joinComparable(j.left.output) ||
        !joinComparable(j.right.output) ||
        !deterministicSides(j)) return None
    val innerTwin = j.copy(joinType = Inner)
    markedOverlapParts(innerTwin, cond, mode).map { case (c, w, pat) =>
      val inner = rewriteOverlap(innerTwin, c, w, pat)
      val mL = matchedTuples(keepLeft = true, innerTwin, c, w, pat)
      val mR = matchedTuples(keepLeft = false, innerTwin, c, w, pat)
      Union(Seq(Project(j.output, inner),
        Project(j.output, unmatchedNullLeg(mL, j.left, j.right)),
        Project(j.output, unmatchedNullLeg(mR, j.right, j.left))))
    }
  }

  /** LEFT SEMI / LEFT ANTI marked overlap ("sessions WITH ≥1 incident" /
    * "sessions with NO incident", output = left columns only): the
    * semi/anti join runs directly against the DISTINCT matched left
    * value-tuples on null-safe all-columns equality — value-identical
    * rows share their match fate, so membership of the tuple decides
    * and multiplicity is preserved.
    */
  private def markedOverlapSemiAnti(j: Join, cond: Expression,
                                    mode: Mode): Option[LogicalPlan] = {
    if (!joinComparable(j.left.output) || !deterministicSides(j))
      return None
    val innerTwin = Join(j.left, j.right, Inner, Some(cond), JoinHint.NONE)
    markedOverlapParts(innerTwin, cond, mode).map { case (c, w, pat) =>
      val matched = matchedTuples(keepLeft = true, innerTwin, c, w, pat)
      val (probe, eqCond) = nullSafeProbe(j.left.output, matched)
      Join(j.left, probe, j.joinType, Some(eqCond), JoinHint.NONE)
    }
  }

  /** The matched-tuples side re-aliased to fresh exprIds plus the
    * null-safe all-columns equality against the original attributes —
    * shared by the anti complement and the semi/anti direct forms.
    */
  private def nullSafeProbe(cols: Seq[Attribute],
      matched: LogicalPlan): (LogicalPlan, Expression) = {
    val aliases = cols.map(a => Alias(a, a.name)())
    val probe = Project(aliases, matched)
    val eq = cols.zip(aliases.map(_.toAttribute))
      .map { case (l, m) => EqualNullSafe(l, m) }
      .reduceOption[Expression](And)
      .getOrElse(Literal(true))
    (probe, eq)
  }

  /** The exploded-interval leg (`hi > lo` guard + one bucket row per
    * covered bucket) — ONE implementation for the inner rewrite and
    * every complement form, so the matched set the complements see is
    * exactly what the inner join produces.
    */
  private def explodedPlan(side: LogicalPlan, s: Expression, e: Expression,
      width: Double): (LogicalPlan, Attribute) = {
    val gen = Explode(Sequence(bucket(s, width),
      endBucket(e, width), None, Some(conf.sessionLocalTimeZone)))
    val attr = AttributeReference(BucketName, LongType, nullable = false)()
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(attr),
      child = Filter(GreaterThan(e, s), side)), attr)
  }

  /** The degenerate-interval (point-probe) leg — `end <= start` rows
    * bucket at their start. Shared like [[explodedPlan]].
    */
  private def pointBucketPlan(side: LogicalPlan, s: Expression,
      e: Expression, width: Double): (LogicalPlan, Attribute) = {
    val a = Alias(bucket(s, width), BucketName)()
    (Project(side.output :+ a,
      Filter(LessThanOrEqual(e, s), side)), a.toAttribute)
  }

  /** The DISTINCT matched value-tuples of one side under the overlap
    * join — computed with LEFT SEMI joins over the same three-leg bucket
    * structure instead of aggregating the full inner result: existence
    * short-circuits per probe row, so the complement costs one
    * semi-probe pass over the kept side rather than re-materializing
    * every matching pair (the difference between ~1× and ~2× the inner
    * join's work on high-fan-out overlap data). Leg 1 needs no
    * first-overlap-bucket dedup predicate — semi joins cannot duplicate.
    */
  private def matchedTuples(keepLeft: Boolean, j: Join, cond: Expression,
      width: Double,
      pat: (Expression, Expression, Expression, Expression)): LogicalPlan = {
    val (lS, lE, rS, rE) = pat
    val keepCols = (if (keepLeft) j.left else j.right).output
    def semi(probe: LogicalPlan, build: LogicalPlan,
             extra: Expression): LogicalPlan =
      Project(keepCols,
        Join(probe, build, LeftSemi, Some(And(cond, extra)), JoinHint.NONE))

    val (lx1, lb1) = explodedPlan(j.left, lS, lE, width)
    val (rx1, rb1) = explodedPlan(j.right, rS, rE, width)
    val leg1 =
      if (keepLeft) semi(lx1, rx1, EqualTo(lb1, rb1))
      else semi(rx1, lx1, EqualTo(lb1, rb1))
    val (lInv, lInvB) = pointBucketPlan(j.left, lS, lE, width)
    val (rx2, rb2) = explodedPlan(j.right, rS, rE, width)
    val leg2 =
      if (keepLeft) semi(lInv, rx2, EqualTo(lInvB, rb2))
      else semi(rx2, lInv, EqualTo(lInvB, rb2))
    val (lx3, lb3) = explodedPlan(j.left, lS, lE, width)
    val (rInv, rInvB) = pointBucketPlan(j.right, rS, rE, width)
    val leg3 =
      if (keepLeft) semi(lx3, rInv, EqualTo(lb3, rInvB))
      else semi(rInv, lx3, EqualTo(lb3, rInvB))
    Aggregate(keepCols, keepCols, Union(Seq(leg1, leg2, leg3)))
  }

  /** Value-tuple join-comparability (maps can neither group nor
    * null-safe-compare — such a side refuses the rewrite and the marker
    * fails loudly instead).
    */
  private def joinComparable(attrs: Seq[Attribute]): Boolean =
    attrs.forall(a =>
      org.apache.spark.sql.catalyst.util.TypeUtils
        .typeWithProperEquals(a.dataType) ||
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(a.dataType))

  /** `keep` rows with NO match, extended with null `other` columns
    * under the ORIGINAL exprIds (so the surrounding plan's references
    * resolve unchanged). `matchedDistinct` is the [[matchedTuples]]
    * plan (the distinct spelled as the group-by Aggregate directly —
    * ReplaceDistinctWithAggregate already ran at this point in the
    * optimizer), re-aliased here to fresh exprIds so the anti join's
    * two sides don't share attribute ids.
    */
  private def unmatchedNullLeg(matchedDistinct: LogicalPlan,
                               keep: LogicalPlan,
                               other: LogicalPlan): LogicalPlan = {
    val keepCols = keep.output
    val (probe, antiCond) = nullSafeProbe(keepCols, matchedDistinct)
    val anti = Join(keep, probe, LeftAnti, Some(antiCond), JoinHint.NONE)
    val nulls = other.output.map(a =>
      Alias(Literal(null, a.dataType), a.name)(exprId = a.exprId))
    Project(keepCols ++ nulls, anti)
  }

  // ------------------------------------------------------ width resolution

  /** Per-interval explosion cap for the AUTO multi-level plan — the
    * operator form's `maxBucketsPerInterval` default.
    */
  private val Cap = 256L

  /** Width resolution for the point-in-interval rewrite, plus the MAX
    * LEVEL the multi-resolution plan needs (0 = classic single-level):
    *   - Fixed: the expert conf — single-level, exactly the plan the
    *     user asked for (q135/q150's byte-stable shape);
    *   - Auto + static shift: every interval has the literal length, so
    *     level 0 by construction;
    *   - Auto + sampling: the SAME planning-time aggregate also reads
    *     max(len), and an outlier-length interval raises the level so
    *     the rewrite inherits the operator form's skew bound — no
    *     declaratively-stated join can explode len/width rows in one
    *     task (or hit the sequence-length limit) just because the data
    *     held one year-long interval.
    */
  private def pointWidth(mode: Mode, side: LogicalPlan, lo: Expression,
                         hi: Expression): Option[(Double, Int)] =
    mode match {
      case Fixed(w) =>
        if (lo.dataType == DoubleType && !doubleSafe(side, lo, hi, w)) None
        else Some((w, 0))
      case Off => None
      case Auto(_) =>
        staticShift(side, lo, hi).map(w => (w, 0))
          .orElse(sampledWidth(side, lo, hi))
    }

  /** One width per overlap join, the max over the two sides (the longer
    * side's typical length bounds BOTH explosions: the longer side
    * explodes ~1–2×, the shorter ≤ 2 buckets). None = don't rewrite.
    * The overlap rewrite stays single-level (it is opt-in; the operator
    * form carries the multi-resolution bound).
    */
  private def widthOf(mode: Mode,
      sides: Seq[(LogicalPlan, Expression, Expression)]): Option[Double] =
    mode match {
      case Fixed(w) =>
        if (sides.forall { case (s, lo, hi) =>
          lo.dataType != DoubleType || doubleSafe(s, lo, hi, w) }) Some(w)
        else None
      case Off => None
      case Auto(_) =>
        val ws = sides.map { case (side, lo, hi) =>
          staticShift(side, lo, hi)
            .orElse(sampledWidth(side, lo, hi).map(_._1))
        }
        if (ws.forall(_.isDefined)) Some(ws.flatten.max) else None
    }

  private def litWidth(l: Literal): Option[Double] = l.value match {
    case v: Long => Some(v.toDouble)
    case v: Int => Some(v.toDouble)
    case v: Short => Some(v.toDouble)
    case v: Double => Some(v)
    case v: Float => Some(v.toDouble)
    case v: org.apache.spark.sql.types.Decimal => Some(v.toDouble)
    case _ => None
  }

  /** Static width inference: the interval length is IN the plan whenever
    * the end is built as `start + literal` (or start as `end - literal`).
    * The join condition sees only the interval side's output ATTRIBUTES,
    * so both bounds are first de-aliased through the Project/Filter/
    * SubqueryAlias chain below the join until the arithmetic (or an
    * opaque leaf) is reached.
    */
  private def staticShift(side: LogicalPlan, lo0: Expression,
                          hi0: Expression): Option[Double] = {
    def shift(lo: Expression, hi: Expression): Option[Double] = {
      val c = hi match {
        case Add(l2, l: Literal, _) if l2.semanticEquals(lo) => litWidth(l)
        case Add(l: Literal, l2, _) if l2.semanticEquals(lo) => litWidth(l)
        case _ => lo match {
          case Subtract(h2, l: Literal, _) if h2.semanticEquals(hi) =>
            litWidth(l)
          case _ => None
        }
      }
      c.filter(w => w > 0 && w.isFinite)
    }
    var lo = lo0
    var hi = hi0
    var plan = side
    var depth = 0
    while (depth < 32) {
      shift(lo, hi) match {
        case some @ Some(_) => return some
        case None =>
      }
      plan match {
        case Project(projList, child) =>
          def subst(e: Expression): Expression = e.transform {
            case a: Attribute =>
              projList.collectFirst {
                case al @ Alias(c, _) if al.exprId == a.exprId => c
                case at: Attribute if at.exprId == a.exprId => at
              }.getOrElse(a)
          }
          lo = subst(lo); hi = subst(hi); plan = child
        case f: Filter => plan = f.child
        case s: SubqueryAlias => plan = s.child
        case _ => return None
      }
      depth += 1
    }
    None
  }

  /** Sampled width: `approx_percentile(coarse(hi) - coarse(lo), 0.75)`
    * over the `hi > lo` interval rows, executed as its own small job at
    * planning time ([[org.apache.spark.sql.graft.PlanExec]]); the same
    * pass reads `max(len)`, from which the multi-resolution max level
    * follows (the smallest level whose capacity `Cap · width · Cap^l`
    * covers the longest interval). For DoubleType bounds the pass also
    * counts non-finite bounds among explodable rows; any present → None
    * (only the nested-loop plan is correct for them). Any execution
    * failure degrades to None — the original join always remains valid.
    *
    * Runs once per OPTIMIZATION of a matching join — i.e. per action on
    * a frame containing one. NOT cached across actions by default: the
    * double-bound verdict is part of correctness (a stale cached
    * "finite" verdict could admit a NaN bound that arrived after the
    * cache fill and silently lose matches), and the cost is one
    * two-column aggregation of the interval side — the dimension side
    * at warehouse scale. Pipelines that plan the same join hundreds of
    * times opt into a bounded TTL cache via [[StatsCacheConf]] — their
    * explicit assertion that the interval side is static on that
    * horizon.
    */
  private def sampledWidth(side: LogicalPlan, lo: Expression,
                           hi: Expression): Option[(Double, Int)] = {
    // a non-deterministic interval side (rand()-derived bounds) would
    // make the sampled statistics — including the NON-FINITE verdict the
    // DoubleType safety rests on — describe a DIFFERENT dataset than the
    // one the join executes over: refuse, keep the original plan
    if (side.exists(_.expressions.exists(e =>
        e.exists(!_.deterministic)))) return None
    val ttl = cacheTtlMs()
    if (ttl > 0) {
      val key = (side.canonicalized, lo.canonicalized, hi.canonicalized)
      val now = System.currentTimeMillis()
      val hit = statsCache.get(key)
      if (hit != null && now - hit._1 <= ttl) return hit._2
      val fresh = sampledWidthUncached(side, lo, hi)
      if (statsCache.size() >= MaxCacheEntries) statsCache.clear()
      statsCache.put(key, (now, fresh))
      fresh
    } else sampledWidthUncached(side, lo, hi)
  }

  private def sampledWidthUncached(side: LogicalPlan, lo: Expression,
                                   hi: Expression): Option[(Double, Int)] = {
    val len = Subtract(coarse(hi), coarse(lo))
    val pct = Alias(new ApproximatePercentile(len, Literal(0.75d))
      .toAggregateExpression(), "w")()
    val mx = Alias(Max(len).toAggregateExpression(), "mx")()
    val (nf, mag) = doubleStatExprs(lo, hi)
    val agg = Aggregate(Nil, Seq(pct, mx, nf, mag),
      Filter(GreaterThan(hi, lo), side))
    val row =
      try org.apache.spark.sql.graft.PlanExec.head(agg)
      catch { case scala.util.control.NonFatal(_) => return None }
    if (!row.isNullAt(2) && row.getLong(2) > 0) None
    else if (row.isNullAt(0)) Some((1.0, 0))
    else {
      // DoubleType axes keep the sampled p75 AS IS (fractional widths:
      // a millisecond-scale interval corpus gets millisecond buckets,
      // not 1000×-over-wide unit buckets); integral/timestamp/date axes
      // keep the whole-unit floor — their grid has no sub-1 resolution,
      // and existing plans stay byte-identical
      val p75 = row.getDouble(0)
      val w =
        if (lo.dataType == DoubleType) { if (p75 > 0 && p75.isFinite) p75 else 1.0 }
        else math.max(1L, math.round(p75)).toDouble
      // bucket-magnitude safety (see doubleSafe): bounds whose bucket
      // would saturate the long range cannot rewrite exactly
      if (!row.isNullAt(3) && row.getDouble(3) >= MaxBucketMag * w)
        return None
      val maxLen = row.getDouble(1)
      val widths = levelWidths(w)
      val maxLvl = widths.indices
        .find(l => maxLen <= Cap.toDouble * widths(l))
        .getOrElse(widths.size - 1)
      Some((w, maxLvl))
    }
  }

  /** The multi-resolution level widths from a (possibly fractional) base
    * width: `w · Cap^l`, grown until a further level could saturate the
    * bucket range — the Double twin of
    * [[graft.operators.RangeJoin.levelWidths]].
    */
  private def levelWidths(bucketWidth: Double): Seq[Double] = {
    val b = Seq.newBuilder[Double]
    var w = bucketWidth
    b += w
    while (w <= MaxBucketMag / Cap) { w *= Cap; b += w }
    b.result()
  }

  /** The double-bound statistics read alongside the width sample:
    * `nf` = count of explodable rows with a NaN/±∞ bound, `mag` = the
    * largest |bound| (0/null for non-double types, which cannot
    * saturate).
    */
  private def doubleStatExprs(lo: Expression,
      hi: Expression): (NamedExpression, NamedExpression) =
    if (lo.dataType == DoubleType) {
      def bad(e: Expression) = Or(IsNaN(e),
        Or(EqualTo(e, Literal(Double.PositiveInfinity)),
           EqualTo(e, Literal(Double.NegativeInfinity))))
      (Alias(Sum(If(Or(bad(lo), bad(hi)), Literal(1L), Literal(0L)))
         .toAggregateExpression(), "nf")(),
       Alias(Max(Greatest(Seq(Abs(lo), Abs(hi)))).toAggregateExpression(),
         "mag")())
    } else (Alias(Literal(0L), "nf")(),
      Alias(Literal(0.0d), "mag")())

  /** Margin below 2^63 at which a double bucket (`floor(x / w)`) is
    * still exactly representable and nowhere near saturation (floor on
    * a double SATURATES at ±Long.MaxValue and floor(NaN) is 0 — silent
    * wrong buckets, not errors).
    */
  private val MaxBucketMag = 4.6e18 // < 2^62

  /** DoubleType admission check for FIXED-width mode (auto mode reads
    * the same statistics inside [[sampledWidth]]): one planning-time
    * pass over the explodable interval rows — any NaN/±∞ bound, or a
    * bound whose bucket magnitude approaches long saturation, and the
    * rewrite is refused (the nested-loop plan is the only exact one).
    * POINTS need no check: with every admitted interval bucket below
    * the margin, a point whose own bucket saturates can equal no
    * admitted bucket, and the residual rejects NaN points. A
    * non-deterministic side cannot be verified at planning time — the
    * explicit width is the user's assertion that the bounds are
    * well-behaved, so the rewrite proceeds as it always did there.
    */
  private def doubleSafe(side: LogicalPlan, lo: Expression,
                         hi: Expression, width: Double): Boolean = {
    if (side.exists(_.expressions.exists(e =>
        e.exists(!_.deterministic)))) return true
    val (nf, mag) = doubleStatExprs(lo, hi)
    val agg = Aggregate(Nil, Seq(nf, mag),
      Filter(GreaterThan(hi, lo), side))
    val row =
      try org.apache.spark.sql.graft.PlanExec.head(agg)
      catch { case scala.util.control.NonFatal(_) => return false }
    (row.isNullAt(0) || row.getLong(0) == 0L) &&
      (row.isNullAt(1) || row.getDouble(1) < MaxBucketMag * width)
  }

  // ------------------------------------------------------ pattern matching

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Types the bucket arithmetic supports: the coarsening to double is
    * monotone for each (identity for doubles; long cast is identity,
    * widening, or second-truncation for the others), so bucketing
    * coarsens without reordering and the original predicate remains the
    * exact residual.
    */
  private def bucketable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | TimestampType | DoubleType |
         DateType => true
    case _ => false
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
    * `lStart < rEnd AND rStart < lEnd`, all four bounds of ONE
    * bucketable type. `(lStart, lEnd)` always names the LEFT side's pair
    * regardless of which conjunct came first. Point-in-interval
    * (`x >= lo AND x < hi`) never matches — its lower bound is
    * non-strict — so [[rangePair]] keeps priority.
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

  // ----------------------------------------------------- bucket arithmetic

  /** Monotone coarsening to double: identity for DoubleType (an ANSI
    * double→long Cast would THROW on NaN/∞ point values the residual
    * would simply reject; `Floor` on a raw double is silent and
    * monotone), the long-cast composition for the integral/timestamp
    * types (unchanged arithmetic — rewritten plans stay byte-identical
    * for them).
    */
  private def coarse(e: Expression): Expression = e.dataType match {
    case DoubleType => e
    case DateType => Cast(UnixDate(e), DoubleType) // epoch days
    case _ => Cast(Cast(e, LongType), DoubleType)
  }

  private def bucket(e: Expression, width: Double): Expression =
    Cast(Floor(Divide(coarse(e), Literal(width))), LongType)

  /** The last bucket an interval's explosion must cover: exact
    * `bucket(hi - 1)` for Long bounds; the inclusive `bucket(hi)` for
    * the other types (one possibly-extra bucket, filtered by the
    * residual — `hi - 1` is not expressible uniformly there).
    */
  private def endBucket(hi: Expression, width: Double): Expression =
    if (hi.dataType == LongType)
      bucket(Subtract(hi, Literal(1L)), width)
    else bucket(hi, width)

  private def rewrite(j: Join, cond: Expression, width: Double,
                      maxLvl: Int): LogicalPlan = {
    val Some((x, lo, hi, pointIsLeft)) = rangePair(j, cond)
    val (pointSide, intervalSide) =
      if (pointIsLeft) (j.left, j.right) else (j.right, j.left)

    if (maxLvl == 0) {
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
    } else {
      // multi-resolution (the operator form's skew bound, in Catalyst):
      // each interval computes its level from its own length and
      // explodes at that level's width (≤ Cap+1 buckets no matter how
      // long); points explode over levels 0..maxLvl and bucket at each;
      // the join adds (level, bucket) equality, a pair co-occurring
      // exactly once — at the interval's level, in the point's bucket
      val widths = levelWidths(width).take(maxLvl + 1)
      val lvls = widths.indices
      def bucketAt(e: Expression, lvl: Expression): Expression =
        CaseWhen(lvls.init.map(l =>
            (EqualTo(lvl, Literal(l)), bucket(e, widths(l)))),
          bucket(e, widths.last))
      def endBucketAt(e: Expression, lvl: Expression): Expression =
        CaseWhen(lvls.init.map(l =>
            (EqualTo(lvl, Literal(l)), endBucket(e, widths(l)))),
          endBucket(e, widths.last))

      val pLvlAttr = AttributeReference(LevelName,
        org.apache.spark.sql.types.IntegerType, nullable = false)()
      val pGen = Generate(
        Explode(CreateArray(lvls.map(l => Literal(l)))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(pLvlAttr), child = pointSide)
      val pBktAlias = Alias(bucketAt(x, pLvlAttr), BucketName)()
      val pointPlan = Project(
        pointSide.output ++ Seq(pLvlAttr, pBktAlias), pGen)

      val lenExpr = Subtract(coarse(hi), coarse(lo))
      val iLvlAlias = Alias(CaseWhen(lvls.init.map(l =>
          (LessThanOrEqual(lenExpr, Literal(Cap.toDouble * widths(l))),
            Literal(l))),
        Literal(lvls.last)), LevelName)()
      val leveled = Project(intervalSide.output :+ iLvlAlias,
        Filter(GreaterThan(hi, lo), intervalSide))
      val iLvl = iLvlAlias.toAttribute
      val gen = Explode(Sequence(bucketAt(lo, iLvl),
        endBucketAt(hi, iLvl), None, Some(conf.sessionLocalTimeZone)))
      val iBktAttr = AttributeReference(BucketName, LongType,
        nullable = false)()
      val intervalPlan = Generate(gen, unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(iBktAttr),
        child = leveled)

      val (newLeft, newRight) =
        if (pointIsLeft) (pointPlan, intervalPlan)
        else (intervalPlan, pointPlan)
      val newCond = And(And(cond, EqualTo(pLvlAttr, iLvl)),
        EqualTo(pBktAlias.toAttribute, iBktAttr))
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(newCond), JoinHint.NONE))
    }
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
  private def rewriteOverlap(j: Join, cond: Expression, width: Double,
      pat: (Expression, Expression, Expression, Expression)): LogicalPlan = {
    val (lS, lE, rS, rE) = pat
    def exploded(side: LogicalPlan, s: Expression, e: Expression) =
      explodedPlan(side, s, e, width)
    def pointBucket(side: LogicalPlan, s: Expression, e: Expression) =
      pointBucketPlan(side, s, e, width)
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
