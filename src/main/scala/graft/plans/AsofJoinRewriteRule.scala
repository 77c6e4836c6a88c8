package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanExec
import org.apache.spark.sql.types.{BooleanType, DataType, NumericType, TimestampType}

/** Declarative as-of join: the marker predicate a user states in a plain
  * join condition —
  * {{{
  *   purchases.join(clicks,
  *     purchases("user_id") === clicks("user_id") &&
  *       expr("asof_backward(p_sec, c_sec)"), "left_outer")
  * }}}
  * — mirroring warehouse `ASOF JOIN` syntax (DuckDB: `ASOF LEFT JOIN ON
  * l.k = r.k AND l.ts >= r.ts`). `asof_backward(lts, rts)` selects, per
  * left row, THE single right row with the greatest `rts <= lts` under
  * the equi keys; `asof_forward` the smallest `rts >= lts`;
  * `asof_nearest` whichever of the two has the smaller |gap|, ties
  * going backward. The marker
  * is [[Unevaluable]] on purpose: it has no row-at-a-time meaning (it
  * quantifies over the whole right side), so if the rewrite doesn't
  * recognize the join shape the query fails loudly instead of silently
  * computing something else.
  */
case class AsofJoinMarker(leftTs: Expression, rightTs: Expression,
                          mode: String, tolerance: Option[Double] = None)
    extends BinaryExpression with Unevaluable {
  require(AsofJoinMarker.Modes.contains(mode), s"unknown as-of mode $mode")
  require(tolerance.forall(t => t >= 0 && !t.isNaN && !t.isInfinite),
    s"as-of tolerance must be finite and non-negative, got $tolerance")
  override def left: Expression = leftTs
  override def right: Expression = rightTs
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = s"asof_$mode"
  override def checkInputDataTypes(): TypeCheckResult =
    if (leftTs.dataType == rightTs.dataType &&
        (leftTs.dataType.isInstanceOf[NumericType] ||
          leftTs.dataType == TimestampType ||
          leftTs.dataType == org.apache.spark.sql.types.TimestampNTZType ||
          leftTs.dataType == org.apache.spark.sql.types.DateType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two timestamps of one numeric/timestamp/date " +
        s"type, got ${leftTs.dataType.sql} and ${rightTs.dataType.sql}")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsofJoinMarker =
    copy(leftTs = newLeft, rightTs = newRight)
}

object AsofJoinMarker {
  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"
  val Modes: Set[String] = Set(Backward, Forward, Nearest)
}

/** Rewrites a marked join into the union-and-window as-of plan
  * [[graft.operators.RangeJoin.asofBackward]] computes — ONE shuffle of
  * |L|+|R| rows by the equi keys, no join operator at all — so the
  * declarative statement gets the same scale shape as the operator form
  * (PlanSpec pins the served plan join-free).
  *
  * Fires on INNER and LEFT OUTER joins whose condition is exactly
  * attribute equi pairs plus one marker, with the marker's first
  * argument from the left (probe) side. The replacement is constructed
  * with the DataFrame API over the join's child plans (every column
  * renamed to a positional temp name first, so duplicate names across
  * sides can't ambiguate), then re-projected onto the ORIGINAL output
  * attribute ids — the surrounding plan is untouched. Right rows with a
  * NULL ts are dropped (they can match nothing and must not donate
  * payload); as with the operator form, the right side should be unique
  * per (keys, ts) or "the" matched row is engine-dependent.
  *
  * Scale note: a KEYLESS marker join (no equi conjunct) is legal but
  * sorts both sides in ONE window partition — same as the operator form
  * called with no keys. At scale, state an equi key (as-of without one
  * rarely makes sense anyway: it matches every left row against one
  * global right timeline).
  */
object AsofJoinRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, jt, Some(cond), _)
        if j.resolved && (jt == Inner || jt == LeftOuter) &&
          cond.find(_.isInstanceOf[AsofJoinMarker]).isDefined =>
      tryRewrite(j, jt, cond).getOrElse(j)
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(a, b) => split(a) ++ split(b)
    case other => Seq(other)
  }

  private def tryRewrite(j: Join, jt: JoinType,
                         cond: Expression): Option[LogicalPlan] = {
    val conjs = split(cond)
    val markers = conjs.collect { case m: AsofJoinMarker => m }
    if (markers.size != 1) return None
    val m = markers.head
    val lSet = j.left.outputSet
    val rSet = j.right.outputSet
    val (lts, rts) = (m.leftTs, m.rightTs) match {
      case (a: Attribute, b: Attribute)
          if lSet.contains(a) && rSet.contains(b) => (a, b)
      case _ => return None
    }
    val others = conjs.filterNot(_.isInstanceOf[AsofJoinMarker])
    val equiPairs = others.map {
      case EqualTo(a: Attribute, b: Attribute)
          if lSet.contains(a) && rSet.contains(b) => (a, b)
      case EqualTo(b: Attribute, a: Attribute)
          if lSet.contains(a) && rSet.contains(b) => (a, b)
      case _ => return None
    }
    Some(build(j, jt, m.mode, m.tolerance, lts, rts, equiPairs))
  }

  private def build(j: Join, jt: JoinType, asofMode: String,
                    tolerance: Option[Double],
                    lts: Attribute, rts: Attribute,
                    equiPairs: Seq[(Attribute, Attribute)]): LogicalPlan = {
    // a fractional tolerance on DateType cannot mean anything (days are
    // the grain); fail at planning, not with a silently-floored bound
    require(tolerance.forall(_.isWhole) ||
        lts.dataType != org.apache.spark.sql.types.DateType,
      "as-of tolerance on DATE timestamps must be a whole number of days")
    val lOut = j.left.output
    val rOut = j.right.output
    val lNames = lOut.indices.map(i => s"_gla_$i")
    val rNames = rOut.indices.map(i => s"_gra_$i")
    val l2 = PlanExec.df(j.left).toDF(lNames: _*)
    val r2 = PlanExec.df(j.right).toDF(rNames: _*)
    def lName(a: Attribute) = lNames(lOut.indexWhere(_.exprId == a.exprId))
    def rName(a: Attribute) = rNames(rOut.indexWhere(_.exprId == a.exprId))

    // left rows sort AFTER right rows at equal ts for backward/nearest
    // (a same-instant right row is a zero-gap backward match), BEFORE
    // them for forward — the operator form's exact conventions
    val forward = asofMode == AsofJoinMarker.Forward
    val (lSide, rSide) = if (forward) (0, 1) else (1, 0)
    val lU = equiPairs.zipWithIndex.foldLeft(
        l2.withColumn("_ats", col(lName(lts)))
          .withColumn("_aside", lit(lSide))) {
      case (df, ((la, _), i)) => df.withColumn(s"_ak$i", col(lName(la)))
    }
    // right rows with a NULL ts or a NULL equi key are dropped up front:
    // SQL equality never matches a NULL key, and the window PARTITION
    // groups NULLs together — an undropped NULL-key right row would
    // donate payload to a NULL-key left row the declared join cannot
    // match (RangeJoin.matchableRight's convention)
    val rBase = equiPairs.foldLeft(r2.filter(col(rName(rts)).isNotNull)) {
      case (df, (_, ra)) => df.filter(col(rName(ra)).isNotNull)
    }
    val rU = equiPairs.zipWithIndex.foldLeft(
        rBase
          .withColumn("_ats", col(rName(rts)))
          .withColumn("_aside", lit(rSide))) {
      case (df, ((_, ra), i)) => df.withColumn(s"_ak$i", col(rName(ra)))
    }
    // one struct per right row: ts + payload travel together (the as-of
    // row is carried WHOLE — see RangeJoin.asofBackward)
    val u = lU.unionByName(rU, allowMissingColumns = true)
      .withColumn("_apack", when(col("_aside") === rSide,
        struct(rNames.map(col): _*)))
    val w0 = Window
      .partitionBy(equiPairs.indices.map(i => col(s"_ak$i")): _*)
      .orderBy(col("_ats"), col("_aside"))
    val wB = w0.rowsBetween(Window.unboundedPreceding, 0)
    val wF = w0.rowsBetween(0, Window.unboundedFollowing)
    // tolerance comparison, by axis type — ONE rule for every tolerance
    // grain, so the bound is MONOTONE in t (a floored epoch-second gap
    // for whole tolerances would admit true gaps up to ~2·t while a
    // fractional t compares exactly, so raising 1.0 → 1.5 could REMOVE
    // matches):
    //  - timestamp axes compare EXACT epoch microseconds
    //    (RangeJoin.tolGap's `unix_micros` path, no double rounding)
    //    against `round(t·10⁶)` µs, whole and fractional alike;
    //  - date axes compare whole days (fractional validated away
    //    earlier);
    //  - numeric axes compare the raw difference (the reference's
    //    double-second delays — sub-second tolerance exact by
    //    construction)
    def tolOk(later: org.apache.spark.sql.Column,
              earlier: org.apache.spark.sql.Column, t: Double)
        : org.apache.spark.sql.Column = lts.dataType match {
      case TimestampType | org.apache.spark.sql.types.TimestampNTZType =>
        graft.operators.RangeJoin.tolGap(later, earlier, lts.dataType) <=
          math.round(t * 1e6)
      case org.apache.spark.sql.types.DateType =>
        graft.operators.RangeJoin.tolGap(later, earlier, lts.dataType) <=
          t.toLong
      case _ => later - earlier <= lit(t)
    }
    val withMatch = asofMode match {
      case AsofJoinMarker.Nearest =>
        // both arms as frames over the SAME sort; smaller gap wins,
        // ties go backward; `tolerance` bounds each arm's gap
        // independently (RangeJoin.asofNearest's conventions)
        val armed = u
          .withColumn("_abp", last(col("_apack"), ignoreNulls = true).over(wB))
          .withColumn("_afp", first(col("_apack"), ignoreNulls = true).over(wF))
          .filter(col("_aside") === lSide)
        val bTs = col("_abp").getField(rName(rts))
        val fTs = col("_afp").getField(rName(rts))
        val gapB = col("_ats") - bTs
        val gapF = fTs - col("_ats")
        val bOk = bTs.isNotNull &&
          tolerance.map(t => tolOk(col("_ats"), bTs, t)).getOrElse(lit(true))
        val fOk = fTs.isNotNull &&
          tolerance.map(t => tolOk(fTs, col("_ats"), t)).getOrElse(lit(true))
        val useB = bOk && (!fOk || gapB <= gapF)
        armed.withColumn("_am",
          when(useB, col("_abp")).when(fOk, col("_afp")))
          .drop("_abp", "_afp")
      case _ =>
        val carried =
          if (forward) first(col("_apack"), ignoreNulls = true).over(wF)
          else last(col("_apack"), ignoreNulls = true).over(wB)
        val leftRows = u.withColumn("_am", carried)
          .filter(col("_aside") === lSide)
        // out-of-tolerance matches null out WHOLE (the packed row, so
        // every payload column and the ts null together)
        tolerance match {
          case Some(t) =>
            val mTs = col("_am").getField(rName(rts))
            val ok = if (forward) tolOk(mTs, col("_ats"), t)
                     else tolOk(col("_ats"), mTs, t)
            leftRows.withColumn("_am", when(ok, col("_am")))
          case None => leftRows
        }
    }
    // a left row with NULL ts matches nothing in ANY mode (no SQL
    // comparison against NULL holds) — without this guard it sorts
    // NULLS FIRST, where forward/nearest's FOLLOWING frame would hand
    // it the earliest right row
    val guarded = withMatch.withColumn("_am",
      when(col("_ats").isNotNull, col("_am")))
    val matched =
      if (jt == Inner) guarded.filter(col("_am").isNotNull) else guarded
    val out = matched.select(lNames.map(col) ++
      rNames.map(n => col("_am").getField(n).as(n)): _*)

    // re-project onto the original join output attribute ids so the
    // surrounding plan's references keep resolving
    val ap = out.queryExecution.analyzed
    val byName = ap.output.map(a => a.name -> a).toMap
    val projList = (lOut.zip(lNames) ++ rOut.zip(rNames)).map {
      case (o, n) => Alias(byName(n), o.name)(exprId = o.exprId)
    }
    Project(projList, ap)
  }
}
