package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Bpe, HilbertExpressions, NfcNormalize, PqExpressions}

/** Session extensions registering graft's native Catalyst expressions —
  * the public extension point (`spark.sql.extensions=graft.plans
  * .GraftExtensions` or `.withExtensions(new GraftExtensions)`), after
  * which the functions resolve in SQL and via `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // planner rewrites: declarative point-in-interval joins → the
    // bucketized equi-join (RangeJoinRewriteRule, auto bucket width);
    // asof_backward/asof_forward-marked joins → the union-and-window
    // as-of plan (AsofJoinRewriteRule)
    ext.injectOptimizerRule(_ => RangeJoinRewriteRule)
    ext.injectOptimizerRule(_ => AsofJoinRewriteRule)
    // graft-zorder scans upgrade to native parquet over the pruned file
    // list (ZOrderPruneRule) — vectorized read + codegen, no DSv1 row
    // conversion; the DSv1 relation remains the no-extensions fallback
    ext.injectOptimizerRule(_ => ZOrderPruneRule)
    // asof_<mode>(lts, rts[, tolerance]): the optional third argument is
    // a literal gap bound, baked into the marker (it parameterizes the
    // REWRITE, it is not row data). Accepted shapes: any numeric literal
    // — fractional included (0.5 = half a unit of the ts axis: seconds
    // for timestamps, the column's own unit for numeric axes) — and
    // `INTERVAL` day-time syntax for timestamp axes (evaluates to
    // microseconds; carried as fractional seconds).
    for (mode <- AsofJoinMarker.Modes.toSeq.sorted)
      ext.injectFunction((
        new FunctionIdentifier(s"asof_$mode"),
        new ExpressionInfo(classOf[AsofJoinMarker].getName, s"asof_$mode"),
        (children: Seq[Expression]) => {
          require(children.size == 2 || children.size == 3,
            s"asof_$mode takes (leftTs, rightTs[, tolerance])")
          val tol = children.drop(2).headOption.map { t =>
            require(t.foldable, s"asof_$mode tolerance must be a literal")
            (t.dataType, t.eval()) match {
              case (_: org.apache.spark.sql.types.DayTimeIntervalType,
                    micros: Long) => micros.toDouble / 1e6
              case (d, n: Number)
                  if d.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
                n.doubleValue()
              // SQL `0.5` parses as a DECIMAL literal, not a Double
              case (_, d: org.apache.spark.sql.types.Decimal) => d.toDouble
              case (_, other) => throw new IllegalArgumentException(
                s"asof_$mode tolerance must be a numeric or day-time " +
                  s"INTERVAL literal, got $other")
            }
          }
          AsofJoinMarker(children(0), children(1), mode, tol)
        }))
    // interval_overlap(aStart, aEnd, bStart, bEnd): width-free
    // declarative overlap join — the marker states the intent the raw
    // two-strict-inequalities shape can't, so the bucketized rewrite
    // fires with NO conf set (RangeJoinRewriteRule.markedOverlap)
    ext.injectFunction((
      new FunctionIdentifier("interval_overlap"),
      new ExpressionInfo(classOf[IntervalOverlapMarker].getName,
        "interval_overlap"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "interval_overlap takes (aStart, aEnd, bStart, bEnd)")
        IntervalOverlapMarker(children(0), children(1), children(2),
          children(3))
      }))
    // graft_hilbert2(x, y, bits): Hilbert index of two quantized cells —
    // bits is a plan-time literal baked into the expression (it
    // parameterizes the transform, it is not row data)
    ext.injectFunction((
      new FunctionIdentifier("graft_hilbert2"),
      new ExpressionInfo(
        classOf[HilbertExpressions.Hilbert2Expr].getName, "graft_hilbert2"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_hilbert2 takes (x, y, bits)")
        val b = children(2)
        require(b.foldable, "graft_hilbert2 bits must be a literal")
        val bv = b.eval()
        require(bv != null,
          "graft_hilbert2 bits must be a non-null integer literal")
        HilbertExpressions.Hilbert2Expr(children(0), children(1),
          bv.asInstanceOf[Number].intValue())
      }))
    // graft_hilbertn(x1, …, xn, bits): Skilling n-D Hilbert index — the
    // layout write path for 3+ clustered columns (CodegenFallback by
    // choice: a one-time write pass, never a query hot loop)
    ext.injectFunction((
      new FunctionIdentifier("graft_hilbertn"),
      new ExpressionInfo(
        classOf[HilbertExpressions.HilbertNExpr].getName, "graft_hilbertn"),
      (children: Seq[Expression]) => {
        require(children.size >= 3,
          "graft_hilbertn takes (x1, ..., xn, bits) with n >= 2")
        val b = children.last
        require(b.foldable, "graft_hilbertn bits must be a literal")
        val bv = b.eval()
        require(bv != null,
          "graft_hilbertn bits must be a non-null integer literal")
        HilbertExpressions.HilbertNExpr(children.dropRight(1),
          bv.asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    // PQ kernels: the codebooks ride in as a foldable literal (last arg)
    // and are baked into the expression as a flat reference object, NOT
    // kept as a per-row child
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqExpressions.PqEncodeExpr].getName,
        "graft_pq_encode"),
      (children: Seq[Expression]) => PqExpressions.PqEncodeExpr(
        children.head, PqExpressions.codebooksFromLiteral(children(1)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_adc_dist"),
      new ExpressionInfo(classOf[PqExpressions.AdcDistExpr].getName,
        "graft_adc_dist"),
      (children: Seq[Expression]) => PqExpressions.AdcDistExpr(
        children(0), children(1),
        PqExpressions.codebooksFromLiteral(children(2)))))
    // BPE kernels: the learned merge table rides in as a foldable
    // array<array<string>> literal, baked into a rank-map kernel object
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_pieces"),
      new ExpressionInfo(classOf[Bpe.BpePiecesExpr].getName,
        "graft_bpe_pieces"),
      (children: Seq[Expression]) => Bpe.BpePiecesExpr(
        children.head, Bpe.mergesFromLiteral(children(1)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[Bpe.BpeCountExpr].getName,
        "graft_bpe_count"),
      (children: Seq[Expression]) => Bpe.BpeCountExpr(
        children.head, Bpe.mergesFromLiteral(children(1)))))
  }
}
