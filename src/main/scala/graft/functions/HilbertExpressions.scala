package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index as a NATIVE Catalyst expression.
  *
  * The Morton (Z-order) interleave in [[graft.operators.Layout.zValueN]]
  * is a flat shift/mask Column tree; the Hilbert transform is NOT — each
  * bit level REWRITES the remaining coordinate bits (reflect + swap), so
  * a Column formulation would reference the previous level's (x, y) four
  * times per level and the expression tree would grow 4^bits nodes. The
  * loop belongs in one generated/JIT'd function: [[Hilbert2Expr]] wraps
  * the classic xy→d walk (the public-domain formulation popularized by
  * Warren's Hacker's Delight and the Wikipedia Hilbert-curve article) as
  * a static call shared VERBATIM by interpreted eval and codegen — the
  * two paths cannot diverge.
  *
  * Why offer it at all, when Z-order already prunes: consecutive Hilbert
  * cells are always GRID-NEIGHBORS (unit step — proven by the adjacency
  * property test over every consecutive pair at 5 bits), while the Z
  * curve takes a long diagonal jump every 2^k cells. Equal-size file
  * ranges cut from the Hilbert walk therefore have tighter bounding
  * boxes on average, which is exactly what footer-box skipping prunes
  * with — the reason lakehouse engines cluster by Hilbert when they can
  * (Delta OPTIMIZE's curve, BigQuery/Snowflake clustering literature).
  * Measured here by LayoutSpec: over a battery of square boxes the
  * Hilbert layout opens no more files in total than the Morton layout on
  * the same data, files, and bits.
  *
  * Inputs are QUANTIZED cells (see [[graft.operators.Layout.quantize]]),
  * clamped defensively into [0, 2^bits); `bits` is a plan-time literal
  * (it parameterizes the transform, it is not row data). 2·bits ≤ 62
  * keeps d in a signed long.
  */
object HilbertExpressions {

  /** (x, y) cell → distance along the order-`bits` Hilbert curve.
    * Static + branch-only so both eval paths JIT to the same loop.
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1
    var x = math.min(math.max(x0, 0L), mask)
    var y = math.min(math.max(y0, 0L), mask)
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the sub-quadrant so the walk stays continuous
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (distance → cell) — the spec's round-trip anchor. */
  def d2xy(bits: Int, d0: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** n-D Hilbert index via Skilling's transpose algorithm (Programming
    * the Hilbert curve, AIP Conf. Proc. 707, 2004 — public domain): the
    * coordinates are walked MSB→LSB undoing the per-level rotations,
    * Gray-decoded across axes, then bit-interleaved into the index.
    * Unit-step adjacency and bijectivity are pinned by the spec at
    * n = 2..4, and the n = 2 instance is proven CELL-FOR-CELL EQUAL to
    * the classic [[xy2d]] walk (PropertiesSpec) — one curve family, so
    * a 2-D store reads identically no matter which code path indexed
    * it; the 2-D path keeps xy2d only because it codegens to a tighter
    * loop.
    */
  def axesToIndex(bits: Int, x0: Array[Long]): Long = {
    val n = x0.length
    val x = new Array[Long](n)
    val mask = (1L << bits) - 1
    var i = 0
    while (i < n) {
      x(i) = math.min(math.max(x0(i), 0L), mask); i += 1
    }
    // inverse undo of the per-level rotations (Skilling AxestoTranspose)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray decode across axes
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transpose: bit b of axis i lands at b·n + (n−1−i)
    var d = 0L
    var b = 0
    while (b < bits) {
      i = 0
      while (i < n) {
        d |= ((x(i) >> b) & 1L) << (b * n + (n - 1 - i))
        i += 1
      }
      b += 1
    }
    d
  }

  /** Inverse of [[axesToIndex]] (Skilling TransposetoAxes) — the spec's
    * independent round-trip anchor.
    */
  def indexToAxes(bits: Int, n: Int, d: Long): Array[Long] = {
    val x = new Array[Long](n)
    var b = 0
    while (b < bits) {
      var i = 0
      while (i < n) {
        x(i) |= ((d >> (b * n + (n - 1 - i))) & 1L) << b
        i += 1
      }
      b += 1
    }
    // Gray encode back
    var t = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    // redo the per-level rotations
    var q = 2L
    while (q != (1L << bits)) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val tt = (x(0) ^ x(i)) & p; x(0) ^= tt; x(i) ^= tt }
        i -= 1
      }
      q <<= 1
    }
    x
  }

  /** `graft_hilbertn(x1, …, xn)` with a literal bit width: long Hilbert
    * index of n quantized cells (Skilling variant). CodegenFallback by
    * choice: the n-D index is computed once per row in a one-time
    * layout WRITE pass (never in a query hot loop — reads prune on the
    * stats table), and the 2-D hot-path expression keeps full codegen.
    */
  final case class HilbertNExpr(children: Seq[Expression], bits: Int)
      extends Expression
      with org.apache.spark.sql.catalyst.expressions.codegen
        .CodegenFallback {
    require(children.size >= 2, "graft_hilbertn needs at least 2 cells")
    require(bits >= 1 && children.size * bits <= 62,
      s"graft_hilbertn: ${children.size} axes at $bits bits overflow a " +
        "signed long")

    override def nullable: Boolean = children.exists(_.nullable)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hilbertn"
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == LongType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "graft_hilbertn expects bigint quantized cells, got (" +
          children.map(_.dataType.simpleString).mkString(", ") + ")")

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val arr = new Array[Long](children.size)
      var i = 0
      while (i < children.size) {
        val v = children(i).eval(input)
        if (v == null) return null
        arr(i) = v.asInstanceOf[Long]
        i += 1
      }
      axesToIndex(bits, arr)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): HilbertNExpr =
      copy(children = newChildren)
  }

  /** `graft_hilbert2(x, y)` with a literal bit width: long Hilbert index
    * of two quantized cells.
    */
  final case class Hilbert2Expr(left: Expression, right: Expression,
                                bits: Int)
      extends BinaryExpression {
    require(bits >= 1 && 2 * bits <= 62,
      s"graft_hilbert2: bits=$bits out of range (1..31)")

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert2 expects (bigint, bigint) quantized cells, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hilbert2"

    protected override def nullSafeEval(x: Any, y: Any): Any =
      xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (x, y) =>
        s"graft.functions.HilbertExpressions.xy2d($bits, $x, $y)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Hilbert2Expr =
      copy(left = newLeft, right = newRight)
  }
}
