package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Dense-vector kernels as NATIVE Catalyst expressions.
  *
  * The Column-level forms in [[VectorFunctions]] (`cosine`, `sqL2`,
  * `minhashJaccard`, `hyperplaneBit`) are built from `aggregate`/`zip_with`
  * higher-order functions — semantically exact, but HOFs are CodegenFallback
  * in Spark: each row pays an interpreted lambda walk plus a fresh zipped
  * array allocation, and `cosine` walks BOTH inputs three times (dot + two
  * norms). These expressions generate the fused Java loop directly inside
  * whole-stage codegen — same arithmetic, same accumulation ORDER (ascending
  * index left folds, exactly the lambda forms' order), so outputs are
  * bit-identical (FunctionsSpec pins expression == lambda on real vectors,
  * null/NaN/length-mismatch shapes included).
  *
  * Null/NaN contract (mirrors the HOF forms exactly):
  *  - any NULL input, any NULL element, or a length mismatch (zip_with pads
  *    with nulls → the fold is null) ⇒ NULL result for cosine/sqL2/dot;
  *  - Spark compares NaN LARGEST, so the lsh-bits sign test is
  *    `isNaN(dot) || dot >= 0` — not Java's `>=` alone;
  *  - minhashJaccard pads a length mismatch with 0-agreement positions and
  *    divides by size(a), exactly like `when(x === y, 1).otherwise(0)` over
  *    zip_with(a, b).
  */
object VectorExpressions {

  private def vectorTypeOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elemGetJava(arr: String, idx: String, et: DataType): String =
    et match {
      case DoubleType => s"$arr.getDouble($idx)"
      case FloatType  => s"(double) $arr.getFloat($idx)"
      case _ => throw new IllegalStateException(s"unsupported element type $et")
    }

  private def elemGet(arr: ArrayData, idx: Int, et: DataType): Double =
    et match {
      case DoubleType => arr.getDouble(idx)
      case FloatType  => arr.getFloat(idx).toDouble
      case _ => throw new IllegalStateException(s"unsupported element type $et")
    }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Shared shape for the fused two-array folds (cosine / sqL2 / dot):
    * null out on length mismatch or any null element, else one ascending
    * loop with the subclass's accumulator updates and finish step.
    */
  sealed abstract class FusedPairFold extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // can be NULL even on non-null children (length mismatch, null
    // element) — without this override, non-nullable inputs made codegen
    // emit an assignment to the FalseLiteral isNull slot, which fails
    // janino compilation ("not an rvalue") and silently degrades the
    // whole stage to the interpreted path
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (vectorTypeOk(left.dataType) && vectorTypeOk(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<double|float> columns, got " +
          s"(${left.dataType}, ${right.dataType})")

    /** Accumulator names (Java doubles, initialized 0.0). */
    protected def accs: Seq[String]
    /** Java statements updating the accumulators from `x`/`y`. */
    protected def updateJava(x: String, y: String, acc: Seq[String]): String
    protected def update(x: Double, y: Double, acc: Array[Double]): Unit
    /** Java expression producing the result from the accumulators. */
    protected def finishJava(acc: Seq[String]): String
    protected def finish(acc: Array[Double]): Double

    protected override def nullSafeEval(aAny: Any, bAny: Any): Any = {
      val a = aAny.asInstanceOf[ArrayData]
      val b = bAny.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      val (eta, etb) = (elemType(left), elemType(right))
      val acc = new Array[Double](accs.length)
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        update(elemGet(a, i, eta), elemGet(b, i, etb), acc)
        i += 1
      }
      finish(acc)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (eta, etb) = (elemType(left), elemType(right))
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val accNames = accs.map(ctx.freshName)
        val decls = accNames.map(v => s"double $v = 0.0;").mkString("\n")
        s"""
          |int $n = $a.numElements();
          |if ($b.numElements() != $n) { ${ev.isNull} = true; } else {
          |  $decls
          |  for (int $i = 0; $i < $n; $i++) {
          |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          |    double _x = ${elemGetJava(a, i, eta)};
          |    double _y = ${elemGetJava(b, i, etb)};
          |    ${updateJava("_x", "_y", accNames)}
          |  }
          |  if (!${ev.isNull}) { ${ev.value} = ${finishJava(accNames)}; }
          |}
          |""".stripMargin
      })
    }
  }

  /** `graft_cosine(a, b)` — dot / max(||a||·||b||, 1e-300), one fused pass.
    * Denominator mirrors `greatest(x, 1e-300)`: Java's Math.max propagates
    * NaN largest exactly like Spark's greatest.
    */
  final case class CosineExpr(left: Expression, right: Expression)
      extends FusedPairFold {
    override def prettyName: String = "graft_cosine"
    protected def accs: Seq[String] = Seq("dot", "na", "nb")
    protected def updateJava(x: String, y: String, acc: Seq[String]): String =
      s"""${acc(0)} += $x * $y; ${acc(1)} += $x * $x; ${acc(2)} += $y * $y;"""
    protected def update(x: Double, y: Double, acc: Array[Double]): Unit = {
      acc(0) += x * y; acc(1) += x * x; acc(2) += y * y
    }
    protected def finishJava(acc: Seq[String]): String =
      s"${acc(0)} / java.lang.Math.max(java.lang.Math.sqrt(${acc(1)}) * " +
        s"java.lang.Math.sqrt(${acc(2)}), 1e-300)"
    protected def finish(acc: Array[Double]): Double =
      acc(0) / math.max(math.sqrt(acc(1)) * math.sqrt(acc(2)), 1e-300)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineExpr =
      copy(left = newLeft, right = newRight)
  }

  /** `graft_sql2(a, b)` — squared L2 distance, ascending fold. */
  final case class SqL2Expr(left: Expression, right: Expression)
      extends FusedPairFold {
    override def prettyName: String = "graft_sql2"
    protected def accs: Seq[String] = Seq("s")
    protected def updateJava(x: String, y: String, acc: Seq[String]): String =
      s"double _t = $x - $y; ${acc(0)} += _t * _t;"
    protected def update(x: Double, y: Double, acc: Array[Double]): Unit = {
      val t = x - y; acc(0) += t * t
    }
    protected def finishJava(acc: Seq[String]): String = acc(0)
    protected def finish(acc: Array[Double]): Double = acc(0)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SqL2Expr =
      copy(left = newLeft, right = newRight)
  }

  /** `graft_dot(a, b)` — plain dot product, ascending fold. */
  final case class DotExpr(left: Expression, right: Expression)
      extends FusedPairFold {
    override def prettyName: String = "graft_dot"
    protected def accs: Seq[String] = Seq("dot")
    protected def updateJava(x: String, y: String, acc: Seq[String]): String =
      s"${acc(0)} += $x * $y;"
    protected def update(x: Double, y: Double, acc: Array[Double]): Unit =
      acc(0) += x * y
    protected def finishJava(acc: Seq[String]): String = acc(0)
    protected def finish(acc: Array[Double]): Double = acc(0)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotExpr =
      copy(left = newLeft, right = newRight)
  }

  /** `graft_minhash_jaccard(a, b)` over two array<long> signatures: the
    * fraction of agreeing positions. Mirrors the zip_with form on a length
    * mismatch: padded positions compare null === y → 0 agreement, the
    * denominator stays size(a); null elements likewise contribute 0. NULL
    * only when size(a) == 0 (the `when(size > 0, …)` guard).
    */
  final case class MinhashJaccardExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // NULL on an empty left signature even when children are non-nullable
    // (see FusedPairFold's nullable note)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_minhash_jaccard"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(a, _), ArrayType(b, _))
            if a == b && org.apache.spark.sql.catalyst.expressions
              .RowOrdering.isOrderable(a) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two arrays of one orderable element type, " +
            s"got $other")
      }
    private def et: DataType = left.dataType.asInstanceOf[ArrayType].elementType
    // EqualTo's semantics per element type (NaN == NaN is true, matching
    // the zip_with form's `x === y`)
    @transient private lazy val ord =
      org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(et)

    protected override def nullSafeEval(aAny: Any, bAny: Any): Any = {
      val a = aAny.asInstanceOf[ArrayData]
      val b = bAny.asInstanceOf[ArrayData]
      val na = a.numElements()
      if (na == 0) return null
      val nb = b.numElements()
      var agree = 0L
      var i = 0
      val lim = math.min(na, nb)
      while (i < lim) {
        if (!a.isNullAt(i) && !b.isNullAt(i) &&
            ord.equiv(a.get(i, et), b.get(i, et)))
          agree += 1L
        i += 1
      }
      agree.toDouble / na.toDouble
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val agree = ctx.freshName("agree")
        val i = ctx.freshName("i")
        val lim = ctx.freshName("lim")
        val xa = ctx.freshName("xa")
        val xb = ctx.freshName("xb")
        val jt = org.apache.spark.sql.catalyst.expressions.codegen
          .CodeGenerator.javaType(et)
        val getA = org.apache.spark.sql.catalyst.expressions.codegen
          .CodeGenerator.getValue(a, et, i)
        val getB = org.apache.spark.sql.catalyst.expressions.codegen
          .CodeGenerator.getValue(b, et, i)
        s"""
          |int $na = $a.numElements();
          |if ($na == 0) { ${ev.isNull} = true; } else {
          |  int $nb = $b.numElements();
          |  long $agree = 0L;
          |  int $lim = $na < $nb ? $na : $nb;
          |  for (int $i = 0; $i < $lim; $i++) {
          |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
          |      $jt $xa = $getA;
          |      $jt $xb = $getB;
          |      if (${ctx.genEqual(et, xa, xb)}) $agree++;
          |    }
          |  }
          |  ${ev.value} = (double) $agree / (double) $na;
          |}
          |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): MinhashJaccardExpr =
      copy(left = newLeft, right = newRight)
  }

  /** `graft_nearest_centroid(v)` — the winning centroid id of a driver-
    * resident centroid table, as ONE constant-size codegen kernel (the
    * [[PqExpressions.PqEncodeExpr]] pattern: the k×dim matrix rides as a
    * flat reference object, so codegen size is independent of k — a
    * `greatest(k structs)` expression tree would explode generated code
    * at IVF-scale k).
    *
    * Modes (both mirror the former join+argmax/array_sort forms exactly):
    *  - `cosineMode = true`: argMAX over round(cosine(v, c_i), 6), ties to
    *    the SMALLEST cid — `max(struct(round(cos, 6), -cid))` semantics,
    *    null score loses to any real score (struct-max orders null first).
    *  - `cosineMode = false`: argMIN over round(sqL2(v, c_i), 6), ties to
    *    the smallest cid — ascending `array_sort(struct(d2, cell))`
    *    semantics, where a null score WINS (nulls sort first ascending).
    * A NULL vector / length mismatch / null element nulls EVERY score
    * uniformly → the smallest cid wins in both modes (cids are required
    * ascending). Score comparison is Spark's double ordering
    * (SQLOrderingUtil: NaN largest, -0.0 == 0.0); rounding is Spark's
    * Round (HALF_UP via BigDecimal, NaN/Inf passed through). Never null.
    */
  final case class NearestCentroidExpr(child: Expression,
                                       cents: Seq[Seq[Double]],
                                       cids: Seq[Long],
                                       cosineMode: Boolean)
      extends UnaryExpression {
    require(cents.nonEmpty && cents.length == cids.length,
      "need one cid per centroid")
    require(cids.zip(cids.tail).forall { case (a, b) => a < b },
      "cids must be strictly ascending (the tie-break contract)")
    private val k = cents.length
    private val dim = cents.head.length
    require(cents.forall(_.length == dim), "ragged centroids")
    private lazy val flat: Array[Double] = {
      val a = new Array[Double](k * dim)
      var i = 0
      cents.foreach(_.foreach { d => a(i) = d; i += 1 })
      a
    }
    private lazy val cidArr: Array[Long] = cids.toArray

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_nearest_centroid"
    override def checkInputDataTypes(): TypeCheckResult =
      if (vectorTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double|float>, got ${child.dataType}")

    /** Spark Round(x, 6) for doubles: NaN/Inf pass through. */
    private def round6(x: Double): Double =
      if (x.isNaN || x.isInfinite) x
      else java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vAny = child.eval(input)
      val allNull = vAny == null || {
        val v = vAny.asInstanceOf[ArrayData]
        v.numElements() != dim ||
          (0 until dim).exists(v.isNullAt)
      }
      if (allNull) return cidArr(0)
      val v = vAny.asInstanceOf[ArrayData]
      val et = elemType(child)
      var best = 0
      var bestScore = 0.0
      var c = 0
      while (c < k) {
        var s = 0.0
        if (cosineMode) {
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < dim) {
            val x = elemGet(v, i, et); val y = flat(c * dim + i)
            dot += x * y; na += x * x; nb += y * y
            i += 1
          }
          s = round6(dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-300))
        } else {
          var d2 = 0.0
          var i = 0
          while (i < dim) {
            val t = elemGet(v, i, et) - flat(c * dim + i)
            d2 += t * t
            i += 1
          }
          s = round6(d2)
        }
        if (c == 0) bestScore = s
        else {
          val cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(s, bestScore)
          if (if (cosineMode) cmp > 0 else cmp < 0) {
            best = c; bestScore = s
          }
        }
        c += 1
      }
      cidArr(best)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val cMat = ctx.addReferenceObj("centroids", flat, "double[]")
      val cIds = ctx.addReferenceObj("centroidIds", cidArr, "long[]")
      val childGen = child.genCode(ctx)
      val v = childGen.value
      val et = elemType(child)
      val (allNull, c, i, s, best, bestScore, cmp) = (
        ctx.freshName("allNull"), ctx.freshName("c"), ctx.freshName("i"),
        ctx.freshName("s"), ctx.freshName("best"),
        ctx.freshName("bestScore"), ctx.freshName("cmp"))
      val scoreCode =
        if (cosineMode)
          s"""double _dot = 0.0, _na = 0.0, _nb = 0.0;
             |for (int $i = 0; $i < $dim; $i++) {
             |  double _x = ${elemGetJava(v, i, et)};
             |  double _y = $cMat[$c * $dim + $i];
             |  _dot += _x * _y; _na += _x * _x; _nb += _y * _y;
             |}
             |double $s = _dot / java.lang.Math.max(
             |  java.lang.Math.sqrt(_na) * java.lang.Math.sqrt(_nb), 1e-300);
             |""".stripMargin
        else
          s"""double _d2 = 0.0;
             |for (int $i = 0; $i < $dim; $i++) {
             |  double _t = ${elemGetJava(v, i, et)} - $cMat[$c * $dim + $i];
             |  _d2 += _t * _t;
             |}
             |double $s = _d2;
             |""".stripMargin
      val betterCond = if (cosineMode) s"$cmp > 0" else s"$cmp < 0"
      val body =
        s"""
          |boolean $allNull = ${childGen.isNull};
          |if (!$allNull) {
          |  $allNull = $v.numElements() != $dim;
          |  if (!$allNull) {
          |    for (int $i = 0; $i < $dim; $i++) {
          |      if ($v.isNullAt($i)) { $allNull = true; break; }
          |    }
          |  }
          |}
          |long ${ev.value};
          |if ($allNull) { ${ev.value} = $cIds[0]; } else {
          |  int $best = 0;
          |  double $bestScore = 0.0;
          |  for (int $c = 0; $c < $k; $c++) {
          |    $scoreCode
          |    if (!(Double.isNaN($s) || Double.isInfinite($s))) {
          |      $s = java.math.BigDecimal.valueOf($s)
          |        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
          |    }
          |    if ($c == 0) { $bestScore = $s; } else {
          |      int $cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          |        .compareDoubles($s, $bestScore);
          |      if ($betterCond) { $best = $c; $bestScore = $s; }
          |    }
          |  }
          |  ${ev.value} = $cIds[$best];
          |}
          |""".stripMargin
      ev.copy(code = childGen.code + code"$body", isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
      copy(child = newChild)
  }

  /** `graft_lsh_bits(v)` — the `nBits` sign bits of ⟨v, h_{start+j}⟩ as a
    * '0'/'1' string, planes ascending, each dot an ascending fold over the
    * splitmix64 hyperplane family ([[VectorFunctions.hyperplane]]).
    *
    * Mirrors `concat(when(hyperplaneBit(v, j, dim) === 1, "1").otherwise
    * ("0"))` exactly: a NULL vector or NULL element makes that plane's dot
    * NULL → the when-chain lands in otherwise ⇒ '0' (so a NULL vector is
    * the all-zeros bucket, never NULL — `nullable = false`); Spark orders
    * NaN LARGEST, so a NaN dot is ≥ 0 ⇒ '1'.
    */
  final case class LshBitsExpr(child: Expression, startPlane: Int,
                               nBits: Int, dim: Int)
      extends UnaryExpression {
    // one flat [bit][component] plane table baked into the expression
    private lazy val flat: Array[Double] = {
      val a = new Array[Double](nBits * dim)
      var j = 0
      while (j < nBits) {
        val h = VectorFunctions.hyperplane(startPlane + j, dim)
        var d = 0
        while (d < dim) { a(j * dim + d) = h(d); d += 1 }
        j += 1
      }
      a
    }
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_lsh_bits"
    override def checkInputDataTypes(): TypeCheckResult =
      if (vectorTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double|float>, got ${child.dataType}")

    private def zeros: UTF8String = UTF8String.fromString("0" * nBits)

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vAny = child.eval(input)
      if (vAny == null) return zeros
      val v = vAny.asInstanceOf[ArrayData]
      val et = elemType(child)
      val n = math.min(v.numElements(), dim)
      val out = new Array[Byte](nBits)
      var j = 0
      while (j < nBits) {
        var dot = 0.0
        var nulled = false
        var d = 0
        while (d < n && !nulled) {
          if (v.isNullAt(d)) nulled = true
          else dot += elemGet(v, d, et) * flat(j * dim + d)
          d += 1
        }
        // zip_with pads a SHORT vector with nulls → product null → fold
        // null → '0'; a LONG vector's extra elements zip against null
        // planes → same. NaN sorts largest in Spark ⇒ NaN >= 0 is true.
        val one = !nulled && v.numElements() == dim &&
          (dot.isNaN || dot >= 0.0)
        out(j) = if (one) '1' else '0'
        j += 1
      }
      UTF8String.fromBytes(out)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val planes = ctx.addReferenceObj("lshPlanes", flat, "double[]")
      val childGen = child.genCode(ctx)
      val v = childGen.value
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nulled = ctx.freshName("nulled")
      val one = ctx.freshName("one")
      val et = elemType(child)
      val body =
        s"""
          |byte[] $out = new byte[$nBits];
          |if (${childGen.isNull}) {
          |  java.util.Arrays.fill($out, (byte) '0');
          |} else {
          |  int $n = java.lang.Math.min($v.numElements(), $dim);
          |  for (int $j = 0; $j < $nBits; $j++) {
          |    double $dot = 0.0;
          |    boolean $nulled = false;
          |    for (int $d = 0; $d < $n && !$nulled; $d++) {
          |      if ($v.isNullAt($d)) { $nulled = true; }
          |      else { $dot += ${elemGetJava(v, d, et)} * $planes[$j * $dim + $d]; }
          |    }
          |    boolean $one = !$nulled && $v.numElements() == $dim &&
          |      (Double.isNaN($dot) || $dot >= 0.0);
          |    $out[$j] = $one ? (byte) '1' : (byte) '0';
          |  }
          |}
          |UTF8String ${ev.value} = UTF8String.fromBytes($out);
          |""".stripMargin
      ev.copy(code = childGen.code + code"$body", isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): LshBitsExpr =
      copy(child = newChild)
  }
}
