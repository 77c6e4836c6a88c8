package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels as NATIVE Catalyst expressions.
  *
  * The Column-level PQ implementation (`Similarity.pqCodes` / `adcDist`)
  * builds m·k·sub-deep `aggregate`/`transform` lambda trees per row —
  * semantically exact but interpreted as a chain of HOF evaluations. These
  * expressions generate the three nested Java loops directly inside
  * whole-stage codegen (the `NfcNormalize` extension route), with the
  * codebooks flattened into one `double[]` reference object — same
  * arithmetic, same operation ORDER, so encoded codes and ADC distances
  * are bit-identical to the lambda forms (oracle hashes must not move;
  * FunctionsSpec pins expression == lambda on real vectors).
  *
  * Fold-order contract (must match the lambda implementation exactly):
  * sub-distances accumulate ascending i; the winning code is the FIRST
  * minimum scanning k ascending (strict <); ADC totals accumulate one
  * completed sub-space subtotal at a time, ascending m. Float inputs are
  * widened per element exactly where the lambda form casts them.
  */
object PqExpressions {

  /** Flatten a (m × k × sub) codebook literal into one double[] plus its
    * shape; layout [(m·k + k')·sub + i].
    */
  private[graft] def flatten(cb: Seq[Seq[Seq[Double]]]): (Array[Double], Int, Int, Int) = {
    val m = cb.length
    val k = cb.head.length
    val sub = cb.head.head.length
    require(cb.forall(b => b.length == k && b.forall(_.length == sub)),
      "ragged codebooks")
    val flat = new Array[Double](m * k * sub)
    var idx = 0
    cb.foreach(_.foreach(_.foreach { d => flat(idx) = d; idx += 1 }))
    (flat, m, k, sub)
  }

  /** Rebuild the Scala codebooks from a foldable array<array<array<double>>>
    * expression (the `typedLit` the Column wrappers pass).
    */
  private[graft] def codebooksFromLiteral(e: Expression): Seq[Seq[Seq[Double]]] = {
    require(e.foldable, s"PQ codebooks must be a literal, got $e")
    val ad = e.eval().asInstanceOf[ArrayData]
    (0 until ad.numElements()).map { m =>
      val book = ad.getArray(m)
      (0 until book.numElements()).map { k =>
        book.getArray(k).toDoubleArray().toSeq
      }
    }
  }

  /** Per-element read returning double, widening floats exactly like the
    * lambda form's element-wise cast.
    */
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

  private def vectorTypeOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  /** `graft_pq_encode(v)` → array<int> of `m` codes: nearest sub-space
    * centroid per contiguous sub-space, first-minimum ties.
    */
  final case class PqEncodeExpr(child: Expression,
                                codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    private lazy val (flat, m, k, sub) = flatten(codebooks)

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_pq_encode"
    override def checkInputDataTypes(): TypeCheckResult =
      if (vectorTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode expects array<double|float>, got ${child.dataType}")
    private def elementType: DataType =
      child.dataType.asInstanceOf[ArrayType].elementType

    protected override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val et = elementType
      val codes = new Array[Int](m)
      var mi = 0
      while (mi < m) {
        var best = Double.PositiveInfinity; var bi = 0
        var ki = 0
        while (ki < k) {
          var s = 0.0
          val base = (mi * k + ki) * sub
          var i = 0
          while (i < sub) {
            val t = elemGet(v, mi * sub + i, et) - flat(base + i)
            s += t * t
            i += 1
          }
          if (s < best) { best = s; bi = ki }
          ki += 1
        }
        codes(mi) = bi
        mi += 1
      }
      new GenericArrayData(codes)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
      nullSafeCodeGen(ctx, ev, c => {
        val codes = ctx.freshName("codes")
        val mi = ctx.freshName("mi")
        val ki = ctx.freshName("ki")
        val i = ctx.freshName("i")
        val best = ctx.freshName("best")
        val bi = ctx.freshName("bi")
        val s = ctx.freshName("s")
        val base = ctx.freshName("base")
        val t = ctx.freshName("t")
        s"""
          |int[] $codes = new int[$m];
          |for (int $mi = 0; $mi < $m; $mi++) {
          |  double $best = Double.POSITIVE_INFINITY; int $bi = 0;
          |  for (int $ki = 0; $ki < $k; $ki++) {
          |    double $s = 0.0;
          |    int $base = ($mi * $k + $ki) * $sub;
          |    for (int $i = 0; $i < $sub; $i++) {
          |      double $t = ${elemGetJava(c, s"$mi * $sub + $i", elementType)}
          |        - $cbRef[$base + $i];
          |      $s += $t * $t;
          |    }
          |    if ($s < $best) { $best = $s; $bi = $ki; }
          |  }
          |  $codes[$mi] = $bi;
          |}
          |${ev.value} =
          |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
          |""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
      copy(child = newChild)
  }

  /** `graft_adc_dist(codes, qv)` → double: asymmetric squared-L2 between a
    * full-precision query and a PQ code array.
    */
  final case class AdcDistExpr(left: Expression, right: Expression,
                               codebooks: Seq[Seq[Seq[Double]]])
      extends BinaryExpression {
    private lazy val (flat, m, k, sub) = flatten(codebooks)

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_adc_dist"
    override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
      case ArrayType(IntegerType, _) if vectorTypeOk(right.dataType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_adc_dist expects (array<int> codes, array<double|float> query), " +
          s"got (${left.dataType}, ${right.dataType})")
    }
    private def qElementType: DataType =
      right.dataType.asInstanceOf[ArrayType].elementType

    protected override def nullSafeEval(codesAny: Any, qvAny: Any): Any = {
      val codes = codesAny.asInstanceOf[ArrayData]
      val qv = qvAny.asInstanceOf[ArrayData]
      val et = qElementType
      var total = 0.0
      var mi = 0
      while (mi < m) {
        val base = (mi * k + codes.getInt(mi)) * sub
        var s = 0.0
        var i = 0
        while (i < sub) {
          val t = elemGet(qv, mi * sub + i, et) - flat(base + i)
          s += t * t
          i += 1
        }
        total += s
        mi += 1
      }
      total
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("adcCodebooks", flat, "double[]")
      nullSafeCodeGen(ctx, ev, (codes, qv) => {
        val total = ctx.freshName("total")
        val mi = ctx.freshName("mi")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val base = ctx.freshName("base")
        val t = ctx.freshName("t")
        s"""
          |double $total = 0.0;
          |for (int $mi = 0; $mi < $m; $mi++) {
          |  int $base = ($mi * $k + $codes.getInt($mi)) * $sub;
          |  double $s = 0.0;
          |  for (int $i = 0; $i < $sub; $i++) {
          |    double $t = ${elemGetJava(qv, s"$mi * $sub + $i", qElementType)}
          |      - $cbRef[$base + $i];
          |    $s += $t * $t;
          |  }
          |  $total += $s;
          |}
          |${ev.value} = $total;
          |""".stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): AdcDistExpr =
      copy(left = newLeft, right = newRight)
  }
}
