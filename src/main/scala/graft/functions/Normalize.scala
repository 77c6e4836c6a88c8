package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a NATIVE Catalyst expression.
  *
  * Spark has no built-in Unicode-normalization function, and a Scala UDF
  * would break whole-stage codegen around it (serialization boundary,
  * boxed rows). This is the brief's preferred extension point: a
  * `UnaryExpression` with `doGenCode`, so the call inlines into the
  * generated Java alongside the surrounding expressions — the JVM's
  * `java.text.Normalizer` does the actual normalization (ICU-equivalent
  * for NFC). Dedup fingerprints over multilingual corpora need this:
  * "café" composed and decomposed are byte-different but NFC-equal, and a
  * fingerprint over unnormalized text splits what should be one dup group.
  *
  * Oracle twin: DuckDB's `nfc_normalize` (q64 hash-checks both, including
  * sequences with no precomposed form, which must stay decomposed).
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"NFC_NORMALIZE expects a string input, got ${child.dataType}")
  }
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object Normalize {
  /** Column API for [[NfcNormalize]] — resolves through the session's
    * function registry, where [[graft.plans.GraftExtensions]] registers
    * the expression (the public `SparkSessionExtensions` route; the
    * Column↔Expression bridge itself is `private[sql]` in Spark 4).
    */
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)
}
