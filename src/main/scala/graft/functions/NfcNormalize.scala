package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for [[NfcNormalize]] — static so codegen can call it
  * directly. */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC check is much cheaper than normalization and
    // virtually all real text is already composed
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer
      .normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text)` — Unicode NFC normalization as a native
  * codegen'd expression (canonical composition: a decomposed
  * `e + COMBINING ACUTE` and a composed `é` hash, group, and join
  * identically after it — the dedup/fingerprint family silently
  * fragments on mixed-form corpora without this). Spark has no
  * built-in Unicode normalizer; the alternative would be a Scala UDF
  * (serialization boundary, no codegen). DuckDB's `nfc_normalize`
  * implements the same Unicode standard, which is what makes the
  * llm_normalize gate cross-engine exact.
  *
  * Cite: generic engine capability (mandate §text analysis).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)

  override def nullSafeEval(t: Any): Any =
    NfcKernel.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}
