package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(text)` — Unicode NFC normalization as a native
  * Catalyst expression. The text-normalization pass every multilingual
  * training pipeline runs before hashing/dedup: the same visible string
  * can arrive composed (U+00E9 'é') or decomposed (U+0065 U+0301
  * 'e'+combining acute), and every content-hash operator in this
  * library (exact dedup, MinHash, SimHash) would treat them as
  * different documents unless normalized first.
  *
  * No Spark built-in expresses this (`translate`/`regexp_replace`
  * cannot compose code points), so per the extension ladder a custom
  * `Expression` beats a Scala UDF: `doGenCode` emits a direct static
  * call to `java.text.Normalizer` inside whole-stage codegen — no UDF
  * serialization, no Row boxing. Both JVM and DuckDB (`nfc_normalize`)
  * implement the same Unicode normal form, so the operation oracles
  * exactly.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
