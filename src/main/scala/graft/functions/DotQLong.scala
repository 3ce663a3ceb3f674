package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native integer dot product over two array<long> columns.
  *
  * The built-in spelling — `aggregate(zip_with(a, b, _*_), 0L, _+_)` —
  * is semantically identical but materializes an intermediate array and
  * walks two higher-order-function evaluators per row. This expression
  * is one fused primitive loop, and `doGenCode` keeps it inside
  * whole-stage codegen (no lambda dispatch, no allocation), which is
  * what the similarity-search hot path wants at 10⁹+ rows.
  *
  * Preconditions: array elements non-null (the quantize step guarantees
  * it); length mismatch uses the shorter prefix (zip_with-with-nulls
  * would null-pad — don't feed ragged vectors either way).
  */
case class DotQLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_q_long requires two array<bigint> arguments, got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        |long $s = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += $x.getLong($i) * $y.getLong($i);
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQLong =
    copy(left = newLeft, right = newRight)
}

/** Session-extension registration (`SparkSessionExtensions.injectFunction`)
  * — wired into [[graft.GraftSession]]'s builder, also usable via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_q_long"),
      new ExpressionInfo(classOf[DotQLong].getName, "dot_q_long"),
      (children: Seq[Expression]) => DotQLong(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("topk_by_long"),
      new ExpressionInfo(classOf[TopKByLong].getName, "topk_by_long"),
      (children: Seq[Expression]) =>
        TopKByLong(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children(0))))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("bottomk_distinct_long"),
      new ExpressionInfo(classOf[BottomKDistinctLong].getName, "bottomk_distinct_long"),
      (children: Seq[Expression]) =>
        BottomKDistinctLong(children(0), children(1))))
  }
}
