package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, filter_bytes)` — membership probe against a
  * serialized `org.apache.spark.util.sketch.BloomFilter` carried as a
  * FOLDABLE binary literal in the plan.
  *
  * This is the hand-rolled form of Spark's runtime row-level filter
  * (`InjectRuntimeFilter` pairs an internal bloom aggregate with an
  * internal probe expression, but only for equi-JOIN pruning chosen by
  * the optimizer); exposing the probe as a public expression lets an
  * ANTI-join pipeline route definitely-absent rows around the shuffle
  * entirely (see [[graft.operators.BloomOps]]), which the optimizer's
  * runtime filter cannot do.
  *
  * Hash compatibility: the filter must come from
  * `DataFrameStatFunctions.bloomFilter` / `BloomFilter.put*` (probed
  * here with the SAME public API: string keys are tested as their UTF-8
  * bytes, which `putString`/`putBinary` agree on; long keys via
  * `mightContainLong`). No false negatives by construction — a `false`
  * is definitive, a `true` means "verify exactly".
  *
  * The deserialized filter is `@transient lazy` — built once per
  * executor from the literal bytes that ship inside the expression
  * tree, and referenced directly from generated code via
  * `addReferenceObj` (one virtual call per row, no per-row
  * deserialization, stays inside whole-stage codegen). A filter for
  * 10⁸ keys at 1% FPR is ~120 MB — past that, plan-embedding stops
  * being sensible; shard the base and bloom per shard, or fall back to
  * the plain shuffle join (documented in BloomOps).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a foldable (literal) filter argument")
    else (left.dataType, right.dataType) match {
      case (StringType | LongType | BinaryType, BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires (string|bigint|binary, binary), got ($l, $r)")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  // Exposed for codegen + eval so both paths share one deserialization.
  def filterRef: BloomFilter = bloom

  override def nullable: Boolean = left.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null
    else left.dataType match {
      case StringType => bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
      case LongType => bloom.mightContainLong(v.asInstanceOf[Long])
      case BinaryType => bloom.mightContainBinary(v.asInstanceOf[Array[Byte]])
      case _ => throw new IllegalStateException("unreachable: checked input type")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    val childGen = left.genCode(ctx)
    val test = left.dataType match {
      case StringType => s"$ref.mightContainBinary(${childGen.value}.getBytes())"
      case LongType => s"$ref.mightContainLong(${childGen.value})"
      case BinaryType => s"$ref.mightContainBinary(${childGen.value})"
      case _ => throw new IllegalStateException("unreachable: checked input type")
    }
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $test;
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
