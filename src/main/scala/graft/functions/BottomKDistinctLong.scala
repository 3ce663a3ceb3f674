package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `bottomk_distinct_long(v, k)` — the k SMALLEST **distinct** long values
  * of the input, returned as an ascending `array<bigint>` (fewer than k
  * elements when the column has fewer distinct values). Null inputs are
  * skipped.
  *
  * This is the state of a KMV (k-minimum-values) distinct-count sketch
  * [Bar-Yossef et al., RANDOM'02; Beyer et al., SIGMOD'07]: feed it a
  * uniform hash of a column and the k-th smallest distinct hash estimates
  * NDV as `(k-1) · H / kth` (H = hash-space size). Two properties make it
  * the profile sketch of choice here over `approx_count_distinct`'s
  * HLL++:
  *
  *  - **Engine-independent**: the k smallest distinct values of a
  *    deterministic hash are a pure function of the DATA — any engine
  *    (the DuckDB oracle replays it as `SELECT DISTINCT h ORDER BY h
  *    LIMIT k`) computes the identical sketch and therefore the identical
  *    estimate, so sketch outputs can sit in a hash-compared result.
  *    HLL registers are implementation details; no cross-engine check is
  *    possible.
  *  - **Mergeable with bounded state**, same as HLL: distinct-union of
  *    two k-sets re-trimmed to k. Catalyst plans it partial → exchange →
  *    final (ObjectHashAggregate), so a 100 TB scan ships one ≤k-element
  *    set per (group, map task), never row data.
  *
  * Buffer = `mutable.TreeSet[Long]` (dedupe + order in one structure):
  * insert iff below the current k-th (or set not full), O(log k) per row
  * after the warm-up, O(k) state. With a 60-bit hash and k=256 the
  * serialized partial is ~2 KB — the shuffle cost of profiling a column
  * is constant in the row count.
  */
case class BottomKDistinctLong(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  private lazy val k: Int = {
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"bottomk_distinct_long: k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (LongType, IntegerType) if kExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (c, ke) =>
        TypeCheckResult.TypeCheckFailure(
          s"bottomk_distinct_long requires (bigint, foldable int), got ($c, $ke)")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottomk_distinct_long"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def offer(buf: mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) buf += v
    else if (v < buf.last && !buf.contains(v)) { buf -= buf.last; buf += v }

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray) // TreeSet iterates ascending

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => offer(buf, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinctLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinctLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinctLong =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
