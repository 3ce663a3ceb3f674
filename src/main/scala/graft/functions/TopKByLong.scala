package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_by_long(payload, ord, k)` — bounded top-k aggregate: keeps the
  * k (payload: long, ord: long) pairs with the LARGEST `ord` (ties →
  * smallest payload, the `ORDER BY ord DESC, payload ASC` contract),
  * returned as `array<struct<payload, ord>>` sorted best-first.
  *
  * WHY a custom `TypedImperativeAggregate` when `row_number() OVER
  * (PARTITION BY g ORDER BY ord DESC)` computes the same rows: the
  * window form SHUFFLES AND SORTS EVERY CANDIDATE ROW — for top-k
  * similarity search that is |queries|×|candidates| rows through the
  * exchange, then a per-group sort, to discard all but k·|queries| of
  * them. This aggregate is partial-mergeable: each map task keeps a
  * k-bounded heap per group and the shuffle carries AT MOST k pairs per
  * (group, partition) — at 10⁹ candidates per query that is the
  * difference between shuffling terabytes and shuffling kilobytes.
  * Catalyst plans it as ObjectHashAggregate(partial) → exchange →
  * ObjectHashAggregate(final), the same shape as collect_set but with an
  * O(k) bound instead of unbounded state.
  *
  * Buffer = a "worst-at-head" binary heap (mutable.PriorityQueue): a
  * candidate enters iff it beats the current worst, O(log k) per row,
  * O(k) state. Serialization is a flat (size, payload, ord)* long
  * buffer.
  */
case class TopKByLong(
    payload: Expression,
    ord: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  import TopKByLong.worstFirst

  private lazy val k: Int = {
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"topk_by_long: k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(payload, ord, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, ord.dataType, kExpr.dataType) match {
      case (LongType, LongType, IntegerType) if kExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (p, o, ke) =>
        TypeCheckResult.TypeCheckFailure(
          s"topk_by_long requires (bigint, bigint, foldable int), got ($p, $o, $ke)")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("payload", LongType, nullable = false),
      StructField("ord", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_long"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Long, Long)],
      e: (Long, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { // beats current worst
      buf.dequeue(); buf.enqueue(e)
    }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val p = payload.eval(input)
    val o = ord.eval(input)
    if (p != null && o != null)
      offer(buf, (p.asInstanceOf[Long], o.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(
      buf.toArray.sorted(worstFirst) // ascending badness = best first
        .map { case (p, o) => InternalRow(p, o) })

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (p, o) => bb.putLong(p); bb.putLong(o) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => offer(buf, (bb.getLong, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByLong =
    copy(payload = newChildren(0), ord = newChildren(1), kExpr = newChildren(2))
}

object TopKByLong {
  /** Total order on (payload, ord) by "badness": an element is GREATER
    * (worse) when its ord is smaller, ties when its payload is larger —
    * so a max-heap keeps the worst element at its head and `sorted`
    * yields best-first.
    */
  val worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._2, a._2) // smaller ord → worse
      if (c != 0) c else java.lang.Long.compare(a._1, b._1) // larger payload → worse
    }
  }
}
