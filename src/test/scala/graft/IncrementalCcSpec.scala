package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Contract-and-solve incremental component maintenance vs full
  * recompute, including the cases the sf0.01 corpus doesn't exercise
  * (a batch edge MERGING two existing components).
  */
class IncrementalCcSpec extends SparkSpec {
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .labelPropagation(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  private def incr(base: Seq[(Long, Long)],
      batch: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.incrementalLabels(
      ConnectedComponents.labelPropagation(base.toDF("a", "b"), "a", "b"),
      batch.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("a batch edge merging two existing components relabels both sides") {
    val base = Seq((1L, 2L), (5L, 6L), (10L, 11L))
    val batch = Seq((2L, 5L)) // merges {1,2} with {5,6}; {10,11} untouched
    val got = incr(base, batch)
    assert(got === labels(base ++ batch))
    assert(got(6L) === 1L && got(5L) === 1L && got(10L) === 10L)
  }

  test("a new node bridging two components through a chain merges them") {
    val base = Seq((1L, 2L), (7L, 8L))
    val batch = Seq((100L, 2L), (100L, 8L)) // new node 100 joins both
    val got = incr(base, batch)
    assert(got === labels(base ++ batch))
    assert(got(100L) === 1L && got(8L) === 1L)
  }

  test("new-only components and untouched components coexist") {
    val base = Seq((1L, 2L))
    val batch = Seq((50L, 51L), (51L, 52L)) // brand-new component
    val got = incr(base, batch)
    assert(got === labels(base ++ batch))
    assert(got(52L) === 50L && got(1L) === 1L)
  }

  test("incremental equals full recompute on a pseudo-random edge stream") {
    val all = (0 until 60).map(i => ((i * 13 % 40).toLong, (i * 7 % 40).toLong))
      .filter { case (a, b) => a != b }
    val (base, batch) = all.splitAt(40)
    assert(incr(base, batch) === labels(all))
  }

  test("an empty batch is the identity on the label table") {
    val base = Seq((1L, 2L), (3L, 4L))
    val got = incr(base, Seq.empty[(Long, Long)])
    assert(got === labels(base))
  }
}
