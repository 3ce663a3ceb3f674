package graft

import graft.operators.BoundedBfs
import org.apache.spark.sql.functions._

/** X395 bounded BFS balls: exact distances on hand graphs — path
  * truncation at the radius, cycle wrap-around (shortest side wins),
  * disconnected components never leak, multi-seed independence.
  */
class BoundedBfsSpec extends SparkSpec {

  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]) =
    edges.flatMap(e => Seq(e, e.swap)).toDF("u", "v")

  test("path graph: ring per hop, truncated at maxDepth") {
    // 1-2-3-4-5-6-7: from seed 1, radius 4 reaches 2,3,4,5 only
    val und = sym((1L to 6L).map(i => (i, i + 1)))
    val got = BoundedBfs.balls(und, Seq(1L).toDF("u"), maxDepth = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 2),
      (1L, 4L, 3), (1L, 5L, 4)))
  }

  test("cycle: both directions explored, shortest distance wins") {
    // 6-cycle from seed 1: node 4 is distance 3 via either arc, once
    val und = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 1L)))
    val got = BoundedBfs.balls(und, Seq(1L).toDF("u"), maxDepth = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 1L, 0), (1L, 2L, 1), (1L, 6L, 1),
      (1L, 3L, 2), (1L, 5L, 2), (1L, 4L, 3)))
  }

  test("two seeds, disjoint components: balls never cross") {
    val und = sym(Seq((1L, 2L), (10L, 11L), (11L, 12L)))
    val got = BoundedBfs.balls(und, Seq(1L, 10L).toDF("u"), maxDepth = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 1L, 0), (1L, 2L, 1),
      (10L, 10L, 0), (10L, 11L, 1), (10L, 12L, 2)))
  }
}
