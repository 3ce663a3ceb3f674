package graft

import graft.operators.KatzWalks

/** X397 Katz walk counts: hand-computed c_k = A·c_{k−1} on a path and a
  * triangle, plus the dyadic katz_q8 composition the query ships.
  */
class KatzWalksSpec extends SparkSpec {

  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]) =
    edges.flatMap(e => Seq(e, e.swap)).toDF("v", "u")

  private def counts(edges: Seq[(Long, Long)]): Map[(Long, Int), Long] =
    KatzWalks.walkCounts(sym(edges), rounds = 4)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap

  test("path 1-2-3: walk counts per round") {
    val c = counts(Seq((1L, 2L), (2L, 3L)))
    // c1 = degree; c2(1) = c1(2) = 2; c3(2) = c2(1)+c2(3) = 4; etc.
    assert(c((1L, 1)) === 1L && c((2L, 1)) === 2L && c((3L, 1)) === 1L)
    assert(c((1L, 2)) === 2L && c((2L, 2)) === 2L && c((3L, 2)) === 2L)
    assert(c((1L, 3)) === 2L && c((2L, 3)) === 4L && c((3L, 3)) === 2L)
    assert(c((1L, 4)) === 4L && c((2L, 4)) === 4L && c((3L, 4)) === 4L)
    // the center node's dyadic score: 2·512 + 2·64 + 4·8 + 4 = 1188
    assert(c((2L, 1)) * 512 + c((2L, 2)) * 64 + c((2L, 3)) * 8 + c((2L, 4))
      === 1188L)
  }

  test("triangle: counts double per round, symmetric") {
    val c = counts(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    for (v <- 1L to 3L; k <- 1 to 4)
      assert(c((v, k)) === (1L << k), s"node $v round $k")
  }
}
