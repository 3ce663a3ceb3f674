package graft

import graft.operators.Betweenness

/** X294 sampled-source betweenness: hand-checked path-graph flows,
  * the σ-ratio quantization on a diamond (two equal shortest paths),
  * and the hop-horizon truncation semantics.
  */
class BetweennessSpec extends SparkSpec {

  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]) =
    (edges ++ edges.map(e => (e._2, e._1))).toDF("a", "b")

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
      levels: Int = 4, topK: Int = 20) =
    Betweenness.approx(sym(edges), "a", "b", seeds.toDF("n"),
        levels, topK)
      .as[(Long, Long)].collect().toMap

  test("path graph: interior nodes carry the flow, endpoints none") {
    // 1-2-3-4-5, all sources: bc = 2x crossing-pair counts (micro)
    val bc = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(bc(3L) === 8000000L)
    assert(bc(2L) === 6000000L && bc(4L) === 6000000L)
    // zero-flow nodes simply never earn a delta row (both engines)
    assert(bc.getOrElse(1L, 0L) === 0L && bc.getOrElse(5L, 0L) === 0L)
  }

  test("diamond: two equal shortest paths split credit exactly in half") {
    // a=1, b=2, c=3, d=4: 1-2-4 and 1-3-4; source 1 only.
    // sigma(4) = 2, so delta(2) = floor(1*(1e6+0)/2) = 500000
    val bc = run(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), Seq(1L))
    assert(bc(2L) === 500000L && bc(3L) === 500000L)
    assert(bc.getOrElse(4L, 0L) === 0L)
  }

  test("hop horizon truncates: levels=1 sees no two-hop flow") {
    val bc = run(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L), levels = 1)
    // with only direct neighbors visible, nothing is intermediate
    assert(bc.values.forall(_ === 0L), bc.toString)
  }

  test("disconnected seed contributes nothing and breaks nothing") {
    val bc = run(Seq((1L, 2L), (2L, 3L)), Seq(1L, 99L))
    assert(bc(2L) === 1000000L) // 1->3 through 2, the only flow
    assert(bc.getOrElse(99L, 0L) === 0L)
  }
}
