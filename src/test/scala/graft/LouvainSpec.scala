package graft

import graft.operators.Louvain

/** X352 one synchronous Louvain local-move round: two triangles with
  * a weak bridge (hand-computed gains, labels, and both modularity
  * sides), and the two-node swap that pins the synchronous-chain
  * semantics (neutral move, Q unchanged).
  */
class LouvainSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)]) =
    Louvain.moveRound(rows.toDF("a", "b", "w"), "a", "b", "w")
      .as[(Long, Long, Long, Long, Long)].collect().head

  test("two triangles with a weak bridge: hand-computed sweep") {
    // k = (6,6,7,7,6,6), m2 = 38. gain2 = 38w − k_i·k_j: intra-triangle
    // edges are +72/+78, the bridge is −11 (never adopted). Synchronous
    // picks: 1→2, 2→1, 3→1, 4→5, 5→6, 6→5 → 4 communities,
    // q_after_num = 59 − 36 + 59 − 36 = 46 → ⌊46·10⁶/1444⌋ = 31855;
    // q_before = trunc(−242·10⁶/1444) = −167590.
    val r = run(Seq((1L, 2L, 3L), (1L, 3L, 3L), (2L, 3L, 3L),
      (4L, 5L, 3L), (4L, 6L, 3L), (5L, 6L, 3L), (3L, 4L, 1L)))
    assert(r === ((6L, 4L, 6L, -167590L, 31855L)))
  }

  test("two-node swap is neutral: the synchronous-chain caveat, pinned") {
    // a single edge: both endpoints adopt each other (gain2 = 1 > 0);
    // the partition is still two singletons, so Q is unchanged
    val r = run(Seq((1L, 2L, 1L)))
    assert(r === ((2L, 2L, 2L, -500000L, -500000L)))
  }

  test("star sweep: the hub vacates while leaves chase it — Q can drop") {
    // w(1,2) = w(1,3) = w(1,4) = 1: k_hub = 3, leaves 1, m2 = 6.
    // Leaf gain2 = 6·1 − 3 = 3 > 0 → leaves adopt the hub; the hub's
    // gains tie at 3 → it adopts leaf 2. Labels: 1→2, leaves→1 →
    // 2 communities, all 4 moved — and NO edge ends up internal
    // (hub left as its followers arrived), so Q DROPS from
    // trunc(−12·10⁶/36) = −333333 to (−9−9)·10⁶/36 = −500000. The
    // honest synchronous-sweep caveat, pinned: one round is a move
    // operator, not a convergence guarantee.
    val r = run(Seq((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L)))
    assert(r === ((4L, 2L, 4L, -333333L, -500000L)))
  }
}
