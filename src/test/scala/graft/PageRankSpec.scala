package graft

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), nodes.toDF("id"), iters)
      .as[(Long, Long)].collect().toMap

  test("one iteration matches the hand-computed integer update") {
    // nodes 0,1,2; edges 1->0, 2->0, 0->1. N=3, SCALE=1e9:
    // r0 = 333333333 each; base = 15e9 // 300 = 50000000
    // r1(0) = base + 85*(333333333+333333333)//100 = 616666666
    // r1(1) = base + 85*333333333//100          = 333333333
    // r1(2) = base (no inflow)                  = 50000000
    val got = ranks(Seq((1L, 0L), (2L, 0L), (0L, 1L)), Seq(0L, 1L, 2L), 1)
    assert(got === Map(0L -> 616666666L, 1L -> 333333333L, 2L -> 50000000L))
  }

  test("personalized: teleport lands on seeds only; unreachable nodes hold exact 0") {
    // chain 1->2->3, seed {1}, 1 iteration:
    // r0 = {1: 1e9, 2: 0, 3: 0}; base = 15e9 // 100 = 150000000
    // r1(1) = base (seed, no inflow)      = 150000000
    // r1(2) = 85 * 1e9 // 100 (non-seed)  = 850000000
    // r1(3) = inflow r0(2)=0              = 0
    val got = PageRank.personalized(
        Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"),
        Seq(1L, 2L, 3L).toDF("id"), Seq(1L).toDF("id"), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 150000000L, 2L -> 850000000L, 3L -> 0L))
    // node 4 in a separate component never receives seed mass
    val got2 = PageRank.personalized(
        Seq((1L, 2L), (4L, 5L)).toDF("src", "dst"),
        Seq(1L, 2L, 4L, 5L).toDF("id"), Seq(1L).toDF("id"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got2(4L) === 0L && got2(5L) === 0L)
    assert(got2(1L) > 0L && got2(2L) > 0L)
  }

  test("three iterations: sink hub dominates, mass never exceeds SCALE") {
    val got = ranks(Seq((1L, 0L), (2L, 0L), (0L, 1L)), Seq(0L, 1L, 2L), 3)
    assert(got(0L) > got(1L) && got(1L) > got(2L))
    // truncating integer division only LOSES mass (<= 1 unit per op)
    assert(got.values.sum <= PageRank.Scale)
    assert(got.values.sum > PageRank.Scale * 9 / 10)
  }

  test("isolated nodes hold exactly the damped base; zero iterations is uniform") {
    val uniform = ranks(Seq((1L, 2L)), Seq(1L, 2L, 3L), 0)
    assert(uniform.values.toSet === Set(PageRank.Scale / 3))
    val got = ranks(Seq((1L, 2L)), Seq(1L, 2L, 3L), 2)
    // node 3 is isolated: rank = 15e9 // (100*3) = 50000000 every round
    assert(got(3L) === 50000000L)
    // 1 dangles after giving its mass away; 2 collects it
    assert(got(2L) > got(1L))
  }
}
