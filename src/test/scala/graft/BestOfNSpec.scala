package graft

import graft.llm.EvalOps

/** X330 best-of-n: the two-point hand computation (halving gap to the
  * max), n=1 = floor(mean), and the monotone-curve invariant on an
  * uneven panel.
  */
class BestOfNSpec extends SparkSpec {

  import spark.implicits._

  test("two-point panel: E[max of n] = (2^n - 1)/2^n of the top") {
    val out = EvalOps.bestOfN(
      Seq((1L, 0L), (2L, 1000000L)).toDF("id", "s"), "id", "s", maxN = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 500000L), (2L, 2L, 750000L), (3L, 2L, 875000L)))
  }

  test("n=1 is the floored mean; the curve never decreases") {
    val panel = Seq(10L, 20L, 20L, 70L, 400L).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val out = EvalOps.bestOfN(panel.toDF("id", "s"), "id", "s", maxN = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.head._3 === panel.map(_._2).sum / panel.size)
    assert(out.map(_._3).sliding(2).forall(w => w(0) <= w(1)))
    assert(out.forall(_._2 === panel.size.toLong))
    // with 5 points and 8 draws the max (400) dominates:
    // P(hit the top) = 1 - (4/5)^8 ~ 0.83 -> E[max] >= 340
    assert(out.last._3 >= 340L)
  }
}
