package graft

import graft.operators.Pettitt

/** X394 Pettitt rank change point: hand-computed U walk on a tiny
  * series (U via the telescoped V_t identity), argmax-with-ties
  * convention, and the folded-literal significance decision at both a
  * too-small n and a planted strong break.
  */
class PettittSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed U walk; earliest-argmax break; small n cannot reject") {
    // y = 1,1,1,5,5 → V = (−2,−2,−2,3,3), U = (−2,−4,−6,−3,0):
    // K = 6 at i=3, the boundary between the two regimes.
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 5L), (5L, 5L))
      .toDF("i", "y")
    val got = Pettitt.test(df, "i", "y").orderBy("i")
      .as[(Long, Long, Long, Boolean, Long, Boolean)].collect().toSeq
    assert(got.map(_._3) === Seq(-2L, -4L, -6L, -3L, 0L))
    assert(got.map(_._4) === Seq(false, false, true, false, false))
    assert(got.forall(_._5 == 6L))
    // 6·6²·10⁶ = 2.16e8 < 3688879·(125+25) = 5.53e8 — n=5 cannot clear
    assert(got.forall(!_._6))
  }

  test("planted half-series level shift: break found, 5% decision fires") {
    val df = ((1L to 45L).map(i => (i, 0L))
      ++ (46L to 90L).map(i => (i, 10L))).toDF("i", "y")
    val got = Pettitt.test(df, "i", "y")
      .as[(Long, Long, Long, Boolean, Long, Boolean)].collect().toSeq
    val best = got.filter(_._4)
    // U_t = −45t on the low half: unique max |U| = 2025 at t = 45
    assert(best.map(_._1) === Seq(45L) && best.head._5 === 2025L)
    // 6·2025²·10⁶ = 2.46e13 ≥ 3688879·(90³+90²) = 2.72e12
    assert(got.forall(_._6))
  }

  test("constant series: K = 0, nothing rejects, all U zero") {
    val df = (1L to 10L).map(i => (i, 7L)).toDF("i", "y")
    val got = Pettitt.test(df, "i", "y")
      .as[(Long, Long, Long, Boolean, Long, Boolean)].collect().toSeq
    assert(got.forall(r => r._3 == 0L && r._5 == 0L && !r._6))
    assert(got.count(_._4) === 1) // the tie resolves to exactly one row
  }
}
