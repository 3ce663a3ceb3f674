package graft

import graft.operators.Ransac

/** X314 RANSAC: consensus recovers a planted line under 1/6 gross
  * contamination, the winning candidate's slope is exact, is_best is
  * unique, and x-degenerate candidates drop.
  */
class RansacSpec extends SparkSpec {

  import spark.implicits._

  test("planted y = 2x with gross outliers: consensus finds the line") {
    val line = (1L to 40L).map(i => (i, i, 2 * i))
    val out = (41L to 48L).map(i => (i, i, 2 * i + 5000))
    val res = Ransac.lineFit((line ++ out).toDF("id", "x", "y"),
      "id", "x", "y", k = 8, tol = 0L)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    val best = res.filter(_._7)
    assert(best.size === 1)
    val (_, x1, y1, x2, y2, nIn, _) = best.head
    // the winner is a pair of on-line points: slope exactly 2, and at
    // tol = 0 its consensus is the full 40-point inlier set
    assert(y2 - y1 === 2 * (x2 - x1))
    assert(nIn === 40L)
    // no candidate can beat the planted structure
    assert(res.map(_._6).max === 40L)
  }

  test("x-degenerate candidate pairs are dropped") {
    val vertical = (1L to 10L).map(i => (i, 5L, i))
    val res = Ransac.lineFit(vertical.toDF("id", "x", "y"),
      "id", "x", "y", k = 4, tol = 10L)
    assert(res.count() === 0)
  }
}
