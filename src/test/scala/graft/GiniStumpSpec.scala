package graft

import graft.operators.GiniStump

/** X366 exact Gini stump: perfect separation, a useless split, the
  * single-class tie-break, and the unsplittable degenerate.
  */
class GiniStumpSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]) =
    GiniStump.bestSplit(rows.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq

  test("perfectly separable classes: both sides pure, score doubles") {
    val r = run(Seq((1L, 0L), (1L, 0L), (2L, 1L), (2L, 1L)))
    // t = 1: masses 4·10⁶/2 each side → 4·10⁶ vs parent 8·10⁶/4
    assert(r === Seq((1L, 2L, 2L, 4000000L, 2000000L, true)))
  }

  test("a split orthogonal to the labels does not purify") {
    val r = run(Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L)))
    assert(r === Seq((1L, 2L, 2L, 2000000L, 2000000L, false)))
  }

  test("single class: all splits equal, smallest threshold wins the tie") {
    val r = run(Seq((1L, 0L), (2L, 0L), (3L, 0L)))
    assert(r === Seq((1L, 1L, 2L, 3000000L, 3000000L, false)))
  }

  test("a single distinct feature value cannot split: zero rows") {
    assert(run(Seq((5L, 0L), (5L, 1L))).isEmpty)
  }
}
