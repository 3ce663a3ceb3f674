package graft

import graft.operators.CliffsDelta

/** X372 Cliff's delta: hand-computed dominance counts from the value
  * histogram, the signed floored micro grid, the Romano magnitude
  * bands at their exact integer boundaries, and the undefined
  * one-arm edge.
  */
class CliffsDeltaSpec extends SparkSpec {

  import spark.implicits._

  private def d(rows: Seq[(Int, Long)]) =
    CliffsDelta.delta(rows.toDF("arm", "v"), "arm", "v")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().head

  test("complete dominance saturates at +1 / large") {
    // arm1 = {3,4} beats arm0 = {1,2} in all 4 pairs
    assert(d(Seq((0, 1L), (0, 2L), (1, 3L), (1, 4L)))
      === ((2L, 2L, 4L, 0L, 4L, 1000000L, "large")))
  }

  test("identical distributions read exactly zero / negligible") {
    assert(d(Seq((0, 1L), (0, 3L), (1, 1L), (1, 3L)))
      === ((2L, 2L, 1L, 1L, 0L, 0L, "negligible")))
  }

  test("hand-computed mixed case: δ = 1/3, medium by the bands") {
    // arm0 = {1,1,2}, arm1 = {1,2,2}: gt = 4, lt = 1, pairs = 9,
    // δ = 3/9 = 0.333… → 333333 micro; 3·10⁶ ≥ 0.33·9·10⁶ and
    // < 0.474·9·10⁶ → medium
    assert(d(Seq((0, 1L), (0, 1L), (0, 2L), (1, 1L), (1, 2L), (1, 2L)))
      === ((3L, 3L, 4L, 1L, 3L, 333333L, "medium")))
  }

  test("the sign carries through the floored magnitude division") {
    val r = d(Seq((1, 1L), (1, 1L), (1, 2L), (0, 1L), (0, 2L), (0, 2L)))
    assert(r === ((3L, 3L, 1L, 4L, -3L, -333333L, "medium")))
  }

  test("negligible band boundary: |δ| < 0.147") {
    // arm0 = {1,2}, arm1 = {1,2} with one extra tie pair each side
    // δ = 0 stays negligible; a 1-pair edge: arm0={1}, arm1={1,2}:
    // gt = 1, lt = 0, pairs = 2 → δ = 0.5 → large
    assert(d(Seq((0, 1L), (1, 1L), (1, 2L)))
      === ((1L, 2L, 1L, 0L, 1L, 500000L, "large")))
  }

  test("an empty arm is undefined, not a division blowup") {
    assert(d(Seq((1, 1L), (1, 2L)))
      === ((0L, 2L, 0L, 0L, 0L, 0L, "undefined")))
  }
}
