package graft

import graft.operators.Jonckheere

/** X354 Jonckheere–Terpstra: hand-computed rising/falling trends with
  * the exact z² cross-multiplication, and tie half-counting pinning
  * J2 = E2 on an all-tied pair.
  */
class JonckheereSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]) =
    Jonckheere.jt(rows.toDF("g", "v"), "g", "v")
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().head

  test("perfect rising trend: J2 = 2·Σ n_g·n_h, z² hand-computed") {
    // groups (1,2) (3,4) (5,6): every cross pair concordant → J = 12,
    // J2 = 24, E2 = (36−12)/2 = 12, 72·Var = 36·75−84 = wait:
    // n²(2n+3) = 36·15 = 540, Σ n_g²(2n_g+3) = 3·28 = 84 → 456.
    // z² = 144·18/456 = 5.6842… ≥ 3.841458 → reject, rising.
    val r = run(Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L),
      (2L, 5L), (2L, 6L)))
    assert(r === ((6L, 3L, 24L, 12L, 5684210L, true, true)))
  }

  test("perfect falling trend: J2 = 0, same z², rising = false") {
    val r = run(Seq((0L, 5L), (0L, 6L), (1L, 3L), (1L, 4L),
      (2L, 1L), (2L, 2L)))
    assert(r === ((6L, 3L, 0L, 12L, 5684210L, false, true)))
  }

  test("all-tied pair: ties half-count so J2 lands exactly on E2") {
    // two groups of two equal values: #{x<y} = 0, #{x=y} = 4 →
    // J2 = 4 = E2 = (16−8)/2 → z² = 0, no direction, no rejection
    val r = run(Seq((0L, 1L), (0L, 1L), (1L, 1L), (1L, 1L)))
    assert(r === ((4L, 2L, 4L, 4L, 0L, false, false)))
  }

  test("a bucket absent from part of the spine still accumulates") {
    // group 1 has values entirely above group 0's support — the
    // zero-filled spine must carry group 0's cumulative into value
    // regions it never touches
    val r = run(Seq((0L, 1L), (1L, 100L), (1L, 200L)))
    // J2 = 2·2 (both cross pairs concordant) = 4; E2 = (9−5)/2 = 2
    assert(r._3 === 4L && r._4 === 2L && r._6)
  }
}
