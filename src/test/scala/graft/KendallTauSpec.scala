package graft

import graft.operators.KendallTau

/** X345 tie-aware Kendall τ-b from the joint value histogram:
  * hand-computed S on perfect/inverted/mixed orders, the tie terms,
  * the exact-rational τ², and the documented small-n coarseness of
  * the isqrt-denominated τ_micro grid.
  */
class KendallTauSpec extends SparkSpec {

  import spark.implicits._

  private def tau(rows: Seq[(String, Long, Long)]) =
    KendallTau.tauB(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  test("perfect concordance and perfect inversion saturate at ±1") {
    val r = tau(Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 1L, 3L), ("b", 2L, 2L), ("b", 3L, 1L)))
    // S = ±3, P = Q = n(n−1) = 6, τ = 2S/√36 = ±1 exactly
    assert(r === Seq(("a", 3L, 3L, 1000000L, 1000000L),
      ("b", 3L, -3L, -1000000L, -1000000L)))
  }

  test("hand-computed mixed order: one discordant pair among six") {
    // y = (1,3,2,4): S = 5 − 1 = 4, P = Q = 12,
    // τ = 2·4/12 = 2/3 → 666666; τ² = 4·16·10⁶/144 = 444444
    val r = tau(Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 2L),
      ("a", 4L, 4L)))
    assert(r === Seq(("a", 4L, 4L, 444444L, 666666L)))
  }

  test("x-ties drop pairs from P and weight cells multiplicatively") {
    // x = (1,1,2,2), y = (1,2,1,2): every cross-x pair either agrees,
    // disagrees, or ties in y symmetrically → S = 0, τ = 0
    assert(tau(Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 1L),
      ("a", 2L, 2L)))
      === Seq(("a", 4L, 0L, 0L, 0L)))
  }

  test("tied x shrinks P: exact τ² on the rational grid, coarse τ") {
    // x = (1,1,2,3), y = (1,2,3,4): S = 5, Tx = 2 → P = 10, Q = 12,
    // τ_b = 2·5/√120 = 0.91287…; exact τ² = 4·25·10⁶/120 = 833333.
    // isqrt(120) = 10 floors the root hard at this toy size, so the
    // τ grid clamps to 10⁶ — the DOCUMENTED small-n coarseness (the
    // root's relative error is 1/√(P·Q), sub-micro past ~10³ rows).
    assert(tau(Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 3L),
      ("a", 3L, 4L)))
      === Seq(("a", 4L, 5L, 833333L, 1000000L)))
  }

  test("constant column (P = 0) reports zero association, not an error") {
    assert(tau(Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 1L, 3L)))
      === Seq(("a", 3L, 0L, 0L, 0L)))
  }

  test("groups are independent and ordered") {
    val r = tau(Seq(("b", 1L, 1L), ("b", 2L, 2L),
      ("a", 1L, 2L), ("a", 2L, 1L)))
    assert(r.map(_._1) === Seq("a", "b"))
    assert(r.map(_._4) === Seq(-1000000L, 1000000L))
  }
}
