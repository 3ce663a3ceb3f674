package graft

import graft.operators.FleissKappa

/** X373 Fleiss' kappa: hand-computed κ on perfect, partial, and
  * below-chance panels; the exact-rational micro grid; the loudly
  * enforced constant-panel contract.
  */
class FleissKappaSpec extends SparkSpec {

  import spark.implicits._

  private def k(rows: Seq[(Long, Int)]) =
    FleissKappa.kappa(rows.toDF("s", "c"), "s", "c")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head

  test("perfect agreement on split categories is exactly 1") {
    // s1 -> {A,A}, s2 -> {B,B}: P̄ = 1, Pe = 1/2, κ = 1
    assert(k(Seq((1L, 0), (1L, 0), (2L, 1), (2L, 1)))
      === ((2L, 2L, 2L, 4L, 8L, 1000000L, 500000L, 1000000L)))
  }

  test("hand-computed partial panel: κ = −1/3 on the micro grid") {
    // s1 -> {A,A}, s2 -> {A,B}: sp = 2, ΣC² = 10,
    // P̄ = 1/2, Pe = 5/8, κ = (1/2−5/8)/(3/8) = −1/3 → −333333
    // (sign-extracted magnitude division, truncation toward zero)
    assert(k(Seq((1L, 0), (1L, 0), (2L, 0), (2L, 1)))
      === ((2L, 2L, 2L, 2L, 10L, 500000L, 625000L, -333333L)))
  }

  test("three raters, three categories, all disagreeing: κ < 0") {
    // every subject gets {A,B,C}: P̄ = 0; Pe = 1/3, κ = −1/2
    assert(k(Seq((1L, 0), (1L, 1), (1L, 2), (2L, 0), (2L, 1), (2L, 2)))
      === ((2L, 3L, 3L, 0L, 12L, 0L, 333333L, -500000L)))
  }

  test("the ragged-panel contract raises loudly") {
    val e = intercept[Exception] {
      k(Seq((1L, 0), (1L, 0), (2L, 0)))
    }
    assert(e.getMessage.contains("FleissKappa") ||
      e.getCause != null && e.getCause.getMessage.contains("FleissKappa"))
  }

  test("a single-rating panel (n = 1) is rejected, not divided by zero") {
    val e = intercept[Exception] {
      k(Seq((1L, 0), (2L, 1)))
    }
    assert(e.getMessage.contains("FleissKappa") ||
      e.getCause != null && e.getCause.getMessage.contains("FleissKappa"))
  }
}
