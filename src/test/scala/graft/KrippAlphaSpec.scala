package graft

import org.apache.spark.sql.functions.col

import graft.llm.EvalOps

/** X310 Krippendorff's alpha: hand-computed mixed-m_u value
  * (including a NEGATIVE alpha — worse than chance), the
  * single-rating drop, perfect agreement, and the degenerate
  * single-category convention.
  */
class KrippAlphaSpec extends SparkSpec {

  import spark.implicits._

  // three raters: (verdict, present) column pairs va/pa, vb/pb, vc/pc
  private def run(rows: Seq[(Long, String, Boolean, String, Boolean,
      String, Boolean)]): (Long, Long, Long, Long, Double) =
    EvalOps.krippAlpha(
      rows.toDF("u", "va", "pa", "vb", "pb", "vc", "pc"), "u",
      Seq(("a", col("va"), col("pa")), ("b", col("vb"), col("pb")),
        ("c", col("vc"), col("pc"))))
      .as[(Long, Long, Long, Long, Double)].collect().head

  test("hand-computed mixed units: alpha = -0.2, worse than chance") {
    // u1 {a,a}: do 0; u2 {a,b}: (2 div 1)*(4-2)=4; u3 {a,a,b}:
    // (2 div 2)*(9-5)=4 -> Do_L=8, n=7, margins a=5 b=2 ->
    // De_L = 2*(49-29)=40, alpha = (40 - 6*8)/40 = -0.2
    val out = run(Seq(
      (1L, "a", true, "a", true, "x", false),
      (2L, "a", true, "b", true, "x", false),
      (3L, "a", true, "a", true, "b", true)))
    assert(out === ((3L, 7L, 8L, 40L, -0.2)))
  }

  test("units with one rating drop; perfect agreement scores 1") {
    // u1 {a,a}, u2 {b,b}, u3 {a} (dropped): Do=0, margins 2/2,
    // De = 2*(16-8) = 16 -> alpha 1.0
    val out = run(Seq(
      (1L, "a", true, "a", true, "x", false),
      (2L, "b", true, "b", true, "x", false),
      (3L, "a", true, "x", false, "x", false)))
    assert(out === ((2L, 4L, 0L, 16L, 1.0)))
  }

  test("every kept rating one category: De = 0, alpha 0 by convention") {
    val out = run(Seq(
      (1L, "a", true, "a", true, "x", false),
      (2L, "a", true, "a", true, "x", false)))
    assert(out === ((2L, 4L, 0L, 0L, 0.0)))
  }
}
