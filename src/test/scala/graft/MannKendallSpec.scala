package graft

import graft.operators.MannKendall

/** X371 Mann–Kendall trend: hand-computed S/var18 on monotone,
  * tied, and constant series; the χ²₁ cross-multiplied decision; group
  * independence; the loud calendar envelope.
  */
class MannKendallSpec extends SparkSpec {

  import spark.implicits._

  private def mk(rows: Seq[(String, Long, Long)]) =
    MannKendall.trend(rows.toDF("g", "i", "y"), "g", "i", "y")
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().toSeq

  test("monotone rise: S = n(n-1)/2, exact z² = 6.0, rejected") {
    // y = 1..5: all 10 pairs concordant, no ties; var18 = 5·4·15 = 300,
    // z² = 18·100/300 = 6.0 > 3.841
    val r = mk((1L to 5L).map(i => ("a", i, i)))
    assert(r === Seq(("a", 5L, 10L, 300L, 6000000L, true, true)))
  }

  test("monotone fall is the mirrored S with the same rejection") {
    val r = mk((1L to 5L).map(i => ("a", i, 6L - i)))
    assert(r === Seq(("a", 5L, -10L, 300L, 6000000L, false, true)))
  }

  test("ties shrink the variance numerator, hand-checked") {
    // y = (1,1,2,2): S = 4; two tie groups of 2 → tie_sum = 36,
    // var18 = 4·3·13 − 36 = 120; z² = 18·16/120 = 2.4 < 3.841
    val r = mk(Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 2L),
      ("a", 4L, 2L)))
    assert(r === Seq(("a", 4L, 4L, 120L, 2400000L, true, false)))
  }

  test("constant series: var18 = 0 reports no trend, no error") {
    val r = mk(Seq(("a", 1L, 7L), ("a", 2L, 7L), ("a", 3L, 7L)))
    assert(r === Seq(("a", 3L, 0L, 0L, 0L, false, false)))
  }

  test("groups fold independently") {
    val r = mk((1L to 5L).map(i => ("up", i, i))
      ++ (1L to 4L).map(i => ("flat", i, 3L)))
    assert(r.map(_._1) === Seq("flat", "up"))
    assert(r.map(_._7) === Seq(false, true))
  }

  test("the decimal envelope is loudly enforced past 1e5 points") {
    val big = spark.range(100001L)
      .selectExpr("'a' AS g", "id AS i", "id AS y")
    val e = intercept[Exception] {
      MannKendall.trend(big, "g", "i", "y").collect()
    }
    assert(e.getMessage.contains("MannKendall") ||
      e.getCause != null && e.getCause.getMessage.contains("MannKendall"))
  }
}
