package graft

import graft.operators.CvmTest

/** X347 exact two-sample Cramér–von Mises: the hand-computed
  * integrated gap on the KS fixture, sample symmetry, the
  * full-separation rejection, degenerate sides, and the loud
  * decimal-envelope guard.
  */
class CvmTestSpec extends SparkSpec {

  import spark.implicits._

  private def cvm(rows: Seq[(Long, Long, Long)]) =
    CvmTest.cvm2(rows.toDF("s", "c1", "c2"))
      .as[(Long, Long, Long, Boolean)].collect().head

  test("hand-computed T on the KS fixture") {
    // a: {1,3}; z: {2,4,4}. d = f1·n2 − f2·n1 per value: 3, 1, 4, 0;
    // Σ cnt·d² = 9 + 1 + 16 + 0 = 26; T = 26/(5²·2·3) = 0.17333….
    assert(cvm(Seq((1L, 1L, 0L), (2L, 0L, 1L), (3L, 1L, 0L),
      (4L, 0L, 2L)))
      === ((2L, 3L, 173333L, false)))
  }

  test("T is sample-symmetric (d flips sign, squares agree)") {
    val a = cvm(Seq((1L, 1L, 0L), (2L, 0L, 1L), (3L, 1L, 0L),
      (4L, 0L, 2L)))
    val b = CvmTest.cvm2(Seq((1L, 0L, 1L), (2L, 1L, 0L), (3L, 0L, 1L),
      (4L, 2L, 0L)).toDF("s", "c1", "c2"))
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(a._3 === b._3)
  }

  test("full separation at 50 + 50 rejects: T = 12.5") {
    assert(cvm(Seq((1L, 50L, 0L), (2L, 0L, 50L)))
      === ((50L, 50L, 12500000L, true)))
  }

  test("tiny full separation has no power at this scale") {
    // n = m = 2: Σ cnt·d² = 2·16 = 32, T = 32/(16·4) = 0.5 ≥ 0.46136
    // — the ASYMPTOTIC point does reject here; pin the exact value so
    // the small-n caveat stays visible
    assert(cvm(Seq((1L, 2L, 0L), (2L, 0L, 2L)))
      === ((2L, 2L, 500000L, true)))
  }

  test("one empty side degenerates to zero") {
    assert(cvm(Seq((1L, 3L, 0L), (2L, 4L, 0L)))
      === ((7L, 0L, 0L, false)))
  }

  test("N past the decimal envelope raises loudly") {
    val e = intercept[Exception] {
      cvm(Seq((1L, 2000000L, 0L), (2L, 0L, 2000000L)))
    }
    assert(e.getMessage.contains("envelope") ||
      e.getCause != null && e.getCause.getMessage.contains("envelope"))
  }
}
