package graft

import graft.operators.McNemarBowker

/** X385 Bowker symmetry: hand-computed pair terms, empty-pair df
  * reduction, the all-agreement degenerate, and the asymmetric-drift
  * rejection.
  */
class McNemarBowkerSpec extends SparkSpec {

  import spark.implicits._

  type Row9 = (String, String, Long, Long, Long, Boolean, Long, Long,
    Boolean)

  test("hand-computed 3-label table: terms, df reduction, no reject") {
    // disagreements: x→y ×3, y→x ×1, x→z ×2; (y,z) never disagrees
    val df = (Seq.fill(3)(("x", "y")) ++ Seq(("y", "x")) ++
      Seq.fill(2)(("x", "z")) ++ Seq.fill(5)(("x", "x"))).toDF("a", "b")
    val got = McNemarBowker.test(df, "a", "b").as[Row9].collect().toSeq
    assert(got === Seq(
      // (x,y): (3−1)²·1e6/4 = 1e6; (x,z): (2−0)²·1e6/2 = 2e6
      ("x", "y", 3L, 1L, 1000000L, true, 3000000L, 2L, false),
      ("x", "z", 2L, 0L, 2000000L, true, 3000000L, 2L, false),
      ("y", "z", 0L, 0L, 0L, false, 3000000L, 2L, false)))
  }

  test("one-sided relabeling rejects at df 1") {
    // x→y ×5, never back: chi2 = 25·1e6/5 = 5e6 ≥ 3841458
    val df = (Seq.fill(5)(("x", "y")) ++ Seq.fill(3)(("y", "y")))
      .toDF("a", "b")
    val got = McNemarBowker.test(df, "a", "b").as[Row9].collect().toSeq
    assert(got === Seq(("x", "y", 5L, 0L, 5000000L, true, 5000000L,
      1L, true)))
  }

  test("perfect agreement: empty output, nothing to test") {
    val df = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    assert(McNemarBowker.test(df, "a", "b").count() === 0L)
  }

  test("symmetric disagreement: chi2 = 0, no rejection") {
    val df = (Seq.fill(4)(("x", "y")) ++ Seq.fill(4)(("y", "x")))
      .toDF("a", "b")
    val got = McNemarBowker.test(df, "a", "b").as[Row9].collect().toSeq
    assert(got === Seq(("x", "y", 4L, 4L, 0L, true, 0L, 1L, false)))
  }
}
