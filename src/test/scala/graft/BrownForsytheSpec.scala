package graft

import graft.operators.BrownForsythe

/** X383 Brown–Forsythe: hand-computed spread contrasts (same medians,
  * different dispersions), the no-spread degenerate, and the
  * (k−1)·W ≥ χ² decision on a planted blow-up.
  */
class BrownForsytheSpec extends SparkSpec {

  import spark.implicits._

  type Row8 = (String, Long, Long, Long, Long, Long, Long, Boolean)

  test("hand-computed two-group spread: W = 3.0, under the df-1 bar") {
    // a: 10,10,10,10 (d ≡ 0)  b: 0,10,10,20 (med 10, d = 10,0,0,10)
    // Sd_b = 20, Sd2_b = 200 → ssb6 = 5e7, ssw6 = 1e8,
    // W = 6·5e7·1e6 / (1·1e8) = 3e6 micro; (k−1)W < 3841458 → no reject
    val df = Seq(("a", 10L), ("a", 10L), ("a", 10L), ("a", 10L),
      ("b", 0L), ("b", 10L), ("b", 10L), ("b", 20L)).toDF("g", "v")
    val got = BrownForsythe.test(df, "g", "v").as[Row8].collect().toSeq
    assert(got === Seq(
      ("a", 4L, 10L, 0L, 3000000L, 1L, 6L, false),
      ("b", 4L, 10L, 5000000L, 3000000L, 1L, 6L, false)))
  }

  test("planted dispersion blow-up rejects at the df-1 bar") {
    // a: eight 10s (d ≡ 0)  b: 0,0,20,20 (med 0, d = 0,0,20,20)
    // ssb6 = 266666667, ssw6 = 4e8 → W = 6666666 micro; (k−1)W ≥ bar
    val df = ((1 to 8).map(_ => ("a", 10L)) ++
      Seq(("b", 0L), ("b", 0L), ("b", 20L), ("b", 20L))).toDF("g", "v")
    val got = BrownForsythe.test(df, "g", "v").as[Row8].collect().toSeq
    assert(got.map(_._5).distinct === Seq(6666666L))
    assert(got.forall(_._8))
  }

  test("identical spreads: W = 0, no rejection") {
    val df = Seq(("a", 1L), ("a", 3L), ("b", 11L), ("b", 13L)).toDF("g", "v")
    val got = BrownForsythe.test(df, "g", "v").as[Row8].collect().toSeq
    // both groups: med clears at the lower value, d = 0,2 → identical
    // deviation profiles → SSB = 0 → W = 0
    assert(got.map(_._5).distinct === Seq(0L) && got.forall(!_._8))
  }
}
