package graft

import graft.operators.MoranI

/** X361 Moran's I: the perfect checkerboard (I = −1 exactly), a mild
  * 3-cell strip with hand-computed moments, and the constant-lattice
  * degenerate that must not reject.
  */
class MoranISpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]) =
    MoranI.moran(rows.toDF("cx", "cy"), "cx", "cy")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().head

  private def pts(cx: Long, cy: Long, n: Int) = Seq.fill(n)((cx, cy))

  test("2×2 perfect checkerboard reads I = −1 exactly and rejects") {
    // occupied diagonal (5 points each), empty anti-diagonal: every
    // rook pair anti-correlates. z = ±10, Σ_adj zz = −800 (doubled),
    // Σz² = 400, W = 8 → I = 4·(−800)/(8·400) = −1.
    // e = −⌊10⁶/3⌋ = −333333; var grid = ⌊192·10⁶/960⌋ − ⌊10⁶/9⌋
    // = 200000 − 111111 = 88889 — wait: (2·16·8 − 4·4·16 + 3·64) =
    // 256 − 256 + 192 = 192, W²(N²−1) = 64·15 = 960 → 200000;
    // minus 111111 → 88889. Δ² = 666667² ≥ 3841458·88889 → reject.
    val r = run(pts(0, 0, 5) ++ pts(1, 1, 5))
    assert(r === ((4L, 8L, -1000000L, -333333L, 88889L, true)))
  }

  test("3-cell strip: hand-computed mild positive autocorrelation") {
    // counts (4, 4, 1) along a 3-cell row: S = 9, N = 3, z = (3, 3,
    // −6); right pairs 9 − 18 = −9 → sumadj = −18; Σz² = 54, W = 4 →
    // I = 3·(−18)·10⁶/(4·54) = −250000; e = −500000; var =
    // ⌊48·10⁶/128⌋ − ⌊10⁶/4⌋ = 375000 − 250000 = 125000;
    // Δ² = 250000² < 3841458·125000 → no rejection
    val r2 = run(pts(0, 0, 4) ++ pts(1, 0, 4) ++ pts(2, 0, 1))
    assert(r2 === ((3L, 4L, -250000L, -500000L, 125000L, false)))
  }

  test("constant lattice carries no test: Σz² = 0 never rejects") {
    val r = run(pts(0, 0, 5) ++ pts(0, 1, 5) ++ pts(1, 0, 5)
      ++ pts(1, 1, 5))
    assert(r._3 === 0L && !r._6)
  }
}
