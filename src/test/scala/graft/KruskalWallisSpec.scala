package graft

import graft.operators.KruskalWallis

/** X346 tie-corrected Kruskal–Wallis: a hand-computed no-tie H, the
  * doubled-rank-sum invariant, tie correction, full separation
  * rejecting at k = 3, the fully-tied degenerate, and the loud df
  * table guard.
  */
class KruskalWallisSpec extends SparkSpec {

  import spark.implicits._

  private def kw(rows: Seq[(String, Long)]) =
    KruskalWallis.kw(rows.toDF("g", "v"), "g", "v")
      .as[(Long, Long, Long, Long, Boolean)].collect().head

  test("hand-computed no-tie H") {
    // g1 = {1,2}, g2 = {3,4}: ranks 1..4, R1 = 3, R2 = 7 (S2 = 6, 14).
    // H = 12/(4·5)·(9/2 + 49/2) − 15 = 12·29/40 − 15 = 2.4 − wait:
    // 12/20·29 − 15 = 17.4 − 15 = 2.4. Term grid: ⌊3·36·10⁶/(2·20)⌋ +
    // ⌊3·196·10⁶/(2·20)⌋ − 15·10⁶ = 2700000 + 14700000 − 15000000
    // = 2400000. No ties → adj = H. df = 1: 2400000 < 3841458.
    val r = kw(Seq(("g1", 1L), ("g1", 2L), ("g2", 3L), ("g2", 4L)))
    assert(r === ((4L, 2L, 2400000L, 2400000L, false)))
  }

  test("tie correction inflates H") {
    // g1 = {1,1}, g2 = {2,2}: doubled ranks R2(1) = 3, R2(2) = 7;
    // S2 = 6, 14 → same H grid as above = 2400000. T = 2·(2³−2) = 12,
    // n³−n = 60 → adj = ⌊2400000·60/48⌋ = 3000000.
    val r = kw(Seq(("g1", 1L), ("g1", 1L), ("g2", 2L), ("g2", 2L)))
    assert(r === ((4L, 2L, 2400000L, 3000000L, false)))
  }

  test("full three-way separation at n = 30 rejects at df = 2") {
    // 10 rows per group, fully separated: H → (asymptotically) large;
    // exact: R_g = 55, 155, 255 → H = 12/(30·31)·(55²+155²+255²)/10
    //  − 93 = 12·92075/9300 − 93 = 118.81… − 93 = 25.81… > 5.991.
    val rows = (1 to 10).map(i => ("a", i.toLong)) ++
      (1 to 10).map(i => ("b", 100L + i)) ++
      (1 to 10).map(i => ("c", 200L + i))
    val r = kw(rows)
    assert(r._2 === 3L && r._4 > 25000000L && r._5)
  }

  test("fully-tied input degenerates to zero without dividing by zero") {
    val r = kw(Seq(("a", 7L), ("a", 7L), ("b", 7L), ("b", 7L)))
    // every rank tied: h on the floored grid is 0 here (terms divide
    // exactly); n³−n = T → adj defined 0, no rejection
    assert(r._3 === 0L && r._4 === 0L && !r._5)
  }

  test("doubled rank sums total n(n+1): the grid H is scale-consistent") {
    // same data under a value shift must give identical H (ranks only)
    val a = kw(Seq(("x", 1L), ("x", 5L), ("y", 3L), ("y", 9L), ("y", 9L)))
    val b = kw(Seq(("x", 101L), ("x", 105L), ("y", 103L), ("y", 109L),
      ("y", 109L)))
    assert(a === b)
  }

  test("k outside the chi-square table raises loudly") {
    val rows = (1 to 8).map(i => (s"g$i", i.toLong))
    val e = intercept[Exception] {
      kw(rows)
    }
    assert(e.getMessage.contains("chi-square") ||
      e.getCause != null && e.getCause.getMessage.contains("chi-square"))
  }
}
