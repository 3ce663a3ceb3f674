package graft

import graft.operators.Friedman

/** X353 tie-corrected Friedman: the perfect-order case that sits
  * exactly on the df = 2 critical value, a hand-computed tie
  * correction, and incomplete-block exclusion with the dropped count
  * reported.
  */
class FriedmanSpec extends SparkSpec {

  import spark.implicits._

  private def fr(rows: Seq[(String, String, Long)]) =
    Friedman.test(rows.toDF("b", "j", "v"), "b", "j", "v")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().head

  test("perfect order across 3 blocks hits the maximum Q = n(k−1) = 6") {
    // every block ranks A < B < C: S2 = (6, 12, 18), Σ = nk(k+1) = 36;
    // Q = 6 exactly — and 6e6 ≥ 5991464 (χ²₂): the textbook
    // just-rejects case
    val r = fr(Seq(
      ("b1", "A", 1L), ("b1", "B", 2L), ("b1", "C", 3L),
      ("b2", "A", 10L), ("b2", "B", 20L), ("b2", "C", 30L),
      ("b3", "A", 5L), ("b3", "B", 6L), ("b3", "C", 7L)))
    assert(r === ((3L, 3L, 0L, 6000000L, 6000000L, true)))
  }

  test("ties: doubled ranks and the hand-computed correction") {
    // one block, A = B < C: r2 = (3, 3, 6); Q grid = 1.5e6;
    // T = 2³ − 2 = 6, nkk = 24 → adj = 1.5e6·24/18 = 2e6
    val r = fr(Seq(("b1", "A", 1L), ("b1", "B", 1L), ("b1", "C", 2L)))
    assert(r === ((1L, 3L, 0L, 1500000L, 2000000L, false)))
  }

  test("incomplete blocks are excluded and counted, not silently ranked") {
    val r = fr(Seq(
      ("b1", "A", 1L), ("b1", "B", 1L), ("b1", "C", 2L),
      ("b2", "A", 4L), ("b2", "B", 9L))) // b2 misses C
    assert(r === ((1L, 3L, 1L, 1500000L, 2000000L, false)))
  }

  test("rank-sum invariant: identical values per block still total nk(k+1)") {
    // all-tied block: every r2 = k+1 → Q grid = 0, adj 0 (nkk = tt
    // only when k·(k²−1) = Σ(t³−t) per block… here 3·8 = 24 = t³−t
    // with t = 3 → 24: degenerate guarded to 0)
    val r = fr(Seq(("b1", "A", 7L), ("b1", "B", 7L), ("b1", "C", 7L)))
    assert(r._4 === 0L && r._5 === 0L && !r._6)
  }
}
