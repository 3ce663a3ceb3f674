package graft

import graft.operators.GoodTuring

/** X311 Good–Turing: hand-computed r-star and p0 on a planted table,
  * the N_r = 0 hole convention, spine completeness, and the
  * missing-mass identity p0 = N1/N.
  */
class GoodTuringSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed table: 3 hapaxes, 2 doubles, 1 triple") {
    // N = 3*1 + 2*2 + 1*3 = 10, N1 = 3 -> p0 = 0.3
    val wc = Seq(("a", 1L), ("b", 1L), ("c", 1L), ("d", 2L), ("e", 2L),
      ("f", 3L)).toDF("w", "c")
    val out = GoodTuring.countOfCounts(wc, "c", maxR = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 2L, 1333333L, 300000L), // r* = 2*2/3
      (2L, 2L, 1L, 1500000L, 300000L), // r* = 3*1/2
      (3L, 1L, 0L, 0L, 300000L), // N4 = 0: adjusted count honestly 0
      (4L, 0L, 0L, 0L, 300000L))) // N_r = 0 hole: r* = 0 by convention
  }

  test("hapax-only corpus: all mass is missing") {
    val wc = Seq(("a", 1L), ("b", 1L)).toDF("w", "c")
    val out = GoodTuring.countOfCounts(wc, "c", maxR = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 0L, 0L, 1000000L), (2L, 0L, 0L, 0L, 1000000L)))
  }
}
