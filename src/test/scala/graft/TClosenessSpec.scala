package graft

import graft.operators.TCloseness

/** X305 t-closeness: hand-computed ordered-EMD per class (N = 10,
  * m = 3 planted grid), absent-cell spine completion, the exact
  * threshold boundary (t = threshold is NOT a violation), and the
  * single-band degenerate case.
  */
class TClosenessSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed EMD per class, absent cells complete the grid") {
    // classes A=(3,1,0) B=(0,1,3) C=(1,1,0); g=(4,3,3), N=10, m=3
    val cells = Seq(
      ("A", 0L, 3L), ("A", 1L, 1L),
      ("B", 1L, 1L), ("B", 2L, 3L),
      ("C", 0L, 1L), ("C", 1L, 1L)).toDF("cls", "band", "cnt")
    val out = TCloseness.audit(cells, Seq("cls"), "band", "cnt",
      threshold = 0.2)
      .select("cls", "group_n", "emd_num", "t", "t_violation")
      .as[(String, Long, Long, Double, Boolean)].collect().toSet
    // A: gaps 14, -2, -12 -> prefixes 14, 12, 0 -> 26/(2*4*10)
    // B: gaps -16, -2, 18 -> prefixes -16, -18, 0 -> 34/80
    // C: gaps 2, 4, -6    -> prefixes 2, 6, 0     -> 8/(2*2*10)
    assert(out === Set(
      ("A", 4L, 26L, 0.325, true),
      ("B", 4L, 34L, 0.425, true),
      ("C", 2L, 8L, 0.2, false))) // t == threshold: not a violation
  }

  test("a single global band leaks nothing: t = 0 by convention") {
    val cells = Seq(("A", 0L, 2L), ("B", 0L, 3L)).toDF("cls", "band", "cnt")
    val out = TCloseness.audit(cells, Seq("cls"), "band", "cnt")
      .select("cls", "emd_num", "t", "t_violation")
      .as[(String, Long, Double, Boolean)].collect().toSet
    assert(out === Set(("A", 0L, 0.0, false), ("B", 0L, 0.0, false)))
  }

  test("identical class and global distributions give t = 0") {
    val cells = Seq(
      ("A", 0L, 2L), ("A", 1L, 4L),
      ("B", 0L, 1L), ("B", 1L, 2L)).toDF("cls", "band", "cnt")
    val ts = TCloseness.audit(cells, Seq("cls"), "band", "cnt")
      .select("t").as[Double].collect()
    assert(ts.forall(_ === 0.0))
  }
}
