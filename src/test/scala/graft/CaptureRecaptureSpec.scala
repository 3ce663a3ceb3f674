package graft

import graft.operators.CaptureRecapture

/** Hand-checked semantics for X271 Chapman capture-recapture — the
  * estimator arithmetic, the nested-detector degeneracy, and the
  * coverage-gap readout.
  */
class CaptureRecaptureSpec extends SparkSpec {

  import spark.implicits._

  private def run(a: Seq[Long], b: Seq[Long]) =
    CaptureRecapture.chapman(a.toDF("d"), b.toDF("d"))
      .select("n1", "n2", "overlap", "n_union", "chapman_est",
        "est_missed")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head

  test("textbook estimate: half overlap doubles the population") {
    // n1 = 4, n2 = 4, m = 2: Chapman = 25/3 - 1 = 7 (floor), union 6
    val got = run(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L))
    assert(got === ((4L, 4L, 2L, 6L, 7L, 1L)))
  }

  test("nested detectors collapse to the union, missed = 0") {
    val got = run(Seq(1L, 2L, 3L, 4L), Seq(2L, 3L))
    // (5*3)/(3) - 1 = 4 = union
    assert(got === ((4L, 2L, 2L, 4L, 4L, 0L)))
  }

  test("disjoint captures: Chapman still finite via the +1 correction") {
    val got = run(Seq(1L, 2L), Seq(3L, 4L))
    // (3*3)/1 - 1 = 8, union 4, missed 4
    assert(got === ((2L, 2L, 0L, 4L, 8L, 4L)))
  }

  test("duplicate flags inside one capture count once") {
    val got = run(Seq(1L, 1L, 2L), Seq(2L, 2L))
    assert(got._1 === 2L && got._2 === 1L && got._3 === 1L)
  }
}
