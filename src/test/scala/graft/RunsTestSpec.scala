package graft

import graft.operators.RunsTest

/** X336 runs test: alternation and clustering both reject, a series
  * engineered to R = μ does not, median-tied days drop, and the
  * all-equal degenerate reports no evidence.
  */
class RunsTestSpec extends SparkSpec {

  import spark.implicits._

  private def run(vals: Seq[Long]) = RunsTest.test(
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("i", "v"), "i", "v")
    .as[(Long, Long, Long, Long, Long, Boolean)].collect().head

  // 10x5 and 10x9 with a single 7 -> lower median 7, the 7-day drops,
  // a = b = 10, mu = 2*100/20 + 1 = 11 (11e6 micro)
  test("perfect alternation rejects (too many runs)") {
    val vals = (0 until 10).flatMap(_ => Seq(5L, 9L)) :+ 7L
    assert(run(vals) === ((20L, 10L, 10L, 20L, 11000000L, true)))
  }

  test("two clustered blocks reject (too few runs)") {
    val vals = Seq.fill(10)(5L) ++ Seq.fill(10)(9L) :+ 7L
    assert(run(vals) === ((20L, 10L, 10L, 2L, 11000000L, true)))
  }

  test("a series landing exactly on mu does not reject") {
    // 11 runs from 10 above + 10 below: R = mu = 11
    val vals = Seq(9L, 5L, 9L, 5L, 9L, 5L, 9L, 5L, 9L) ++
      Seq.fill(6)(5L) ++ Seq.fill(5)(9L) :+ 7L
    assert(run(vals) === ((20L, 10L, 10L, 11L, 11000000L, false)))
  }

  test("all-equal series is a no-evidence degenerate") {
    assert(run(Seq.fill(8)(4L)) === ((0L, 0L, 0L, 0L, 1000000L, false)))
  }
}
