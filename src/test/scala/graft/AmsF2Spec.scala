package graft

import graft.operators.AmsF2

/** X378 AMS F2 sketch: the singleton-exactness identity, determinism,
  * scale covariance, and the accuracy-audit contract on a wide
  * uniform corpus.
  */
class AmsF2Spec extends SparkSpec {

  import spark.implicits._

  private def est(rows: Seq[(String, String, Long)]) =
    AmsF2.estimate(rows.toDF("g", "i", "c"), "g", "i", "c")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)

  test("a single-item group is estimated EXACTLY") {
    // every estimator is ±f, every square f², every group sum 7f²:
    // est = (7f² + 7f²) // 14 = f², err 0
    val r = est(Seq(("a", "word", 10L)))
    assert(r === Seq(("a", 100L, 100L, 0L)))
  }

  test("deterministic: two runs agree exactly") {
    val rows = (1 to 300).map(i => ("g", s"w$i", (i % 7 + 1).toLong))
    assert(est(rows) === est(rows))
  }

  test("doubling every count quadruples the estimate (within floors)") {
    val rows = (1 to 200).map(i => ("g", s"w$i", (i % 5 + 1).toLong))
    val e1 = est(rows).head
    val e2 = est(rows.map { case (g, i, c) => (g, i, c * 2) }).head
    assert(e2._2 === 4 * e1._2) // exact F2 is exactly covariant
    assert((e2._3 - 4 * e1._3).abs <= 3) // estimate: floor slack only
  }

  test("accuracy audit: uniform 2000-item corpus lands within 50%") {
    val rows = (1 to 2000).map(i => ("g", s"item$i", 3L))
    val r = est(rows).head
    assert(r._2 === 2000L * 9)
    assert(r._4 < 5000L, s"err_bp ${r._4} — median-of-means drifted")
  }

  test("groups are sketched independently") {
    val a = (1 to 50).map(i => ("a", s"w$i", 2L))
    val b = Seq(("b", "solo", 7L))
    val r = est(a ++ b)
    assert(r.map(_._1) === Seq("a", "b"))
    assert(r.find(_._1 == "b").get._3 === 49L) // singleton exactness
  }
}
