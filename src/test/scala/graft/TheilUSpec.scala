package graft

/** X398 Theil's U: shape and range invariants on the sf0.001 corpus
  * (exact cross-engine values are the oracle's job).
  */
class TheilUSpec extends SparkSpec {

  import spark.implicits._

  test("two directions, micro-entropy ordering, ppm range") {
    val got = SparkEntry.queries("llm_theil_u")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq("lang|source", "source|lang"))
    for ((dir, hx, hc, u) <- got) {
      assert(hx > 0L, dir)
      // conditioning cannot add information; per-term half-micro
      // rounding can perturb the ordering by at most |cells| micro
      assert(hc <= hx + 100L, s"$dir: H(X|Y)=$hc > H(X)=$hx")
      assert(u >= -100L && u <= 1000000L, s"$dir: u_ppm=$u")
    }
  }
}
