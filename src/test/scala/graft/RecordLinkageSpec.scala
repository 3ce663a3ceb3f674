package graft

import graft.operators.RecordLinkage

/** Hand-checked semantics for X284 Fellegi-Sunter — the smoothed m/u
  * weight fit, exact ln-pair scores, and the three-way verdict.
  */
class RecordLinkageSpec extends SparkSpec {

  import spark.implicits._

  private def lmu(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1000000.0).toLong

  test("single field: exact smoothed weights from the 2x2 counts") {
    // matches: g = T,T,F (nm=3, ma=2); non: g = T,F,F,F (nu=4, ua=1)
    val cands = Seq(
      (1L, 1L, true, true), (2L, 2L, true, true), (3L, 3L, false, true),
      (1L, 2L, true, false), (1L, 3L, false, false),
      (2L, 3L, false, false), (3L, 1L, false, false))
      .toDF("f_key", "m_key", "g", "truth")
    val got = RecordLinkage.fellegiSunter(cands, Seq("g"), "truth",
        Seq("f_key", "m_key"))
      .as[(Long, Long, Int, Long, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val wa = lmu(3L * 6) - lmu(5L * 2)  // ln(m/u) = ln(18/10)
    val wd = lmu(2L * 6) - lmu(5L * 4)  // ln((1-m)/(1-u)) = ln(12/20)
    assert(got((1L, 1L))._4 === wa && got((1L, 1L))._5 === "possible")
    assert(got((3L, 3L))._4 === wd && got((3L, 3L))._5 === "nonlink")
    assert(got((1L, 2L))._4 === wa) // non-match that agrees scores wa too
    assert(got((1L, 1L))._6 === true && got((1L, 2L))._6 === false)
  }

  test("multi-field scores sum per-field weights; link threshold fires") {
    // two perfectly informative fields: agree iff match (4 M, 4 U)
    val cands = (1 to 4).map(i => (i.toLong, i.toLong, true, true, true)) ++
      (1 to 4).map(i => (i.toLong, (i + 10).toLong, false, false, false))
    val got = RecordLinkage.fellegiSunter(
        cands.toDF("f_key", "m_key", "ga", "gb", "truth"),
        Seq("ga", "gb"), "truth", Seq("f_key", "m_key"),
        upperMicro = 2000000L)
      .as[(Long, Long, Int, Long, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val wa = lmu(5L * 6) - lmu(6L * 1) // ln((5/6)/(1/6)) = ln 5
    assert(got((1L, 1L))._4 === 2 * wa)
    assert(got((1L, 1L))._3 === 2 && got((1L, 1L))._5 === "link")
    assert(got((1L, 11L))._3 === 0 && got((1L, 11L))._5 === "nonlink")
  }
}
