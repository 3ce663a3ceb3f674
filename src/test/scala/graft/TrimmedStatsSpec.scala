package graft

import graft.operators.TrimmedStats

/** X384 trimmed/winsorized means: hand-computed overlap arithmetic,
  * outlier immunity (the motivating case), tied cells spanning the
  * trim boundary, and the n < 10 no-trim degenerate.
  */
class TrimmedStatsSpec extends SparkSpec {

  import spark.implicits._

  type Row8 = (String, Long, Long, Long, Long, Long, Long, Long)

  test("hand-computed 0..9: every estimate agrees at 4.5") {
    val df = (0L to 9L).map(v => ("a", v)).toDF("g", "v")
    val got = TrimmedStats.means(df, "g", "v").as[Row8].collect().toSeq
    assert(got === Seq(("a", 10L, 1L, 1L, 8L, 4500000L, 4500000L,
      4500000L)))
  }

  test("a 1000-cent outlier moves raw but neither robust estimate") {
    val df = ((0L to 8L) :+ 1000L).map(v => ("a", v)).toDF("g", "v")
    val got = TrimmedStats.means(df, "g", "v").as[Row8].collect().head
    assert(got._6 === 4500000L) // trimmed: ranks 2..9 = 1..8
    assert(got._7 === 4500000L) // winsorized: 36 + 1 + 8 over 10
    assert(got._8 === 103600000L) // raw mean dragged to 103.6 cents
  }

  test("tied cell spanning the trim boundary contributes its overlap") {
    // 5,5,5,5,9,9,9,9,9,9 — t=1: trim zone ranks 2..9; the 5-cell
    // (ranks 1..4) contributes 3 copies, the 9-cell (5..10) five
    val df = (Seq.fill(4)(5L) ++ Seq.fill(6)(9L)).map(v => ("a", v))
      .toDF("g", "v")
    val got = TrimmedStats.means(df, "g", "v").as[Row8].collect().head
    // s_trim = 3·5 + 5·9 = 60 → 7.5; winsor adds lo=5, hi=9 → 74/10
    assert(got._4 === 5L && got._5 === 9L)
    assert(got._6 === 7500000L && got._7 === 7400000L)
  }

  test("n < 10 means t = 0: trimmed == winsorized == raw") {
    val df = Seq(("a", 2L), ("a", 4L), ("a", 9L)).toDF("g", "v")
    val got = TrimmedStats.means(df, "g", "v").as[Row8].collect().head
    assert(got._3 === 0L)
    assert(got._6 === 5000000L && got._7 === 5000000L
      && got._8 === 5000000L)
  }
}
