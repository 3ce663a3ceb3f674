package graft

import graft.operators.MoodMedian

/** X382 Mood's median test: a hand-computed 2-group split, the
  * degenerate all-tied input, and the pooled-median clearing rule.
  */
class MoodMedianSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed two-group shift: chi2 = 8.0, df 1, reject") {
    // a: 1,1,2,2  b: 3,3,4,4 — pooled median 2 (2·cum ≥ 8 clears at 2);
    // above: a=0, b=4; A=B=4; each term (a·8 − n·4)²·1e6/(n·16) = 4e6
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 2L),
      ("b", 3L), ("b", 3L), ("b", 4L), ("b", 4L)).toDF("g", "v")
    val got = MoodMedian.test(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got === Seq(
      ("a", 4L, 0L, 2L, 4000000L, 8000000L, 1L, true),
      ("b", 4L, 4L, 2L, 4000000L, 8000000L, 1L, true)))
  }

  test("all-tied input: A = 0 degenerates to chi2 = 0, no rejection") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val got = MoodMedian.test(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got.forall(r => r._5 === 0L && r._6 === 0L && !r._8))
  }

  test("balanced groups around the median: chi2 stays under the bar") {
    // a: 1,4  b: 2,3 — median 2; above: a=1 (the 4), b=1 (the 3);
    // terms (1·4 − 2·2)² = 0 each → chi2 = 0
    val df = Seq(("a", 1L), ("a", 4L), ("b", 2L), ("b", 3L)).toDF("g", "v")
    val got = MoodMedian.test(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got.map(_._6).distinct === Seq(0L) && got.forall(!_._8))
  }
}
