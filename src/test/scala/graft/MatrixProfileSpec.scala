package graft

import graft.operators.MatrixProfile

/** X327 matrix profile: hand-computed nearest-window profile on a
  * planted exact repeat (motif at distance 0), the discord's tie
  * breaking to the smaller j, the exclusion zone, and the
  * shorter-than-2w series emitting nothing.
  */
class MatrixProfileSpec extends SparkSpec {

  import spark.implicits._

  // key a: 1,2,3, 9,9,9, 1,2,3, 0 (w=3 -> windows i0..i7; the 1,2,3
  // block repeats at i0/i6). key b: too short for two disjoint windows.
  private def df = (
    Seq(1L, 2L, 3L, 9L, 9L, 9L, 1L, 2L, 3L, 0L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) } ++
      Seq(0L, 1L, 2L, 3L, 4L).zipWithIndex
        .map { case (v, i) => ("b", i.toLong, v) })
    .toDF("key", "idx", "x")

  test("planted repeat is a distance-0 motif; discord ties to smaller j") {
    val out = MatrixProfile.profile(df, "key", "idx", "x", w = 3)
      .as[(String, Long, Long, Long)].collect()
    assert(out.forall(_._1 == "a"), "short series must emit nothing")
    assert(out.map(_._2).sorted === (0L to 7L).toArray,
      "every complete window with a partner gets a row")
    val m = out.map(r => r._2 -> (r._3, r._4)).toMap
    assert(m(0L) === ((6L, 0L))) // the motif pair
    assert(m(6L) === ((0L, 0L)))
    // the 9,9,9 discord: d=149 at BOTH j=0 and j=6 -> smaller j wins
    assert(m(3L) === ((0L, 149L)))
  }
}
