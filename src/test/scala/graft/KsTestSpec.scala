package graft

import org.apache.spark.sql.functions._

import graft.operators.KsTest

/** X333 exact two-sample KS: a hand-computed cross-multiplied CDF gap
  * with its argmax location, the no-evidence small-n case, and the
  * exact rational α=0.05 rejection on a fully-separated large pair.
  */
class KsTestSpec extends SparkSpec {

  import spark.implicits._

  private def ks(rows: Seq[(String, Long)]) = {
    val d = rows.toDF("source", "s")
    val s0 = d.agg(min("source").as("s0"))
    KsTest.ks2(
      d.crossJoin(broadcast(s0))
        .groupBy("s")
        .agg(sum(when(col("source") === col("s0"), 1L).otherwise(0L))
          .as("c1"),
          sum(when(col("source") =!= col("s0"), 1L).otherwise(0L))
            .as("c2")))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().head
  }

  test("hand-computed gap and location") {
    // a: {1, 3}; z: {2, 4, 4}. Gaps (x n1*n2=6): s=1 -> 3, s=2 -> 1,
    // s=3 -> 4, s=4 -> 0. Max 4 at s=3, ks = 4e6 div 6 = 666666.
    assert(ks(Seq(("a", 1L), ("a", 3L),
      ("z", 2L), ("z", 4L), ("z", 4L)))
      === ((2L, 3L, 4L, 3L, 666666L, false)))
  }

  test("full separation at tiny n: D = 1 but no rejection (no power)") {
    val r = ks(Seq(("a", 1L), ("a", 2L), ("z", 10L), ("z", 11L)))
    assert(r._5 === 1000000L && !r._6)
  }

  test("full separation at n = 50 + 50 rejects at alpha = 0.05") {
    val rows = Seq.fill(50)(("a", 1L)) ++ Seq.fill(50)(("z", 2L))
    val r = ks(rows)
    assert(r._5 === 1000000L && r._6)
  }

  test("one-sided histogram is a degenerate non-rejection") {
    val r = ks(Seq(("a", 1L), ("a", 2L)))
    assert(r._2 === 0L && r._5 === 0L && !r._6)
  }

  test("ks_micro survives n1*n2 past the long-product wrap point") {
    // histogram input, so counts are free: n1 = n2 = 4e6 fully
    // separated -> d_num = n1*n2 = 1.6e13; the old long d_num*1e6
    // wrapped (1.6e19 > 2^63); the decimal route reads exactly 1e6
    val r = KsTest.ks2(Seq((1L, 4000000L, 0L), (2L, 0L, 4000000L))
        .toDF("s", "c1", "c2"))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(r === ((4000000L, 4000000L, 16000000000000L, 1L,
      1000000L, true)))
  }
}
