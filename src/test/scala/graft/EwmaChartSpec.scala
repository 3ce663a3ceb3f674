package graft

import graft.operators.EwmaChart
import java.sql.Date

/** X380 EWMA chart: hand-computed early-day renormalization, a BigInt
  * replay of the full dyadic chain on a shifted series, the flag on a
  * planted level shift, series independence, and the zero-variance
  * degenerate.
  */
class EwmaChartSpec extends SparkSpec {

  import spark.implicits._

  private def day(i: Int) =
    Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))

  private def chart(rows: Seq[(String, Date, Long)]) =
    EwmaChart.chart(rows.toDF("k", "day", "x"), "k", "day", "x")
      .as[(String, Date, Long, Long, Boolean)].collect()
      .sortBy(r => (r._1, r._2.toString)).toSeq

  test("early days renormalize to available history") {
    // day 0: z = x₀; day 1: z = (2x₁ + x₀)/3
    val r = chart(Seq(("a", day(0), 3L), ("a", day(1), 9L)))
    assert(r.map(_._4) === Seq(3000000L, 7000000L))
  }

  test("the full dyadic chain matches a BigInt replay") {
    val xs = (0 until 40).map(i => if (i < 30) 10L else 500L)
    val rows = xs.zipWithIndex.map { case (x, i) => ("a", day(i), x) }
    val got = chart(rows).map(_._4)
    val expect = xs.indices.map { t =>
      val m = math.min(t, EwmaChart.W - 1)
      val num = (0 to m).map(k =>
        BigInt(xs(t - k)) * BigInt(1L << (EwmaChart.W - 1 - k))).sum
      val den = (0 to m).map(k =>
        BigInt(1L << (EwmaChart.W - 1 - k))).sum
      (num * 1000000 / den).toLong
    }
    assert(got === expect)
  }

  test("a planted level shift flags after the jump, not before") {
    // the shifted fraction must stay SMALL (5/45) — the chart's μ/σ
    // come from the whole series, and a long shift inflates σ until
    // the band swallows its own level (p(1−p)Δ² variance algebra)
    val xs = (0 until 45).map(i => if (i < 40) 100L else 5000L)
    val rows = xs.zipWithIndex.map { case (x, i) => ("a", day(i), x) }
    val r = chart(rows)
    assert(!r.take(35).exists(_._5), "pre-shift days must not flag")
    assert(r.drop(41).exists(_._5), "post-shift days must flag")
  }

  test("series are charted independently") {
    val r = chart(Seq(("a", day(0), 5L), ("a", day(1), 7L),
      ("b", day(1), 11L)))
    // b's first row must not see a's lag: z = x₀ = 11
    assert(r.find(_._1 == "b").get._4 === 11000000L)
  }

  test("a zero-variance series flags everywhere (documented degenerate)") {
    val rows = (0 until 5).map(i => ("a", day(i), 42L))
    val r = chart(rows)
    assert(r.forall(_._4 === 42000000L))
    assert(r.forall(_._5)) // dev = 0 ≥ 0 = 9·0·Σw²
  }
}
