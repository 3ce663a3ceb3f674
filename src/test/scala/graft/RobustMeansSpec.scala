package graft

import graft.llm.EventOps

/** Hand-checked semantics for X266 robust A/B means — trimmed and
  * winsorized boundary arithmetic from the histogram, tie
  * multiplicities, and the k = 0 degradation.
  */
class RobustMeansSpec extends SparkSpec {

  import spark.implicits._

  private def run(values: Seq[Double]) =
    EventOps.robustAbMeans(
        values.map(v => (2L, "a", v)).toDF("user_id", "event_type", "value"),
        "user_id", "event_type", "value")
      .select("n", "k_trim", "mean_micro", "trimmed_micro", "winsor_micro")
      .as[(Long, Long, Long, Long, Long)].collect().head

  test("outlier: mean dragged, trimmed and winsorized hold") {
    // cents 1..9 and 100; k=1 trims {1, 100}: trimmed = 44/8 cents,
    // winsorized clamps to {2, 9}: 55/10 cents; mean = 145/10
    val got = run((1 to 9).map(_ / 100.0) :+ 1.0)
    assert(got === ((10L, 1L, 145000L, 55000L, 55000L)))
  }

  test("boundary ties contribute exactly their in-range multiplicity") {
    // cents [1,1,1,5x5,9,9]: k=1, bottom = one 1, top = one 9;
    // trimmed = 36/8 = 4.5 cents; winsorized adds v_2=1, v_9=9 back
    val cents = Seq(1, 1, 1, 5, 5, 5, 5, 5, 9, 9)
    val got = run(cents.map(_ / 100.0))
    assert(got === ((10L, 1L, 46000L, 45000L, 46000L)))
  }

  test("n < 10: k = 0 and all three means coincide exactly") {
    val got = run(Seq(0.01, 0.02, 0.06))
    assert(got._2 === 0L)
    assert(got._3 === got._4 && got._4 === got._5)
    assert(got._3 === 30000L) // 3 cents / 3 = 1 cent
  }

  test("constant values: all three equal the constant") {
    val got = run(Seq.fill(20)(2.5))
    assert(got._3 === 2500000L && got._4 === 2500000L
      && got._5 === 2500000L)
  }
}
