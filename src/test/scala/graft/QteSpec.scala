package graft

import graft.llm.EventOps

/** Hand-checked semantics for X267 quantile treatment effects — the
  * per-decile rank walks and exact cents contrasts.
  */
class QteSpec extends SparkSpec {

  import spark.implicits._

  // arm = user_id % 2; cents values exact
  private def run(arm0: Seq[Double], arm1: Seq[Double]) = {
    val rows = arm0.map(v => (2L, "a", v)) ++ arm1.map(v => (3L, "a", v))
    EventOps.quantileTreatmentEffects(
        rows.toDF("user_id", "event_type", "value"),
        "user_id", "event_type", "value")
      .select("q", "v0_cents", "v1_cents", "qte_cents")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
  }

  test("identical arms: QTE exactly zero at every decile") {
    val vs = (1 to 10).map(_.toDouble)
    val got = run(vs, vs)
    assert(got.length === 9)
    assert(got.forall(_._4 === 0L))
  }

  test("uniform location shift appears identically at every decile") {
    val vs = (1 to 10).map(_.toDouble)
    val got = run(vs, vs.map(_ + 2.5))
    assert(got.forall(_._4 === 250L))
  }

  test("a pure tail shift moves only the top decile") {
    val a0 = (1 to 10).map(_.toDouble)
    val a1 = (1 to 8).map(_.toDouble) ++ Seq(49.0, 50.0)
    val got = run(a0, a1)
    assert(got.take(8).forall(_._4 === 0L))
    // q=9 is the rank-9 statistic: 900 vs 4900 cents
    assert(got.last === ((9, 900L, 4900L, 4000L)))
  }
}
