package graft

import org.apache.spark.sql.functions._
import graft.operators.CochranArmitage

/** X356/X357: Cochran–Armitage hand-computed z² both directions plus
  * the degenerate guards, and Nelson–Aalen cumulative hazard on a
  * hand-built cohort (censoring, risk sets, per-step floors).
  */
class TrendSurvivalSpec extends SparkSpec {

  import spark.implicits._

  private def ca(rows: Seq[(Long, Boolean)]) =
    CochranArmitage.trend(rows.toDF("g", "err"), "g", "err")
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().head

  private def dose(g: Long, errs: Int, oks: Int) =
    Seq.fill(errs)((g, true)) ++ Seq.fill(oks)((g, false))

  test("rising error rate 0/10 → 5/10 → 10/10: z² = 19.333…") {
    // T = 25, S1 = 30, S2 = 50, num = 300, den = 225·600 = 135000,
    // z² = 90000·29/135000 → micro 19333333
    val r = ca(dose(0, 0, 10) ++ dose(1, 5, 5) ++ dose(2, 10, 0))
    assert(r === ((30L, 15L, 3L, 19333333L, true, true)))
  }

  test("falling trend: same z², rising = false") {
    val r = ca(dose(0, 10, 0) ++ dose(1, 5, 5) ++ dose(2, 0, 10))
    assert(r === ((30L, 15L, 3L, 19333333L, false, true)))
  }

  test("flat rates: num = 0, no trend") {
    val r = ca(dose(0, 5, 5) ++ dose(1, 5, 5) ++ dose(2, 5, 5))
    assert(r._4 === 0L && !r._5 && !r._6)
  }

  test("all-success margin degenerates (den = 0) without dividing") {
    val r = ca(dose(0, 10, 0) ++ dose(1, 10, 0))
    assert(r._4 === 0L && !r._6)
  }

  private def ev(u: Long, day: Int, typ: String, v: Double) =
    (u, f"2024-01-${day + 1}%02d 12:00:00", typ, v)

  test("nelson-aalen: risk sets, per-step floors, cumulative sums") {
    val events = Seq(
      ev(1, 0, "view", 1.0), ev(1, 2, "purchase", 200.0),
      ev(2, 0, "view", 1.0),
      ev(3, 0, "view", 1.0), ev(3, 3, "click", 1.0),
      ev(4, 0, "view", 1.0), ev(4, 2, "purchase", 200.0),
      ev(5, 0, "view", 1.0), ev(5, 1, "purchase", 200.0),
      ev(6, 0, "view", 1.0), ev(6, 5, "view", 1.0))
      .toDF("user_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val r = graft.llm.EventOps.nelsonAalen(events, "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 150)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // durations: 0 (u2, censored), 1 (u5, event), 2 (u1+u4, events),
    // 3 (u3, censored), 5 (u6, censored); n = 6.
    // t=1: risk 5, d 1 → h 200000, v 40000
    // t=2: risk 4, d 2 → h 700000, v 165000
    assert(r === Seq((1L, 5L, 1L, 200000L, 40000L),
      (2L, 4L, 2L, 700000L, 165000L)))
  }

  test("rmst: area under the hand-built KM staircase") {
    val events = Seq(
      ev(1, 0, "view", 1.0), ev(1, 2, "purchase", 200.0),
      ev(2, 0, "view", 1.0),
      ev(3, 0, "view", 1.0), ev(3, 3, "click", 1.0),
      ev(4, 0, "view", 1.0), ev(4, 2, "purchase", 200.0),
      ev(5, 0, "view", 1.0), ev(5, 1, "purchase", 200.0),
      ev(6, 0, "view", 1.0), ev(6, 5, "view", 1.0))
      .toDF("user_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val r = graft.llm.EventOps.rmst(events, "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 150)
      .as[(Long, Long, Long)].collect().head
    // KM steps: (1, 800000), (2, 400000). Area to τ = 2:
    // 10⁶·1 + 800000·1 = 1800000 ppm-days
    assert(r === ((2L, 1800000L, 400000L)))
  }

  test("hazard exceeds −ln(KM) never: additive ≥ product step relation") {
    // at a single event time the NA step d/n ≥ the KM drop's −ln; on
    // the micro grid we pin the coarse invariant H ≥ 1 − S directly
    val events = Seq(
      ev(1, 0, "view", 1.0), ev(1, 2, "purchase", 200.0),
      ev(2, 0, "view", 1.0), ev(2, 4, "view", 1.0))
      .toDF("user_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val cond = col("event_type") === "purchase" && col("value") > 150
    val na = graft.llm.EventOps.nelsonAalen(events, "user_id", "ts", cond)
      .select("h_cum_micro").as[Long].collect().head
    val km = graft.llm.EventOps.kaplanMeier(events, "user_id", "ts", cond)
      .select("s_ppm").as[Long].collect().head
    assert(na >= 1000000L - km)
  }
}
