package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.llm.EventOps

/** X290 tabular CUSUM: closed-form pair max ≡ the textbook recursion,
  * alarm on sustained drift, reset behavior, and side selectivity.
  */
class CusumTabularSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("cusum: closed form equals the textbook recursion on a planted drift") {
    // days 1..14: 10.00 baseline, days 8+ drift to 13.00
    val vals = (1 to 14).map(d => if (d >= 8) 13.0 else 10.0)
    val ev = vals.zipWithIndex.map { case (v, i) => (ts(i + 1), "a", v) }
      .toDF("ts", "event_type", "value")
    val got = EventOps.cusumTabular(ev, "ts", "event_type", "value",
        baseDays = 7, kPermille = 50, hPermille = 250)
      .select("day", "y", "cusum_high_micro", "cusum_low_micro",
        "alarm_high")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1)
    // textbook recursion in exact micro ints
    val cents = vals.map(v => math.floor(v * 100 + 0.5).toLong)
    val mu0 = cents.take(7).sum * 1000000L / 7
    val k = mu0 * 50 / 1000
    var sHi = 0L; var sLo = 0L
    val want = cents.map { c =>
      sHi = math.max(0L, sHi + c * 1000000L - (mu0 + k))
      sLo = math.max(0L, sLo + (mu0 - k) - c * 1000000L)
      (sHi, sLo)
    }
    got.zip(want).foreach { case (g, (hi, lo)) =>
      assert(g._3 === hi && g._4 === lo, s"day ${g._1}: $g vs ($hi, $lo)")
    }
    // the sustained +30% drift must trip the 25% alarm within the window
    assert(got.exists(_._5), "alarm_high never fired on a 30% drift")
    // and never before the drift starts
    assert(got.take(7).forall(!_._5))
  }

  test("cusum: a single spike decays back to zero (reset behavior)") {
    // mu0 = 1e9, k = 5e7: a 12.00 spike adds 1.5e8 to S+, and each
    // clean 10.00 day drains 5e7 -> exactly zero three days later
    val vals = (1 to 12).map(d => if (d == 9) 12.0 else 10.0)
    val ev = vals.zipWithIndex.map { case (v, i) => (ts(i + 1), "a", v) }
      .toDF("ts", "event_type", "value")
    val got = EventOps.cusumTabular(ev, "ts", "event_type", "value",
        baseDays = 7, kPermille = 50, hPermille = 250)
      .select("day", "cusum_high_micro")
      .as[(String, Long)].collect().sortBy(_._1)
    assert(got(8)._2 === 150000000L) // the spike registers
    assert(got(10)._2 === 50000000L) // draining
    assert(got.last._2 === 0L,       // fully reset, not sticky
      s"S+ did not reset: ${got.last}")
  }

  test("cusum: downward drift fires the low side, not the high side") {
    val vals = (1 to 14).map(d => if (d >= 8) 7.0 else 10.0)
    val ev = vals.zipWithIndex.map { case (v, i) => (ts(i + 1), "a", v) }
      .toDF("ts", "event_type", "value")
    val got = EventOps.cusumTabular(ev, "ts", "event_type", "value",
        baseDays = 7, kPermille = 50, hPermille = 250)
      .select("day", "alarm_high", "alarm_low")
      .as[(String, Boolean, Boolean)].collect().sortBy(_._1)
    assert(got.exists(_._3), "alarm_low never fired on a -30% drift")
    assert(got.forall(!_._2))
  }
}
