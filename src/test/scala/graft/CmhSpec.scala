package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.llm.EventOps

/** Hand-checked semantics for X273 CMH — per-stratum E/V/OR micro
  * terms, the pooled chi-square and MH odds ratio, and the
  * degenerate-stratum exclusion.
  */
class CmhSpec extends SparkSpec {

  import spark.implicits._

  private val mon = Timestamp.valueOf("2024-01-01 10:00:00") // dow 2
  private val tue = Timestamp.valueOf("2024-01-02 10:00:00") // dow 3
  private val wed = Timestamp.valueOf("2024-01-03 10:00:00") // dow 4

  private def ev(ts: Timestamp, uid: Long, t: String) = (ts, uid, t)

  private def run(rows: Seq[(Timestamp, Long, String)]) =
    EventOps.cmhStratified(rows.toDF("ts", "user_id", "event_type"),
        "user_id", "ts", col("event_type") === "purchase")
      .select("stratum", "a", "b", "c", "d", "e_mu", "v_mu",
        "chi2_micro", "or_mh", "reject")
      .collect().map(r => r.getString(0) -> r).toMap

  test("two-stratum textbook case: exact terms, chi2 and OR") {
    val rows = Seq(
      // Monday: arm1 2/4 convert, arm0 1/4
      ev(mon, 1L, "purchase"), ev(mon, 3L, "purchase"),
      ev(mon, 5L, "view"), ev(mon, 7L, "view"),
      ev(mon, 2L, "purchase"), ev(mon, 4L, "view"),
      ev(mon, 6L, "view"), ev(mon, 8L, "view"),
      // Tuesday: 1/2 in each arm
      ev(tue, 9L, "purchase"), ev(tue, 11L, "view"),
      ev(tue, 10L, "purchase"), ev(tue, 12L, "view"))
    val got = run(rows)
    val m = got("2")
    assert((m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4))
      === ((2L, 2L, 1L, 3L)))
    assert(m.getLong(5) === 1500000L) // E = 4*3/8
    assert(m.getLong(6) === 535714L)  // V = 240/448
    val t = got("3")
    assert(t.getLong(5) === 1000000L && t.getLong(6) === 333333L)
    val s = got("__CMH__")
    // chi2 = (3e6 - 2.5e6)^2 div 869047 = 287671 micro; OR = 2.0
    assert(s.getLong(7) === 287671L)
    assert(s.getDouble(8) === 2.0)
    assert(!s.getBoolean(9))
  }

  test("a single-event stratum is excluded from detail and sums") {
    val rows = Seq(
      ev(mon, 1L, "purchase"), ev(mon, 2L, "view"),
      ev(wed, 3L, "purchase")) // n = 1 -> V undefined -> dropped
    val got = run(rows)
    assert(got.keySet === Set("2", "__CMH__"))
  }
}
