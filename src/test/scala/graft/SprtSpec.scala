package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.llm.EventOps

/** Hand-checked semantics for X269 SPRT — the driver-folded constants
  * and the exact integer LLR walk.
  */
class SprtSpec extends SparkSpec {

  import spark.implicits._

  test("folded constants are the pinned integers") {
    // pin literal values so a formula drift fails loudly
    assert(EventOps.sprtUpperMicro(0.05, 0.05) === 2944439L)
    assert(EventOps.sprtLowerMicro(0.05, 0.05) === -2944439L)
    assert(EventOps.sprtIncrementsMicro(0.10, 0.12) ===
      ((182321L, -22473L)))
    // symmetric hypotheses floor asymmetrically — the exactness trap
    assert(EventOps.sprtIncrementsMicro(0.25, 0.75) ===
      ((1098612L, -1098613L)))
  }

  test("two-day walk: exact LLR and the H0 decision") {
    val d1 = Timestamp.valueOf("2024-01-01 10:00:00")
    val d2 = Timestamp.valueOf("2024-01-02 10:00:00")
    // day 1: 5/10 successes; day 2: 0/10
    val rows = (1 to 10).map(i => (d1, i <= 5)) ++
      (1 to 10).map(_ => (d2, false))
    val got = EventOps.sprtTrajectory(rows.toDF("ts", "ok"), "ts",
        col("ok"), Seq(("s", 0.25, 0.75)))
      .select("day", "n_cum", "k_cum", "llr_micro", "verdict")
      .as[(java.sql.Date, Long, Long, Long, String)].collect()
      .sortBy(_._1.toString)
    // day 1: 5·1098612 + 5·(−1098613) = −5 -> continue
    assert(got(0)._4 === -5L && got(0)._5 === "continue")
    // day 2 cum: 5·1098612 + 15·(−1098613) = −10986135 -> accept_h0
    assert(got(1)._4 === -10986135L && got(1)._5 === "accept_h0")
  }
}
