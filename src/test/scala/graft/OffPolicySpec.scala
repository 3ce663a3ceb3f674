package graft

import java.sql.Timestamp
import graft.llm.EventOps

/** Hand-checked semantics for X261 off-policy evaluation — the train
  * argmax policy, train-estimated propensities, and the exact DM /
  * IPS / SNIPS integer arithmetic.
  */
class OffPolicySpec extends SparkSpec {

  import spark.implicits._

  // Mondays (Spark dayofweek = 2): train side 2024-01-01, eval side
  // 2024-01-22 (>= the 16th split)
  private val trTs = Timestamp.valueOf("2024-01-01 12:00:00")
  private val evTs = Timestamp.valueOf("2024-01-22 12:00:00")

  private def run(rows: Seq[(Timestamp, String, Double)]) =
    EventOps.offPolicyValue(rows.toDF("ts", "event_type", "value"),
        "ts", "event_type", "value", "2024-01-16")
      .select("context", "pi_action", "n_eval", "n_match", "dm_micro",
        "ips_micro", "snips_micro", "dr_micro")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("hand case: argmax policy, exact DM / IPS / SNIPS / DR") {
    // train: a has mean 15 (10, 20), b mean 5 (x4) -> pi = a,
    // n_tr_ctx = 6, n_tr_match = 2
    // eval: one a at 30, three b -> n_ctx = 4, n_match = 1
    val rows = Seq((trTs, "a", 10.0), (trTs, "a", 20.0)) ++
      Seq.fill(4)((trTs, "b", 5.0)) ++
      Seq((evTs, "a", 30.0)) ++ Seq.fill(3)((evTs, "b", 1.0))
    val got = run(rows)
    // ips_term = 30e6*6/2 = 90e6 -> ips = 90e6/4; w_term = 1*6e6/2 =
    // 3e6 -> snips = 90e6*1e6/3e6 = 30e6 (the matched mean);
    // dr_total = 4*15e6 + (30e6 - 15e6)*6/2 = 105e6 -> dr = 26.25e6
    assert(got("2") === ("2", "a", 4L, 1L, 15000000L, 22500000L,
      30000000L, 26250000L))
    assert(got("__ALL__") === ("__ALL__", "-", 4L, 1L, 15000000L,
      22500000L, 30000000L, 26250000L))
  }

  test("no matching eval rows: IPS/SNIPS zero, DR falls back to DM") {
    val rows = Seq((trTs, "a", 10.0), (trTs, "b", 1.0),
      (evTs, "b", 9.0), (evTs, "b", 9.0))
    val got = run(rows)
    assert(got("2")._2 === "a")
    assert(got("2")._4 === 0L && got("2")._6 === 0L && got("2")._7 === 0L)
    // DM still reports the train-model view; with no matched rows the
    // DR residual correction is zero, so DR == DM exactly
    assert(got("2")._5 === 10000000L)
    assert(got("2")._8 === 10000000L)
  }

  test("negative residual: DR truncates toward zero like both engines") {
    // train: a mean 20 (n_tr_ctx 3, n_tr_match 2); eval: one a at 10
    // -> residual (10e6 - 20e6)*3/2 = -15e6; dr_total = 1*20e6 - 15e6
    // = 5e6; dr = 5e6/1
    val rows = Seq((trTs, "a", 20.0), (trTs, "a", 20.0),
      (trTs, "b", 1.0), (evTs, "a", 10.0))
    val got = run(rows)
    assert(got("2")._8 === 5000000L)
  }

  test("train-mean ties break action-ascending") {
    val rows = Seq((trTs, "zz", 7.0), (trTs, "aa", 7.0),
      (evTs, "aa", 7.0))
    val got = run(rows)
    assert(got("2")._2 === "aa")
  }

  test("all-negative rewards: every reward division truncates toward zero") {
    // train: a rewards -10, -10, -11 (mean trunc(-31e6/3) = -10333333;
    // floor would give -10333334), b -100 -> pi = a, n_tr_ctx 4,
    // n_tr_match 3; eval: one a at -5.
    // ips_term = trunc(-5e6*4/3) = -6666666 (floor: -6666667)
    // w_term   = floor(1*4e6/3)  =  1333333 (counts, floor == trunc)
    // snips    = trunc(-6666666e6/1333333) = -5000000 (floor: -5000001)
    // dr_total = -10333333 + trunc((-5e6 + 10333333)*4/3) = -3222223
    val rows = Seq((trTs, "a", -10.0), (trTs, "a", -10.0),
      (trTs, "a", -11.0), (trTs, "b", -100.0), (evTs, "a", -5.0))
    val got = run(rows)
    assert(got("2") === ("2", "a", 1L, 1L, -10333333L, -6666666L,
      -5000000L, -3222223L))
    assert(got("__ALL__") === ("__ALL__", "-", 1L, 1L, -10333333L,
      -6666666L, -5000000L, -3222223L))
  }
}
