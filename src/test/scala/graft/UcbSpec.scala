package graft

import java.sql.Timestamp
import graft.llm.EventOps

/** X299 UCB1 replay: seed semantics, exploit/explore balance on a
  * planted two-arm gap, play accounting, and determinism.
  */
class UcbSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  private def run(rows: Seq[(Timestamp, String, Double)], horizon: Int) =
    EventOps.ucbTrajectory(rows.toDF("ts", "event_type", "value"),
        "ts", "event_type", "value", horizon)
      .select("t", "arm", "reward_norm_micro", "ucb_micro", "n_after")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))

  test("two-arm gap: seed plays both, then the good arm dominates " +
    "but the bad arm is still explored") {
    // arm a pays 10.00 every day, arm b pays 5.00 every day
    val rows = (1 to 12).flatMap(d =>
      Seq((ts(d), "a", 10.0), (ts(d), "b", 5.0)))
    val got = run(rows, horizon = 12)
    val seed = got.filter(_._1 == 1)
    assert(seed.map(_._2).toSeq === Seq("a", "b"))
    assert(seed.forall(_._5 === 1L))
    // 2 seed plays + 11 decision plays
    assert(got.length === 13)
    val nA = got.filter(_._2 == "a").map(_._5).max
    val nB = got.filter(_._2 == "b").map(_._5).max
    assert(nA + nB === 13L)
    assert(nA > nB, s"good arm not preferred: a=$nA b=$nB")
    assert(nB >= 2L, s"bad arm never revisited (no exploration): b=$nB")
  }

  test("normalization: the best cell reads exactly 10^6") {
    val rows = Seq((ts(1), "a", 10.0), (ts(1), "b", 5.0),
      (ts(2), "a", 10.0), (ts(2), "b", 5.0))
    val got = run(rows, horizon = 2)
    assert(got.filter(_._1 == 1).find(_._2 == "a").get._3 === 1000000L)
    assert(got.filter(_._1 == 1).find(_._2 == "b").get._3 === 500000L)
  }

  test("bonus table is the folded constant both engines share") {
    // spot values: sqrt(2 ln 4 / 1) and sqrt(2 ln 9 / 3)
    assert(EventOps.ucbBonusMicro(4, 1) ===
      math.floor(math.sqrt(2.0 * math.log(4.0)) * 1e6 + 0.5).toLong)
    assert(EventOps.ucbBonusMicro(9, 3) ===
      math.floor(math.sqrt(2.0 * math.log(9.0) / 3.0) * 1e6 + 0.5).toLong)
  }

  test("deterministic: two replays are identical") {
    val rows = (1 to 10).flatMap(d =>
      Seq((ts(d), "a", 3.0 + d), (ts(d), "b", 9.0 - d / 2.0)))
    assert(run(rows, 10).toSeq === run(rows, 10).toSeq)
  }
}
