package graft

import java.sql.Timestamp
import graft.llm.EventOps

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("retentionMatrix matches a hand-computed cohort table") {
    // cohort day1: users 1,2 (u1 returns day2; u2 returns day3)
    // cohort day2: user 3 (never returns)
    // repeated same-day events must not inflate counts
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 17:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 08:00:00")),
      (3L, ts("2024-01-02 12:00:00")), (3L, ts("2024-01-02 13:00:00")),
      (2L, ts("2024-01-03 11:00:00"))).toDF("user_id", "ts")
    val got = EventOps.retentionMatrix(ev, "user_id", "ts", maxOffset = 7)
      .orderBy("cohort_day", "day_offset")
      .as[(String, Int, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 2L, 1L, 0.5),
      ("2024-01-01", 2, 2L, 1L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0)))
  }

  test("retentionMatrix offset-0 diagonal is always exactly 1.0") {
    val ev = (0 until 200)
      .map(i => (i.toLong % 23, ts(f"2024-01-${1 + i % 9}%02d 06:00:00")))
      .toDF("user_id", "ts")
    val diag = EventOps.retentionMatrix(ev, "user_id", "ts", maxOffset = 3)
      .filter($"day_offset" === 0)
      .select("retention").as[Double].collect()
    assert(diag.nonEmpty && diag.forall(_ === 1.0))
  }

  test("maxOffset bounds the matrix width") {
    val ev = (0 until 60)
      .map(i => (1L, ts(f"2024-01-${1 + i % 30}%02d 06:00:00")))
      .toDF("user_id", "ts")
    val offs = EventOps.retentionMatrix(ev, "user_id", "ts", maxOffset = 5)
      .select("day_offset").as[Int].collect()
    assert(offs.max === 5 && offs.min === 0)
  }
}
