package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.llm.EventOps

/** userJourneys and latencyHistogram: hand-checked session paths (gap
  * split, in-session order, same-timestamp tie-break) and exact
  * power-of-2 bucket boundaries.
  */
class JourneyLatencySpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("journeys: gap splits sessions, paths count across users") {
    val ev = Seq(
      // user 1, session 1: view > click ; session 2 (gap > 30m): view
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "view"),
      // user 2: view > click (same path as user 1 session 1)
      (4L, ts("2024-01-02 09:00:00"), 2L, "view"),
      (5L, ts("2024-01-02 09:10:00"), 2L, "click"),
      // user 3: same-timestamp events order by event_id: a then b
      (7L, ts("2024-01-03 08:00:00"), 3L, "b"),
      (6L, ts("2024-01-03 08:00:00"), 3L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.userJourneys(ev, "user_id", "ts", "event_id",
      "event_type", gapMinutes = 30, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(
      ("view>click", 2L), ("a>b", 1L), ("view", 1L)))
  }

  test("latency buckets sit exactly on powers of two") {
    def ev(id: Long, secs: Int) =
      (id, new Timestamp(1700000000000L + secs * 1000L), 1L)
    // deltas between consecutive events: 1, 2, 3, 4, 7, 8, 0
    val rows = Seq(0, 1, 3, 6, 10, 17, 25, 25).zipWithIndex
      .map { case (s, i) => ev(i.toLong, s) }
    val df = rows.toDF("event_id", "ts", "user_id")
    val got = EventOps.latencyHistogram(df, "user_id", "ts", "event_id")
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(
      (0, 1L, 0L, 0L),   // the duplicate-timestamp delta
      (1, 1L, 1L, 1L),   // dt=1 -> bin "1", length 1
      (2, 2L, 2L, 3L),   // dt in {2,3} -> length 2
      (3, 2L, 4L, 7L),   // dt in {4,7} -> length 3 (7 stays, 8 doesn't)
      (4, 1L, 8L, 8L)))  // dt=8 -> "1000", length 4
  }
}
