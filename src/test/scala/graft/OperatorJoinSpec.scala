package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

class OperatorJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("AsOfJoin.backward: latest at-or-before match per key, null when none") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 12:00:00")),
      (2L, 20L, ts("2024-01-01 09:00:00"))) // user 2 has no references
      .toDF("user_id", "event_id", "ts")
    val ref = Seq(
      (1L, 100L, ts("2024-01-01 09:30:00")),
      (1L, 101L, ts("2024-01-01 10:00:00")), // same ts as probe 10 -> matches (at-or-before)
      (1L, 102L, ts("2024-01-01 11:59:00")))
      .toDF("user_id", "event_id", "ts")
    val got = AsOfJoin
      .backward(probe, ref, Seq("user_id"), "ts", "event_id", Seq("event_id"))
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(10L -> Some(101L), 11L -> Some(102L), 20L -> None))
  }

  test("RangeJoin.pointInInterval equals the naive range join") {
    val points = (0L until 2000L).map(i => (i, i * 7 % 1000)).toDF("pid", "p")
    val intervals = Seq(
      (1L, 0L, 100L), (2L, 50L, 60L), (3L, 990L, 1000L), (4L, 100L, 101L),
      (5L, 0L, 1000L))
      .toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }

  test("RangeJoin: exclusive upper bound at bucket boundaries") {
    val points = Seq((1L, 64L), (2L, 63L), (3L, 128L)).toDF("pid", "p")
    val intervals = Seq((1L, 0L, 64L), (2L, 64L, 128L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // p=64 is excluded from [0,64) and included in [64,128); p=128 matches nothing
    assert(got === Set((1L, 2L), (2L, 1L)))
  }
}
