package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.llm.EventOps
import graft.operators.BipartiteProjection

/** Capped bipartite projection and rolling engagement: hand-checked
  * semantics, whale-basket capping, window-explode vs by-hand WAU.
  */
class EngagementProjectionSpec extends SparkSpec {

  import spark.implicits._

  test("projection: weights count baskets, whale basket capped at C(cap,2)") {
    val rel = Seq(
      (1L, 10L), (1L, 20L),             // basket 1: {10,20}
      (2L, 10L), (2L, 20L), (2L, 30L),  // basket 2: {10,20,30}
      (3L, 10L), (3L, 20L),             // basket 3 dup rows collapse
      (3L, 10L),
      // whale basket: items 100..109, cap 3 keeps {100,101,102}
      (9L, 100L), (9L, 101L), (9L, 102L), (9L, 103L), (9L, 104L),
      (9L, 105L), (9L, 106L), (9L, 107L), (9L, 108L), (9L, 109L))
      .toDF("b", "i")
    val got = BipartiteProjection.project(rel, "b", "i", cap = 3,
      minWeight = 1)
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (10L, 20L, 3L),    // baskets 1, 2, 3
      (10L, 30L, 1L), (20L, 30L, 1L),
      (100L, 101L, 1L), (100L, 102L, 1L), (101L, 102L, 1L)))
    // whale emitted C(3,2)=3 pairs, not C(10,2)=45
    assert(got.count(p => p._1 >= 100L) === 3)
    // minWeight prunes the tail
    val pruned = BipartiteProjection.project(rel, "b", "i", 3, 2)
      .collect()
    assert(pruned.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((10L, 20L)))
  }

  test("rolling engagement: WAU unions the trailing week, DAU distinct") {
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // day 1: users 1,2 ; day 3: user 2 (twice) ; day 9: user 3
    val ev = Seq(
      (1L, ts(1), 1L), (2L, ts(1), 2L),
      (3L, ts(3), 2L), (4L, ts(3), 2L),
      (5L, ts(9), 3L))
      .toDF("event_id", "ts", "user_id")
    val got = EventOps.rollingEngagement(ev, "user_id", "ts")
      .orderBy("day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 2L),  // leading window: counts what exists
      ("2024-01-03", 1L, 2L),  // week covers days 1-3: users {1,2}
      ("2024-01-09", 1L, 2L))) // days 3-9: users {2 (day 3), 3 (day 9)}
  }
}
