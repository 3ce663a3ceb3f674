package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.llm.EventOps

/** markovTransitions: hand-checked bigrams and probabilities, per-row
  * normalization, ^start entry distribution, tie-break determinism.
  */
class MarkovTransitionsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hand-checked paths: counts, probabilities, ^start rows") {
    // user 1: a -> b -> a ; user 2: a -> a
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "a"),
      (4L, ts("2024-01-01 11:00:00"), 2L, "a"),
      (5L, ts("2024-01-01 11:01:00"), 2L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps
      .markovTransitions(ev, "user_id", "ts", "event_id", "event_type")
      .orderBy("prev_type", "next_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("^start", "a", 2L, 1.0),  // both users enter at a
      ("a", "a", 1L, 0.5),       // user 2
      ("a", "b", 1L, 0.5),       // user 1
      ("b", "a", 1L, 1.0)))      // user 1
  }

  test("row probabilities sum to ~1 per prev state on real data") {
    val ev = graft.queries.LlmSurface.queries("llm_markov_transitions")(
      spark, "/root/testdata/sf0.001")
    val sums = ev.groupBy("prev_type").agg(sum("p").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4, s"row sum $s"))
  }

  test("same-timestamp events order by the id tie-break, not arbitrarily") {
    val t = ts("2024-01-01 10:00:00")
    val ev = Seq(
      (2L, t, 1L, "b"), (1L, t, 1L, "a"), (3L, t, 1L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps
      .markovTransitions(ev, "user_id", "ts", "event_id", "event_type")
      .filter(col("prev_type") =!= "^start")
      .orderBy("prev_type")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("a", "b"), ("b", "c")))
  }
}
