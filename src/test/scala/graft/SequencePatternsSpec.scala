package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.llm.EventOps

/** sequencePatterns (X285): hand-checked bigram/trigram mining, the
  * INCLUSIVE 30-min gap boundary, the distinct-user dedup that stops a
  * single bot loop from out-ranking a genuinely shared pattern, and the
  * (n_users, n_occurrences, pattern) total order.
  */
class SequencePatternsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, Timestamp, Long, String)], topK: Int = 30) =
    EventOps.sequencePatterns(
      rows.toDF("event_id", "ts", "user_id", "event_type"),
      gapMinutes = 30, topK = topK)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("hand-checked bigrams and trigram from one session") {
    // user 1: a -> b -> c, 1 minute apart: bigrams a>b, b>c; trigram a>b>c
    val got = run(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "c")))
    assert(got.toSet === Set(
      ("a>b", 2, 1L, 1L), ("b>c", 2, 1L, 1L), ("a>b>c", 3, 1L, 1L)))
  }

  test("gap boundary is inclusive: exactly 30 min chains, 30 min + 1 s breaks") {
    val got = run(Seq(
      // user 1: gap exactly 30:00 -> still the same session
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:30:00"), 1L, "b"),
      // user 2: gap 30:01 -> session break, no bigram
      (3L, ts("2024-01-01 10:00:00"), 2L, "a"),
      (4L, ts("2024-01-01 10:30:01"), 2L, "b")))
    assert(got === Seq(("a>b", 2, 1L, 1L)))
  }

  test("trigram requires BOTH consecutive gaps within the threshold") {
    // a->b fine, b->c gap 31 min: bigram a>b survives, trigram a>b>c must not
    val got = run(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "b"),
      (3L, ts("2024-01-01 10:36:00"), 1L, "c")))
    assert(got === Seq(("a>b", 2, 1L, 1L)))
  }

  test("distinct-user support outranks a one-user bot loop") {
    // user 1 mints x>y 5 times; users 2 and 3 each do p>q once.
    // p>q (2 users) must rank above x>y (1 user, 5 occurrences).
    val bot = (0 until 10).map { i =>
      (100L + i, ts(f"2024-01-01 10:${i}%02d:00"), 1L,
        if (i % 2 == 0) "x" else "y")
    }
    val shared = Seq(
      (1L, ts("2024-01-02 10:00:00"), 2L, "p"),
      (2L, ts("2024-01-02 10:01:00"), 2L, "q"),
      (3L, ts("2024-01-03 10:00:00"), 3L, "p"),
      (4L, ts("2024-01-03 10:01:00"), 3L, "q"))
    val got = run(bot ++ shared)
    val pq = got.indexWhere(_._1 == "p>q")
    val xy = got.indexWhere(_._1 == "x>y")
    assert(pq >= 0 && xy >= 0 && pq < xy)
    assert(got(pq) === ("p>q", 2, 2L, 2L))
    assert(got(xy) === ("x>y", 2, 5L, 1L))
  }

  test("same-timestamp events order by the event_id tie-break") {
    val t = ts("2024-01-01 10:00:00")
    val got = run(Seq((2L, t, 1L, "b"), (1L, t, 1L, "a"), (3L, t, 1L, "c")))
    assert(got.toSet === Set(
      ("a>b", 2, 1L, 1L), ("b>c", 2, 1L, 1L), ("a>b>c", 3, 1L, 1L)))
  }

  test("topK truncates under the total order") {
    val got = run(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "c")), topK = 1)
    // all three patterns tie on (n_users=1, n_occurrences=1);
    // lexicographic pattern breaks the tie: a>b < a>b>c < b>c
    assert(got === Seq(("a>b", 2, 1L, 1L)))
  }
}
