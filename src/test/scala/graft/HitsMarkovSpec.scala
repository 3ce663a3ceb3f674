package graft

import org.apache.spark.sql.functions._
import graft.llm.EventOps
import graft.operators.Hits

/** Hand-checked semantics for the round-10 wave-6 graph/attribution
  * ops: HITS hubs-vs-authorities and Markov removal-effect attribution.
  */
class HitsMarkovSpec extends SparkSpec {

  import spark.implicits._

  test("hits: star graph separates the two roles exactly") {
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val got = Hits.run(edges, nodes, iters = 3)
      .as[(Long, Long, Long)].collect().toSet
    // center is the only authority; spokes are the only hubs — and the
    // fixpoint is exact in integer units, so 3 rounds change nothing
    assert(got === Set((0L, 1000000L, 0L), (1L, 0L, 1000000L),
      (2L, 0L, 1000000L), (3L, 0L, 1000000L)))
  }

  test("hits: divide-by-max keeps exact score ratios after one round") {
    // hubs {1,2} → authorities {10,11}; 1 points at both, 2 at 10 only
    val nodes = Seq(1L, 2L, 10L, 11L).toDF("id")
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val got = Hits.run(edges, nodes, iters = 1)
      .as[(Long, Long, Long)].collect()
      .map { case (i, a, h) => i -> ((a, h)) }.toMap
    // a_raw = (2e6, 1e6) → a = (1e6, 5e5); h_raw(1) = 1.5e6, h_raw(2) =
    // 1e6 → h(1) = 1e6, h(2) = 1e6·1e6 div 1.5e6 = 666666
    assert(got(10L) === ((1000000L, 0L)))
    assert(got(11L) === ((500000L, 0L)))
    assert(got(1L) === ((0L, 1000000L)))
    assert(got(2L) === ((0L, 666666L)))
  }

  test("markovRemovalAttribution: hand journeys give exact effects") {
    // u1: view → click → purchase; u2: view (never converts)
    val events = Seq(
      (1L, 1L, 10L, "view"), (1L, 2L, 11L, "click"),
      (1L, 3L, 12L, "purchase"),
      (2L, 1L, 20L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.markovRemovalAttribution(events, "user_id", "ts",
      "event_id", "event_type", convType = "purchase", rounds = 12)
      .as[(String, Long, Option[Long], Option[Double])].collect().toSet
    // chain: ^start→view (p=1); view→{click .5, null .5}; click→conv (1)
    // base p(conv) = .5; removing EITHER channel severs the only path
    assert(got === Set(
      ("__BASE__", 500000L, None, None),
      ("click", 0L, Some(1000000L), Some(0.5)),
      ("view", 0L, Some(1000000L), Some(0.5))))
  }

  test("markovRemovalAttribution: episodes split after each conversion") {
    // one user, two journeys: click→purchase then view (unconverted
    // tail). The post-purchase view must NOT inherit the first
    // journey's credit path.
    val events = Seq(
      (1L, 1L, 10L, "click"), (1L, 2L, 11L, "purchase"),
      (1L, 3L, 12L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.markovRemovalAttribution(events, "user_id", "ts",
      "event_id", "event_type", convType = "purchase", rounds = 12)
      .as[(String, Long, Option[Long], Option[Double])].collect().toSet
    // ^start→{click .5, view .5}; click→conv; view→null ⇒ base = .5;
    // removing click zeroes it (effect 1e6); removing view changes
    // nothing (its only role is the dead tail) — effect 0, share 0
    assert(got === Set(
      ("__BASE__", 500000L, None, None),
      ("click", 0L, Some(1000000L), Some(1.0)),
      ("view", 500000L, Some(0L), Some(0.0))))
  }
}
