package graft

import java.sql.Timestamp
import graft.llm.EventOps

/** Hand-checked semantics for X264 exact 1-D Wasserstein drift — the
  * CDF-difference integral over the cents histogram.
  */
class EmdDriftSpec extends SparkSpec {

  import spark.implicits._

  private val pre = Timestamp.valueOf("2024-01-02 00:00:00")
  private val post = Timestamp.valueOf("2024-01-20 00:00:00")

  private def run(rows: Seq[(Timestamp, String, Double)]) =
    EventOps.emdDrift(rows.toDF("ts", "event_type", "value"),
        "event_type", "value", "ts", "2024-01-16")
      .select("event_type", "n_pre", "n_post", "emd_micro")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("identical distributions: W1 exactly zero") {
    val rows = Seq(1.0, 2.5, 7.0).flatMap(v =>
      Seq((pre, "a", v), (post, "a", v)))
    assert(run(rows)("a")._4 === 0L)
  }

  test("point masses: W1 is exactly the shift distance") {
    val rows = Seq.fill(3)((pre, "a", 10.0)) ++
      Seq.fill(3)((post, "a", 35.0))
    assert(run(rows)("a")._4 === 25000000L)
  }

  test("half the mass moving distance 1 costs exactly 0.5") {
    // pre {0, 1}, post {1, 1}
    val rows = Seq((pre, "a", 0.0), (pre, "a", 1.0),
      (post, "a", 1.0), (post, "a", 1.0))
    assert(run(rows)("a")._4 === 500000L)
  }

  test("unbalanced sample sizes stay exact via cross-multiplied CDFs") {
    // pre {0} (n=1), post {2, 2, 2, 2} (n=4): W1 = 2 exactly
    val rows = Seq((pre, "a", 0.0)) ++ Seq.fill(4)((post, "a", 2.0))
    assert(run(rows)("a")._4 === 2000000L)
  }

  test("a metric missing one half is excluded, others unaffected") {
    val rows = Seq((pre, "only_pre", 1.0), (pre, "b", 1.0),
      (post, "b", 1.0))
    val got = run(rows)
    assert(!got.contains("only_pre"))
    assert(got("b")._4 === 0L)
  }
}
