package graft

import java.sql.Timestamp
import graft.llm.EventOps

/** Hand-checked semantics for X274 interrupted time series — exact
  * recovery of planted level and slope changes at the break.
  */
class ItsSpec extends SparkSpec {

  import spark.implicits._

  // one event per day, x = days from the 2024-01-16 break
  private def day(x: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${16 + x}%02d 10:00:00")

  private def run(pre: Int => Double, post: Int => Double) = {
    val rows = (-15 to -1).map(x => (day(x), pre(x))) ++
      (0 to 14).map(x => (day(x), post(x)))
    EventOps.interruptedTimeSeries(rows.toDF("ts", "value"), "ts",
        "value", "2024-01-16")
      .select("n_pre", "n_post", "pre_slope", "post_slope", "pre_level",
        "post_level", "level_change", "slope_change")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .collect().head
  }

  test("pure level jump on an exact line is recovered exactly") {
    val got = run(x => 100.0 + 2 * x, x => 150.0 + 2 * x)
    assert(got === ((15L, 15L, 2.0, 2.0, 100.0, 150.0, 50.0, 0.0)))
  }

  test("pure slope change: level holds, trend bends") {
    val got = run(_ => 100.0, x => 100.0 + 5 * x)
    assert(got === ((15L, 15L, 0.0, 5.0, 100.0, 100.0, 0.0, 5.0)))
  }
}
