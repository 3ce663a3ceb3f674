package graft

import graft.llm.EventOps
import org.apache.spark.sql.functions._

/** Holt linear-trend smoothing: closed-form pin — on an exactly linear
  * daily series the recurrence tracks with ZERO error and extrapolates
  * the line (init l₁=y₁, b₁=y₂−y₁ makes every f_t = y_t exactly, and
  * the integer divisions stay remainder-free).
  */
class HoltForecastSpec extends SparkSpec {

  test("linear series: zero in-sample error, forecasts continue the line") {
    val s = spark
    import s.implicits._
    // day t (0-based) has y_t = 10 + 2t events
    val rows = for {
      t <- 0 until 10
      k <- 0 until (10 + 2 * t)
    } yield (f"2024-03-${t + 1}%02d 12:00:$k%02d", k.toLong)
    val events = rows.toDF("ts_s", "k")
      .select(to_timestamp(col("ts_s")).as("ts"), col("k"))
    val out = EventOps.holtLinear(events, "ts", horizon = 3).collect()
    assert(out.length === 13)
    val hist = out.filter(!_.isNullAt(1))
    // every one-step error from t=2 on is exactly zero
    hist.drop(1).foreach { r =>
      assert(r.getLong(5) === 0L, s"expected exact tracking, got $r")
    }
    // trend locks to 2/day in micro-units
    assert(hist.last.getLong(3) === 2000000L)
    // forecasts continue the line: y_9 = 28 → 30, 32, 34
    val fc = out.filter(_.isNullAt(1)).map(r => (r.getString(0), r.getLong(4)))
    assert(fc.toSeq === Seq(
      ("2024-03-11", 30000000L), ("2024-03-12", 32000000L),
      ("2024-03-13", 34000000L)))
  }

  test("constant series: level pinned, trend zero") {
    val s = spark
    import s.implicits._
    val rows = for { t <- 0 until 5; k <- 0 until 7 }
      yield (f"2024-03-${t + 1}%02d 01:00:$k%02d", k)
    val events = rows.toDF("ts_s", "k")
      .select(to_timestamp(col("ts_s")).as("ts"))
    val out = EventOps.holtLinear(events, "ts", horizon = 2).collect()
    out.filter(!_.isNullAt(1)).foreach { r =>
      assert(r.getLong(2) === 7000000L && r.getLong(3) === 0L)
    }
    out.filter(_.isNullAt(1)).foreach(r => assert(r.getLong(4) === 7000000L))
  }
}
