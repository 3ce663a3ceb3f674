package graft

import java.sql.Timestamp
import graft.llm.EventOps

/** Hand-checked semantics for X260 RFM quintile segmentation — the
  * histogram-walked boundaries, value-based tie scoring, recency
  * inversion, and exact cents totals.
  */
class RfmSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2020-01-$day%02d 00:00:00")

  private def run(rows: Seq[(Long, Timestamp, Double)]) =
    EventOps.rfmSegments(rows.toDF("cust", "ts", "value"),
        "cust", "ts", "value")
      .select("r_score", "f_score", "m_score", "n_customers", "f_total",
        "m_cents_total")
      .as[(Int, Int, Int, Long, Long, Long)].collect()

  test("five distinct customers land on the 1..5 diagonal") {
    // customer k: k orders on day k at 10k each -> r_days = 5-k,
    // f = k, m_cents = 1000k^2; all three dimensions rank k-th
    val rows = (1 to 5).flatMap { k =>
      Seq.fill(k)((k.toLong, ts(k), 10.0 * k))
    }
    val got = run(rows)
    assert(got.length === 5)
    (1 to 5).foreach { k =>
      val row = got.find(r => r._1 == k && r._2 == k && r._3 == k)
      assert(row.isDefined, s"missing diagonal segment $k: ${got.toSeq}")
      val r = row.get
      assert(r._4 === 1L)
      assert(r._5 === k.toLong)
      assert(r._6 === 1000L * k * k)
    }
  }

  test("all-tied customers share one segment with top recency") {
    // identical behavior: every boundary equals the value, v > t is
    // false everywhere -> f/m score 1, recency inverts to 5
    val rows = (1L to 4L).map(c => (c, ts(7), 5.0))
    val got = run(rows)
    assert(got.toSeq === Seq((5, 1, 1, 4L, 4L, 2000L)))
  }

  test("cents are exact through quantization") {
    // 19.99 + 0.02 = 2001 cents, the classic float trap
    val rows = Seq((1L, ts(1), 19.99), (1L, ts(2), 0.02),
      (2L, ts(2), 1.0))
    val got = run(rows)
    assert(got.map(_._6).sum === 2001L + 100L)
  }
}
