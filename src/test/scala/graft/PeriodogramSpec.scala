package graft

import org.apache.spark.sql.functions._

/** X365 fixed-period periodogram: the registered query against an
  * independent BigInt mirror of the exact formula on a planted
  * 7-periodic daily series — the weekly bin must dominate.
  */
class PeriodogramSpec extends SparkSpec {

  import spark.implicits._

  // 28 planted daily cent totals: a crisp 7-day pulse train
  private val xs: Seq[Long] =
    (0 until 28).map(d => if (d % 7 == 0) 700L else 0L)

  private lazy val dir = {
    val d = "/tmp/graft_periodogram_fixture"
    xs.zipWithIndex.map { case (cents, day) =>
      (day.toLong, f"2024-02-${day + 1}%02d 09:00:00", day.toLong,
        "view", cents.toDouble / 100.0, "{}")
    }.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def mirror(p: Long): Long = {
    val n = BigInt(xs.size)
    val s = BigInt(xs.sum)
    val z = xs.zipWithIndex.map { case (x, t) => (n * x - s, t.toLong) }
    val trig = graft.queries.LlmSurface.periodogramTrig
      .filter(_._1 == p).map(r => r._2 -> (BigInt(r._3), BigInt(r._4)))
      .toMap
    val a = z.map { case (zv, t) => zv * trig(t % p)._1 }.sum
    val b = z.map { case (zv, t) => zv * trig(t % p)._2 }.sum
    val sz2 = z.map { case (zv, _) => zv * zv }.sum
    (2 * (a * a + b * b) / (n * sz2 * 1000000)).toLong
  }

  test("planted weekly pulse: query matches the BigInt mirror, 7 wins") {
    val got = graft.queries.LlmSurface.queries("p_periodogram")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(7L -> mirror(7), 14L -> mirror(14),
      30L -> mirror(30)))
    // the weekly bin dominates; 14 picks up the harmonic relation but
    // must stay below; 30 (aliased against 28 days) stays low
    assert(got(7L) > got(14L) && got(7L) > got(30L))
    assert(got(7L) > 200000L) // ≥ 20% of the variance at the true period
  }
}
