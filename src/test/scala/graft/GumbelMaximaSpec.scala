package graft

import org.apache.spark.sql.functions._

/** X368 Gumbel return levels: the registered query against an
  * independent BigInt mirror (exact moments, integer sqrt, the same
  * folded constants) on a planted daily-max series, plus the
  * monotonicity sanity (monthly level above weekly above location).
  */
class GumbelMaximaSpec extends SparkSpec {

  import spark.implicits._

  private val maxima: Seq[Long] = (1 to 10).map(_ * 100L)

  private lazy val dir = {
    val d = "/tmp/graft_gumbel_fixture"
    maxima.zipWithIndex.map { case (cents, day) =>
      (day.toLong, f"2024-03-${day + 1}%02d 12:00:00", day.toLong,
        "view", cents.toDouble / 100.0, "{}")
    }.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def isqrt(x: BigInt): BigInt = {
    var r = BigInt(math.sqrt(x.toDouble).toLong)
    while ((r + 1) * (r + 1) <= x) r += 1
    while (r * r > x) r -= 1
    r
  }

  test("query matches the BigInt mirror; levels order correctly") {
    val n = BigInt(maxima.size)
    val sm = BigInt(maxima.sum)
    val sm2 = maxima.map(m => BigInt(m) * m).sum
    val mean = sm * 1000000 / n
    val varn = (n * sm2 - sm * sm) * BigInt("1000000000000") / (n * (n - 1))
    val sMicro = isqrt(varn)
    val beta = BigInt(7796968) * sMicro / 10000000
    val mu = mean - BigInt(5772157) * beta / 10000000
    def level(c: Long) = (mu + BigInt(c) * beta / 10000000).toLong
    val got = graft.queries.LlmSurface
      .queries("p_gumbel_maxima")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (7L, 10L, mu.toLong, beta.toLong, level(18698247L)),
      (30L, 10L, mu.toLong, beta.toLong, level(33842945L))))
    // the 1-in-30 level must sit above the 1-in-7 level, above μ
    assert(got(1)._5 > got(0)._5 && got(0)._5 > mu.toLong)
  }
}
