package graft

import org.apache.spark.sql.functions._

/** X386–X388 query-level invariants (the operators are inline query
  * plans; their exact values are pinned by the DuckDB oracles — these
  * specs pin the STRUCTURAL contracts a hash can't name).
  */
class SpanWalkVoptSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.queries.LlmSurface.queries(name)(spark, dir)

  test("span corruption: block accounting and offset-stream bounds") {
    val rows = q("llm_span_corruption")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((_, n, s, corr, in, tgt, ssum) <- rows) {
      assert(s === n / 20)
      assert(corr === 3 * s && in === n - 2 * s)
      assert(tgt === (if (s > 0) 4 * s + 1 else 0L))
      // every block's span start lies in [20b+1, 20b+18]
      val lo = (0L until s).map(20 * _ + 1).sum
      val hi = (0L until s).map(20 * _ + 18).sum
      assert(ssum >= lo && ssum <= hi, s"offset sum $ssum not in [$lo,$hi]")
    }
    assert(rows.exists(_._3 > 0), "no doc long enough to corrupt")
  }

  test("graph walks: 5 steps per seed, step 0 is the seed, replayable") {
    val run = () => q("llm_graph_walks")
      .as[(Long, Int, Long)].collect().toSeq
    val rows = run()
    assert(rows.nonEmpty)
    val bySeed = rows.groupBy(_._1)
    for ((seed, ws) <- bySeed) {
      assert(ws.map(_._2).sorted === (0 to 4), s"seed $seed missing steps")
      assert(ws.find(_._2 == 0).get._3 === seed)
    }
    assert(rows === run(), "walks must be bit-replayable")
  }

  test("v-opt histogram: 4 contiguous buckets tiling the calendar," +
      " never worse than the equal-width split") {
    val bks = q("p_vopt_histogram")
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
    assert(bks.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(bks.forall(_._5 >= 0L))
    // contiguity: bucket b+1 starts the day after bucket b ends
    for (Array(a, b) <- bks.sliding(2)) {
      assert(java.time.LocalDate.parse(b._2) ===
        java.time.LocalDate.parse(a._3).plusDays(1))
    }
    // optimality sanity vs the equal-width 4-split on the same series
    val daily = graft.queries.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
      .orderBy("day").as[(java.sql.Date, Long)].collect()
    val xs = daily.map(_._2)
    def sse6(seg: Array[Long]): BigInt = {
      val p = seg.map(BigInt(_)).sum
      val qq = seg.map(v => BigInt(v) * v).sum
      qq * 1000000 - (p * p * 1000000) / seg.length
    }
    val c = xs.length
    val cuts = (1 to 3).map(k => k * c / 4)
    val equal = Seq((0, cuts(0)), (cuts(0), cuts(1)), (cuts(1), cuts(2)),
      (cuts(2), c)).map { case (a, b) => sse6(xs.slice(a, b)) }.sum
    val opt = bks.map(b => BigInt(b._5)).sum
    assert(opt <= equal, s"DP total $opt worse than equal-width $equal")
  }
}
