package graft

import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** X360 temperature mixture: hand-computed α = ½ apportionment, the
  * exact-sum invariant for all three columns, and the compression
  * order (uniform ≤ temp ≤ prop on the big source, reversed on the
  * small one).
  */
class TemperatureMixSpec extends SparkSpec {

  import spark.implicits._

  private def mix(rows: Seq[(String, Long)], budget: Int) =
    TextOps.temperatureMix(
      rows.toDF("source", "t"), "source", col("t"), budget)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq

  test("hand-computed α = ½ seats: 100 vs 400 tokens, budget 1000") {
    // sqrt shares 10:20 → quotas (333, 666), one leftover seat goes
    // to the larger remainder (b) → (333, 667); prop (200, 800),
    // uniform (500, 500)
    val r = mix(Seq(("a", 100L), ("b", 400L)), 1000)
    assert(r === Seq(("a", 1L, 100L, 200L, 333L, 500L),
      ("b", 1L, 400L, 800L, 667L, 500L)))
  }

  test("each allocation column sums to the budget exactly") {
    val r = mix(Seq(("a", 17L), ("b", 313L), ("c", 71L), ("d", 999L),
      ("e", 3L)), 99991)
    assert(r.map(_._4).sum === 99991L)
    assert(r.map(_._5).sum === 99991L)
    assert(r.map(_._6).sum === 99991L)
  }

  test("temperature compresses: tail lifted above prop, head below") {
    val r = mix(Seq(("big", 10000L), ("tiny", 100L)), 10000)
    val big = r.find(_._1 == "big").get
    val tiny = r.find(_._1 == "tiny").get
    assert(big._6 <= big._5 && big._5 <= big._4)
    assert(tiny._4 <= tiny._5 && tiny._5 <= tiny._6)
  }

  test("multi-doc sources aggregate tokens before sharing") {
    val r = TextOps.temperatureMix(
      Seq(("a", 50L), ("a", 50L), ("b", 400L)).toDF("source", "t"),
      "source", col("t"), 1000)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.find(_._1 == "a").get._2 === 2L)
    assert(r.find(_._1 == "a").get._3 === 100L)
    assert(r.map(_._5) === mix(Seq(("a", 100L), ("b", 400L)), 1000)
      .map(_._5))
  }
}
