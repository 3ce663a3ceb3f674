package graft

import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Hand-checked semantics for X268 Neyman allocation — the probed
  * integer sqrt, exact variance scaling, and largest-remainder
  * apportionment.
  */
class NeymanSpec extends SparkSpec {

  import spark.implicits._

  test("isqrt is exact on and around perfect squares") {
    val xs = Seq(0L, 1L, 2L, 3L, 4L, 99L, 100L, 999999L, 1000000L,
      999999999999L, 1000000000000L, 1000000000001L)
    val got = xs.toDF("x").select(TextOps.isqrt(col("x")).as("s"))
      .as[Long].collect().toSeq
    val want = xs.map(x => math.sqrt(x.toDouble).toLong)
      .map(identity) // spot value checks below pin the edges
    assert(got === Seq(0L, 1L, 1L, 1L, 2L, 9L, 10L, 999L, 1000L,
      999999L, 1000000L, 1000000L))
    assert(want.length === got.length)
  }

  private def run(rows: Seq[(String, Long)], budget: Int) =
    TextOps.neymanAllocation(rows.toDF("source", "len"), "source",
        col("len"), budget)
      .select("source", "n_docs", "sigma_micro", "alloc_prop",
        "alloc_neyman")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("variance-free stratum draws zero under Neyman, not proportional") {
    // A: {0, 10} -> sigma exactly 5; B: {7, 7} -> sigma 0
    val got = run(Seq("a" -> 0L, "a" -> 10L, "b" -> 7L, "b" -> 7L), 10)
    assert(got("a") === (("a", 2L, 5000000L, 5L, 10L)))
    assert(got("b") === (("b", 2L, 0L, 5L, 0L)))
  }

  test("largest remainder: seats sum exactly, ties break by stratum") {
    val rows = Seq("a", "b", "c").flatMap(s => Seq(s -> 1L, s -> 3L))
    val got = run(rows, 10)
    val props = got.values.map(_._4).toSeq
    assert(props.sum === 10L)
    // equal shares: floors 3,3,3, one remainder seat to the smallest key
    assert(got("a")._4 === 4L && got("b")._4 === 3L && got("c")._4 === 3L)
    assert(got.values.map(_._5).sum === 10L)
  }
}
