package graft

import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** X342 Distinct-n: hand-computed diversity ratios on a planted
  * repetitive vs diverse pair — repetition craters Distinct-2 while
  * Distinct-1 barely moves, which is why the metric exists — via the
  * same expressions the query registers.
  */
class DistinctNgramsSpec extends SparkSpec {

  import spark.implicits._

  private def dist(docs: Seq[(String, String)]) = {
    val d = docs.toDF("source", "text")
      .select(col("source"), TextOps.words(col("text")).as("_w"))
    (1 to 3).map { n =>
      d.select(col("source"),
          explode(TextOps.shinglesFromWords(col("_w"), n)).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as("t"), countDistinct("g").as("u"))
        .select(col("source"), lit(n.toLong).as("n"), col("t"), col("u"),
          expr("(u * 1000000) div t").as("m"))
    }.reduce(_ unionByName _)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
  }

  test("repetition craters Distinct-2; diversity keeps it high") {
    val out = dist(Seq(
      ("rep", "a b a b a b"), // bigrams: ab,ba,ab,ba,ab -> 2/5
      ("div", "a b c d e f"))) // bigrams all distinct -> 5/5
    assert(out(("rep", 1L)) === ((6L, 2L, 333333L)))
    assert(out(("rep", 2L)) === ((5L, 2L, 400000L)))
    assert(out(("div", 2L)) === ((5L, 5L, 1000000L)))
    assert(out(("div", 3L)) === ((4L, 4L, 1000000L)))
  }

  test("docs shorter than n contribute nothing at that n") {
    val out = dist(Seq(("s", "only two")))
    assert(out(("s", 2L)) === ((1L, 1L, 1000000L)))
    assert(!out.contains(("s", 3L)))
  }
}
