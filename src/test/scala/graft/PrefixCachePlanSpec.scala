package graft

import org.apache.spark.sql.functions._

import graft.llm.TextOps
import graft.queries.Tables

/** X320 prefix-cache plan: the bucket contract — 16-word cap,
  * shorter docs bucket on full text, cross-length non-collision,
  * savings arithmetic, and the n ≥ 2 cut — via the same expression
  * the query registers.
  */
class PrefixCachePlanSpec extends SparkSpec {

  import spark.implicits._

  private def plan(docs: Seq[String]) = {
    val ws = TextOps.words(col("text"))
    docs.toDF("text")
      .select(md5(concat_ws(" ", slice(ws, 1, 16))).as("p"),
        least(size(ws), lit(16)).cast("long").as("t"))
      .groupBy("p", "t").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("t"), col("n"), ((col("n") - 1) * col("t")).as("saved"))
      .as[(Long, Long, Long)].collect().toSet
  }

  test("16-word cap groups across lengths; short docs on full text") {
    val w20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val w16 = (1 to 16).map(i => s"w$i").mkString(" ")
    val s8 = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(w20, w20, w20, w16, // share the first 16 words
      s8, s8, // short pair buckets on its full 8 words
      "lonely unique doc") // n = 1: cut
    assert(plan(docs) === Set(
      (16L, 4L, 48L), // 3 long + the exact-16 doc: (4-1)*16
      (8L, 2L, 8L)))
  }

  test("a 10-word doc never collides with a longer doc sharing "
    + "those 10 words") {
    val w10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val w12 = ((1 to 10).map(i => s"w$i") ++ Seq("x", "y")).mkString(" ")
    assert(plan(Seq(w10, w12)).isEmpty) // different buckets, both n=1
  }
}
