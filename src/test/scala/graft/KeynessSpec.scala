package graft

import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Hand-checked semantics for X276 Dunning keyness — the integer ln
  * pairs, zero-cell limits, and direction clearing.
  */
class KeynessSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(String, Boolean)]) =
    TextOps.dunningKeyness(docs.toDF("text", "t"), "text", col("t"),
        topK = 10)
      .select("word", "n_target", "n_rest", "g2_micro", "overrepresented")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap

  test("exclusive words: exact G2 from the ln pair, both directions") {
    val got = run(Seq(("m m", true), ("z z", false)))
    // G2(m) = 2*[2*(L(8) - L(4))] = 4*(2079441 - 1386294)
    assert(got("m") === (("m", 2L, 0L, 2772588L, true)))
    assert(got("z") === (("z", 0L, 2L, 2772588L, false)))
  }

  test("a perfectly balanced word scores exactly zero") {
    val got = run(Seq(("w", true), ("w", false)))
    assert(got("w")._4 === 0L)
  }

  test("keyness ranks the planted marker above shared vocabulary") {
    val got = run(Seq(("a b promo", true), ("a b promo", true),
      ("a b", false), ("a b", false)))
    assert(got("promo")._5 && got("promo")._4 > got("a")._4)
  }
}
