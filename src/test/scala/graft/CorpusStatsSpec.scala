package graft

import graft.llm.TextOps

/** Hand-checked semantics for the round-10 wave-8 corpus-statistics
  * ops: Zipf fit, Gries DP dispersion, Gini/HHI concentration.
  */
class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  test("zipfFit: exact harmonic counts recover slope 1") {
    // counts 12/rank: 12, 6, 4, 3 → ln c = ln 12 − 1·ln rank exactly
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c")
      ++ Seq.fill(3)("d")).mkString(" ")
    val got = TextOps.zipfFit(Seq((1L, text)).toDF("doc_id", "text"),
      "text")
      .select("part", "sym", "n").as[(String, String, Long)].collect()
    val fit = got.filter(_._1 == "fit").map(r => r._2 -> r._3).toMap
    // micro-quantized ln leaves ±few-unit wiggle on the exact line
    assert(math.abs(fit("s_micro") - 1000000L) <= 10,
      s"slope ${fit("s_micro")}")
    assert(math.abs(fit("logk_micro") - 2484907L) <= 10,
      s"intercept ${fit("logk_micro")}")
    val ranks = got.filter(_._1 == "rank").map(r => r._2 -> r._3).toMap
    assert(ranks === Map("a" -> 12L, "b" -> 6L, "c" -> 4L, "d" -> 3L))
  }

  test("dispersionDp: concentrated vs proportional words, exact ppm") {
    // two equal 10-token sources: x and a live only in A, y is spread
    // exactly proportionally — DP 500000 vs 0
    val df = Seq(
      ("A", "x x y a a a a a a a"),
      ("B", "y b b b b b b b b b")).toDF("source", "text")
    val got = TextOps.dispersionDp(df, "source", "text")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("x") === ((2L, 500000L)))
    assert(got("y") === ((2L, 0L)))
    assert(got("a") === ((7L, 500000L)))
  }

  test("concentration: equal lengths give Gini 0; 1:3 split gives 0.25") {
    val eq = (1 to 10).map(i => (i.toLong, "s", "w w w"))
      .toDF("doc_id", "source", "text")
    val gotEq = TextOps.concentration(eq, "doc_id", "source", "text")
      .as[(String, Long)].collect().toMap
    assert(gotEq("gini_doc_ppm") === 0L)
    assert(gotEq("hhi_source_ppm") === 1000000L)
    assert(gotEq("top_source_share_ppm") === 1000000L)
    assert(gotEq("n_docs") === 10L && gotEq("total_tokens") === 30L)

    val skew = Seq((1L, "a", "w"), (2L, "b", "w w w"))
      .toDF("doc_id", "source", "text")
    val gotSkew = TextOps.concentration(skew, "doc_id", "source", "text")
      .as[(String, Long)].collect().toMap
    // S = 1·1 + 3·2 = 7; G = 2·7·10⁶ div 8 − 3·10⁶ div 2 = 250000
    assert(gotSkew("gini_doc_ppm") === 250000L)
    // shares 250000/750000 → HHI = (25e4² + 75e4²) div 10⁶ = 625000
    assert(gotSkew("hhi_source_ppm") === 625000L)
    assert(gotSkew("top_source_share_ppm") === 750000L)
  }
}
