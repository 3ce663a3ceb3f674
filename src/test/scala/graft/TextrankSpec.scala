package graft

import graft.llm.TextOps

/** Hand-checked semantics for X262 TextRank keywords — the window-2
  * co-occurrence graph (stopword-gap bridging, self-loop exclusion)
  * and the nano-unit PageRank composition.
  */
class TextrankSpec extends SparkSpec {

  import spark.implicits._

  private val stop = Seq("the", "a", "of", "to", "in")

  private def run(docs: Seq[(Long, String)], topK: Int = 25) =
    TextOps.textrankKeywords(docs.toDF("doc_id", "text"), "doc_id",
        "text", stop, iters = 3, topK = topK)
      .select("word", "rank_nano")
      .as[(String, Long)].collect()

  test("isolated word holds exactly the damped base rank") {
    // "x x x": self-loops dropped, no edges, one node -> every round
    // is base = 15*1e9 div (100*1)
    val got = run(Seq(1L -> "x x x"))
    assert(got.toSeq === Seq("x" -> 150000000L))
  }

  test("window 2 bridges a stopword gap; stopwords never rank") {
    // "x the y": (x,the) filtered, but lead-2 links x-y across the gap
    val got = run(Seq(1L -> "x the y", 2L -> "z"))
    val m = got.toMap
    assert(!m.contains("the"))
    assert(m("x") === m("y"), s"symmetric pair diverged: ${got.toSeq}")
    assert(m("x") > m("z"), "connected words must outrank the isolate")
  }

  test("the hub the corpus routes through ranks first") {
    val got = run(Seq(1L -> "h u h v h w"))
    assert(got.head._1 === "h")
    val m = got.toMap
    assert(Seq("u", "v", "w").forall(w => m(w) < m("h")))
  }

  test("repeated co-occurrence wins the vote split between rivals") {
    // p co-occurs with q twice but z once: p's vote splits 2/3 vs 1/3
    // (multi-edge rows ARE the integer weights), so q outranks z
    val got = run(Seq(1L -> "p q", 2L -> "p q", 3L -> "p z"))
    val m = got.toMap
    assert(m("q") > m("z"))
    assert(m("p") > m("q"), "the shared hub still ranks first")
  }
}
