package graft

import graft.llm.TextOps

/** Hand-checked semantics for X277 Horvitz–Thompson estimation — the
  * census degeneracy and the md5-ranked draw replayed by hand.
  */
class HtEstimateSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(String, Long, String)], budget: Int) =
    TextOps.htTokenEstimate(
        docs.toDF("source", "doc_id", "text"), "source", "doc_id",
        "text", budget, salt = "ht")
      .select("source", "n_docs", "n_drawn", "true_tokens",
        "est_tokens_micro", "err_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("allocation >= stratum size degrades to a census: error 0") {
    val docs = Seq(("a", 1L, "x y z"), ("a", 2L, "x y"),
      ("b", 3L, "p q r s"), ("b", 4L, "p"))
    val got = run(docs, budget = 100)
    assert(got("a")._6 === 0L && got("b")._6 === 0L)
    assert(got("__ALL__")._6 === 0L)
    assert(got("a")._5 === got("a")._4 * 1000000L)
  }

  test("md5-ranked draw: the estimate is the hand-replayed HT total") {
    // one stratum, 4 docs, budget 2 -> draw the 2 smallest md5 ranks
    val texts = Map(1L -> "a", 2L -> "a b", 3L -> "a b c",
      4L -> "a b c d")
    val docs = texts.toSeq.map { case (id, t) => ("s", id, t) }
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md5.digest(s"ht|$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val drawn = texts.keys.toSeq.sortBy(id => (h(id), id)).take(2)
    val sSamp = drawn.map(id => texts(id).split(" ").length.toLong).sum
    val got = run(docs, budget = 2)
    assert(got("s")._3 === 2L)
    assert(got("s")._5 === 4L * sSamp * 1000000L / 2L)
  }
}
