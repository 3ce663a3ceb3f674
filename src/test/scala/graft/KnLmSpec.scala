package graft

import graft.llm.TextOps

/** Hand-checked semantics for X272 Kneser–Ney — all three probability
  * branches replayed as exact integer rationals and micro-floored ln
  * pairs.
  */
class KnLmSpec extends SparkSpec {

  import spark.implicits._

  // the operator's own split rule, replayed to pick controllable ids
  private def bucket(id: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"kn|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.take(4), 16) % 5
  }
  private val evalIds = (0L to 200L).filter(bucket(_) == 0)
  private val trainIds = (0L to 200L).filter(bucket(_) != 0)

  private def run(docs: Seq[(Long, String)]) =
    TextOps.knCrossEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "n_bigrams", "avg_nll")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap

  // train corpus "a b a c": big = {ab:1, ba:1, ac:1}; c1 = {a:2/n1f 2,
  // b:1/n1f 1}; n1p = {a:1, b:1, c:1}; B = 3, V = 3, B+V+1 = 7
  private val train = Seq(trainIds.head -> "a b a c")

  test("seen bigram: exact rational 19/56 through the ln pair") {
    val got = run(train :+ (evalIds.head -> "a b"))
    // num = (4-3)*7 + 3*2*2 = 19, den = 4*2*7 = 56
    // floor(ln56*1e6) - floor(ln19*1e6) = 4025351 - 2944438
    assert(got(evalIds.head) === ((evalIds.head, 1L, 1.080913)))
  }

  test("unseen context degrades to the continuation probability") {
    val got = run(train :+ (evalIds.head -> "c a"))
    // w1 = c never opens a train bigram: p = (n1p(a)+1)/7 = 2/7
    // floor(ln7*1e6) - floor(ln2*1e6) = 1945910 - 693147
    assert(got(evalIds.head)._3 === 1.252763)
  }

  test("unseen bigram with a seen context takes the discounted mass") {
    val got = run(train :+ (evalIds.head -> "b c"))
    // num = 3*n1f(b)*(n1p(c)+1) = 6, den = 4*c1(b)*7 = 28
    // floor(ln28*1e6) - floor(ln6*1e6) = 3332204 - 1791759
    assert(got(evalIds.head)._3 === 1.540445)
  }

  test("only held-out docs are scored") {
    val got = run(train :+ (evalIds.head -> "a b") :+
      (trainIds(1) -> "a b"))
    assert(got.keySet === Set(evalIds.head))
  }
}
