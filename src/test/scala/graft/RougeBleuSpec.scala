package graft

import graft.llm.EvalOps

/** X344 ROUGE/BLEU: a hand-computed clipped-overlap pair through every
  * output column (including the micro-floored ln-pair log-BLEU), the
  * zero-overlap clamp, micro-aggregation across pairs of one group,
  * and the shorter-than-2-words 2-gram edge.
  */
class RougeBleuSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String, String, String)]) =
    EvalOps.rougeBleu(rows.toDF("pid", "grp", "cand", "ref"),
        "pid", "grp", "cand", "ref")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq

  private def lmu(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1000000.0).toLong

  test("hand-computed pair: clips, ratios, f1, and log-BLEU") {
    // cand 1-grams a:2 b:1 c:1 (ct1=4); ref a:1 b:2 d:1 (rt1=4)
    // clip1 = 1+1 = 2; 2-grams clip2 = {"a b"} = 1, ct2 = rt2 = 3
    val r = run(Seq((1L, "s", "a b a c", "a b b d"))).head
    assert(r._1 === "s" && r._2 === 1L)
    assert(r._3 === 500000L && r._4 === 500000L && r._5 === 500000L)
    assert(r._6 === 333333L && r._7 === 333333L && r._8 === 333333L)
    // _lp = (lmu(2)-lmu(4)) + (lmu(1)-lmu(3)), halved toward zero; bp = 0
    val lp = (lmu(2) - lmu(4)) + (lmu(1) - lmu(3))
    assert(r._9 === lp / 2)
  }

  test("zero 2-gram overlap clamps log-BLEU to the documented floor") {
    // 1-grams overlap on 'a' but no shared bigram
    val r = run(Seq((1L, "s", "a x", "y a"))).head
    assert(r._9 === -20000000L && r._3 === 500000L)
  }

  test("micro aggregation: two pairs pool counts before the ratios") {
    // pair A: clip1=2 of ct1=4/rt1=4 (from the hand case);
    // pair B: identical one-word docs — clip1=1, ct1=rt1=1, no 2-grams
    val r = run(Seq(
      (1L, "s", "a b a c", "a b b d"),
      (2L, "s", "z", "z"))).head
    // pooled: k1=3, c1=5, r1=5 -> p=r=600000; k2=1, c2=3, r2=3 unchanged
    assert(r._2 === 2L && r._3 === 600000L && r._4 === 600000L)
    assert(r._6 === 333333L)
    // brevity: r1=c1 -> 0; lp recomputed on pooled counts
    val lp = (lmu(3) - lmu(5)) + (lmu(1) - lmu(3))
    assert(r._9 === lp / 2)
  }

  test("groups aggregate independently and order lexicographically") {
    val rs = run(Seq(
      (1L, "b", "a b", "a b"),
      (2L, "a", "x y", "p q")))
    assert(rs.map(_._1) === Seq("a", "b"))
    assert(rs(1)._3 === 1000000L && rs(1)._8 === 1000000L
      && rs(1)._9 === 0L) // identical docs: perfect scores, log-BLEU 0
    assert(rs(0)._3 === 0L && rs(0)._9 === -20000000L)
  }
}
