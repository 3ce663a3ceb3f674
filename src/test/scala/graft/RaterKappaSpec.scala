package graft

import org.apache.spark.sql.functions._
import graft.llm.EvalOps

/** Hand-checked semantics for X278 inter-rater kappa — the exact
  * integer ratios, the chance correction, and the degenerate-pe guard.
  */
class RaterKappaSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Boolean, Boolean, Boolean)]) =
    EvalOps.raterKappa(rows.toDF("a", "b", "c"),
        Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c")))
      .select("pair", "po_micro", "pe_micro", "kappa_micro")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("perfect agreement is kappa 1 even off the 50/50 marginal") {
    val got = run(Seq((true, true, true), (true, true, true),
      (false, false, false)))
    assert(got("a|b")._4 === 1000000L)
    assert(got("fleiss")._4 === 1000000L)
  }

  test("systematic disagreement goes negative") {
    // a and b always opposite on balanced marginals: po=0, pe=1/2,
    // kappa = (0-1/2)/(1-1/2) = -1; trunc quantization keeps the sign.
    val got = run(Seq((true, false, true), (false, true, false)))
    assert(got("a|b")._2 === 0L)
    assert(got("a|b")._3 === 500000L)
    assert(got("a|b")._4 === -1000000L)
  }

  test("constant raters hit the pe=1 guard, kappa reported 0") {
    val got = run(Seq((true, true, true), (true, true, true)))
    assert(got("a|b")._3 === 1000000L && got("a|b")._4 === 0L)
    assert(got("fleiss")._4 === 0L)
  }

  test("hand-computed mixed table: exact Cohen integers") {
    // n=4: a=(1,1,0,0), b=(1,0,0,1): n11=1, n00=1, agree=2, a1=2, b1=2
    // chance = 2*2 + 2*2 = 8; po = 1/2; pe = 8/16 = 1/2; kappa = 0/8 = 0.
    val got = run(Seq((true, true, false), (true, false, false),
      (false, false, false), (false, true, false)))
    assert(got("a|b") === (("a|b", 500000L, 500000L, 0L)))
  }

  test("fleiss hand check on a 2-item panel") {
    // items r=(2,1) of R=3: A = [2*1+1*0] + [1*0+2*1] = 4; po = 4/12.
    // S=3, NR=6: P = 9 + 9 = 18; pe = 18/36 = 1/2.
    // kappa = (4*36 - 12*18)/(12*(36-18)) = (144-216)/216 = -1/3.
    val got = run(Seq((true, true, false), (true, false, false)))
    assert(got("fleiss")._2 === 333333L)
    assert(got("fleiss")._3 === 500000L)
    assert(got("fleiss")._4 === -333333L)
  }
}
