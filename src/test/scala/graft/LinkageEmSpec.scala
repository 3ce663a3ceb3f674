package graft

import graft.operators.RecordLinkage

/** X325 EM linkage fit: on a planted two-class mixture (no truth
  * column given to the algorithm) the fitted parameters must separate
  * the classes the right way round — m above u on every field, the
  * all-agree pattern's posterior near 1, the all-disagree near 0, and
  * the match proportion near the planted rate — and the integer
  * fixed-point must be bit-deterministic.
  */
class LinkageEmSpec extends SparkSpec {

  import spark.implicits._

  // 20 planted matches (agree on both fields, 2 with a dirty second
  // field) in 200 pairs; 180 nonmatches mostly disagreeing.
  private def cands = (
    Seq.fill(18)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(170)((false, false)) ++ Seq.fill(10)((false, true)))
    .toDF("g_a", "g_b")

  test("planted mixture: params separate, posteriors split, p near truth") {
    val out = RecordLinkage.emFit(cands, Seq("g_a", "g_b"), rounds = 5)
      .as[(Boolean, Boolean, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val (_, _, _, wTT, p, mA, uA, mB, uB) = out((true, true))
    assert(mA > uA && mB > uB, s"m must exceed u: $out")
    assert(wTT > 900000L, s"all-agree posterior must be ~1: $wTT")
    assert(out((false, false))._4 < 100000L,
      s"all-disagree posterior must be ~0: ${out((false, false))._4}")
    assert(p > 50000L && p < 250000L, s"p must be near 10%: $p")
    // clamp invariant
    for (v <- Seq(p, mA, uA, mB, uB)) assert(v >= 1000L && v <= 999000L)
  }

  test("fixed-point EM is bit-deterministic across runs") {
    val run = () => RecordLinkage.emFit(cands, Seq("g_a", "g_b"), rounds = 5)
      .collect().map(_.toSeq).toSet
    assert(run() === run())
  }
}
