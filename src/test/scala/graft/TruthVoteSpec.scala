package graft

import graft.operators.TruthVote

/** X321 truth discovery: hand-computed consensus/trust on a planted
  * conflict set, including the case the operator exists for — a
  * two-source tie that unweighted majority breaks arbitrarily (smaller
  * value) and the trust reweight flips to the reliable source.
  */
class TruthVoteSpec extends SparkSpec {

  import spark.implicits._

  // Sources a (right everywhere), b, c; entities e1..e6, truth below.
  // e3/e4/e5 are two-claim ties in round 1 (broken to the smaller
  // value); e5's round-1 winner is c's wrong 2, flipped to b's correct
  // 9 once trust (a=5, b=3, c=2) reweights the votes.
  private val claims = Seq(
    (1L, "a", 1L), (2L, "a", 1L), (3L, "a", 5L), (4L, "a", 3L),
    (6L, "a", 4L),
    (1L, "b", 1L), (2L, "b", 1L), (3L, "b", 9L), (5L, "b", 9L),
    (6L, "b", 4L),
    (1L, "c", 1L), (2L, "c", 2L), (4L, "c", 8L), (5L, "c", 2L))
    .toDF("entity", "source", "val")

  private val truth = Seq(
    (1L, 1L), (2L, 1L), (3L, 5L), (4L, 3L), (5L, 9L), (6L, 4L))
    .toDF("entity", "tru")

  test("hand-computed report: counts, trust, and the round-2 flip") {
    val out = TruthVote.report(claims, truth)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // Round-1 consensus: e1=1 e2=1 e3=5 e4=3 e5=2 e6=4 (ties to the
    // smaller value at e3/e4/e5). Trust: a=5, b=3, c=2. Round-2
    // consensus: e5 flips 2 -> 9 (w 3 vs 2); everything else holds.
    assert(out === Seq(
      ("a", 5L, 5L, 5L, 5L),
      ("b", 5L, 3L, 4L, 4L),
      ("c", 4L, 2L, 1L, 1L)))
  }

  test("the flip rewards ground truth: accuracy-ranked sources agree more after reweighting") {
    val out = TruthVote.report(claims, truth)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // b was RIGHT on e5 but outvoted by the round-1 tie-break; after
    // the reweight its consensus agreement rises and c's falls.
    assert(out("b")._4 > out("b")._3)
    assert(out("c")._4 < out("c")._3)
  }
}
