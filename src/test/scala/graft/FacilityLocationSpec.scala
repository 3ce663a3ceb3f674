package graft

import graft.operators.FacilityLocation

/** X326 facility-location greedy: a hand-computed pick sequence —
  * biggest coverage first, then the complementary point, then the
  * dominated leftovers at gain 0 with the smaller-id tie-break.
  */
class FacilityLocationSpec extends SparkSpec {

  import spark.implicits._

  // 1-dim quantized vectors keep every dot hand-checkable.
  private def univ = Seq(
    (1L, Seq(10L)), (2L, Seq(10L)), (3L, Seq(-10L)), (4L, Seq(2L)))
    .toDF("id", "qv")
  private def cand = Seq(
    (101L, Seq(1L)), (102L, Seq(2L)), (103L, Seq(-1L)), (104L, Seq(1L)))
    .toDF("cid", "cqv")

  test("hand-computed pick sequence with gain-0 tie-break") {
    val out = FacilityLocation.greedySelect(univ, cand, k = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // sims (clamped at 0): c102 covers u1=20 u2=20 u4=4 -> gain 44;
    // then c103 adds u3=10; c101/c104 are dominated (gain 0) and
    // resolve by the smaller cid first.
    assert(out === Seq(
      (1L, 102L, 44L, 44L),
      (2L, 103L, 10L, 54L),
      (3L, 101L, 0L, 54L),
      (4L, 104L, 0L, 54L)))
  }

  test("submodularity sanity: marginal gains never increase") {
    val gains = FacilityLocation.greedySelect(univ, cand, k = 4)
      .as[(Long, Long, Long, Long)].collect().map(_._3)
    assert(gains.sliding(2).forall(w => w(0) >= w(1)))
  }

  test("candidate pool past the cap raises loudly") {
    val ex = intercept[IllegalArgumentException] {
      FacilityLocation.greedySelect(univ, cand, k = 1, maxCandidates = 2)
    }
    assert(ex.getMessage.contains("exceeds maxCandidates"))
  }

  test("|U|x|C| similarity envelope past the cap raises loudly") {
    // 4 x 4 = 16 rows > 15: the corpus-linear contract fires BEFORE
    // the checkpoint materializes, naming the shard-or-shrink remedy.
    val ex = intercept[IllegalArgumentException] {
      FacilityLocation.greedySelect(univ, cand, k = 1, maxSimRows = 15L)
    }
    assert(ex.getMessage.contains("exceeds maxSimRows"))
    // at the exact boundary it still runs
    val ok = FacilityLocation.greedySelect(univ, cand, k = 1,
      maxSimRows = 16L)
    assert(ok.count() === 1L)
  }
}
