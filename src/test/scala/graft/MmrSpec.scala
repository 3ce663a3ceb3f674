package graft

import graft.llm.VectorOps

/** X319 MMR: hand-computed greedy trace at two lambdas — high lambda
  * keeps the similar-but-relevant hit, low lambda flips round 2 to
  * the diverse one — plus tie and bound checks.
  */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  // q = (10, 0); rels: a 90, b 80, c 0, d 60
  // sims: (b,a) 72, (c,a) 0, (d,a) 54, (d,b) 48, (d,c) 54
  private val corpus = Seq(
    (1L, Seq(9L, 0L)), (2L, Seq(8L, 0L)), (3L, Seq(0L, 9L)),
    (4L, Seq(6L, 6L))).toDF("vec_id", "qv")
  private val query = Seq((100L, Seq(10L, 0L))).toDF("vec_id", "qv")

  private def run(num: Long, den: Long) =
    VectorOps.mmrRerank(corpus, query, "vec_id", "qv",
      shortK = 4, outK = 3, lambdaNum = num, lambdaDen = den)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq

  test("high lambda (7/10) keeps the similar-but-relevant hit") {
    // r2: b 7*80-3*72 = 344 beats d 258 and c 0
    assert(run(7L, 10L) === Seq(
      (100L, 1, 1L, 90L, 630L),
      (100L, 2, 2L, 80L, 344L),
      (100L, 3, 4L, 60L, 258L)))
  }

  test("low lambda (3/10) flips round 2 to the diverse hit") {
    // r2: c 0 beats b 3*80-7*72 = -264 and d -198; r3: d -198 beats b
    assert(run(3L, 10L) === Seq(
      (100L, 1, 1L, 90L, 270L),
      (100L, 2, 3L, 0L, 0L),
      (100L, 3, 4L, 60L, -198L)))
  }

  test("parameter bounds are enforced") {
    intercept[IllegalArgumentException] {
      VectorOps.mmrRerank(corpus, query, "vec_id", "qv", 2, 3, 1L, 2L)
    }
    intercept[IllegalArgumentException] {
      VectorOps.mmrRerank(corpus, query, "vec_id", "qv", 4, 3, 3L, 2L)
    }
  }
}
