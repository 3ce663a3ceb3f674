package graft

import graft.operators.Jenks

/** X317 Jenks/Ckmeans DP: hand-computed bimodal split with exact
  * micro-SSE values, per-mode classes at k = 3, the smaller-break
  * tie rule, and the k bound.
  */
class JenksSpec extends SparkSpec {

  import spark.implicits._

  private def run(vals: Seq[Long], k: Int) =
    Jenks.breaks(vals.toDF("v"), "v", k)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq

  test("bimodal data splits at the mode gap with exact micro stats") {
    val vals = Seq.fill(3)(0L) ++ Seq.fill(2)(1L) ++
      Seq.fill(3)(10L) ++ Seq.fill(2)(11L)
    // class 1 = {0,0,0,1,1}: mean 0.4, SSE 1.2; class 2 = {10x3,11x2}
    assert(run(vals, 2) === Seq(
      (1, 0L, 1L, 5L, 400000L, 1200000L),
      (2, 10L, 11L, 5L, 10400000L, 1200000L)))
  }

  test("k = 3 on three isolated values: one zero-SSE class per value") {
    assert(run(Seq(0L, 5L, 10L), 3) === Seq(
      (1, 0L, 0L, 1L, 0L, 0L),
      (2, 5L, 5L, 1L, 5000000L, 0L),
      (3, 10L, 10L, 1L, 10000000L, 0L)))
  }

  test("symmetric tie breaks to the smaller break index") {
    // {0,1,2}, k=2: both splits cost 500000 micro; the smaller class-2
    // start wins -> classes {0} and {1,2}
    assert(run(Seq(0L, 1L, 2L), 2) === Seq(
      (1, 0L, 0L, 1L, 0L, 0L),
      (2, 1L, 2L, 2L, 1500000L, 500000L)))
  }

  test("k bound enforced; domain smaller than k yields empty") {
    intercept[IllegalArgumentException] {
      Jenks.breaks(Seq(1L).toDF("v"), "v", 7)
    }
    assert(run(Seq(3L, 3L, 3L), 2).isEmpty)
  }
}
