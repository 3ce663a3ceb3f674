package graft

import graft.operators.Spearman

/** X337 Spearman: a curved monotone relation scores a perfect 1 where
  * Pearson would not, reversal gives -1, the tie case lands on the
  * exact rational rho² (0.9 for the planted data) with the clamped
  * isqrt rho, and constant columns degenerate to 0.
  */
class SpearmanSpec extends SparkSpec {

  import spark.implicits._

  private def rho(rows: Seq[(Long, Long)]) =
    Spearman.spearman(rows.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().head

  test("curved monotone relation is a perfect rank correlation") {
    assert(rho(Seq((1L, 1L), (2L, 4L), (3L, 9L), (4L, 16L)))
      === ((4L, 1000000L, 1000000L)))
  }

  test("reversal is exactly -1") {
    assert(rho(Seq((1L, 16L), (2L, 9L), (3L, 4L), (4L, 1L)))
      === ((4L, -1000000L, -1000000L)))
  }

  test("tied ranks: exact rational rho^2 = 0.9, isqrt rho clamps") {
    // x = [1,2,2,3] doubled ranks [2,5,5,8]; y distinct [2,4,6,8].
    // num = 72, A = 72, B = 80 -> rho^2 = 72/80 = 0.9 exactly; the
    // floored isqrt den (8*8=64) reads 1.125 and clamps to 1.
    assert(rho(Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 40L)))
      === ((4L, 900000L, 1000000L)))
  }

  test("constant column degenerates to 0") {
    assert(rho(Seq((5L, 1L), (5L, 2L), (5L, 3L)))
      === ((3L, 0L, 0L)))
  }
}
