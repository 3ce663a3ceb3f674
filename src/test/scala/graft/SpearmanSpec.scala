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

  test("isqrtDec is exact where the double seed errs and Long cannot go") {
    import org.apache.spark.sql.functions._
    val cases = Seq(
      // around Long range and beyond (n⁴-scale rank moments)
      BigInt("9223372036854775807"), BigInt("9223372036854775808"),
      BigInt(10).pow(37), BigInt(10).pow(38) - 1,
      // perfect squares and their neighbours at 10¹⁹-root scale
      (BigInt(10).pow(19) - 3).pow(2),
      (BigInt(10).pow(19) - 3).pow(2) - 1,
      (BigInt(10).pow(19) - 3).pow(2) + 1,
      BigInt(0), BigInt(1), BigInt(2), BigInt(3), BigInt(4))
    def isqrtBig(x: BigInt): BigInt = {
      // monotone-descent integer Newton: the naive s != prev guard
      // oscillates forever for x = 3 (1 → 2 → 1 → …)
      if (x < 2) return x.max(0)
      var s = BigInt(1) << ((x.bitLength + 1) / 2)
      var t = (s + x / s) / 2
      while (t < s) { s = t; t = (s + x / s) / 2 }
      s
    }
    val got = cases.map(_.toString).toDF("x")
      .select(graft.llm.TextOps.isqrtDec(
        col("x").cast("decimal(38,0)")).cast("string"))
      .as[String].collect().map(BigInt(_)).toSeq
    assert(got === cases.map(isqrtBig))
  }

  test("rank moments past Long range stay exact (the old silent clamp)") {
    // n = 100k distinct ranks: A = B ≈ n⁴/3 ≈ 3.3e19 > Long.MaxValue.
    // The long-cast isqrt path would fail there (loud under ANSI; a
    // silent ±10⁶ clamp without it). y = (x·7919 mod n) + 1 is a
    // scattering permutation (7919 coprime to 10⁵), so the true rho
    // is a nondegenerate interior value the mirror pins exactly.
    val n = 100000
    val rows = (1 to n).map { i =>
      (i.toLong, ((i.toLong * 7919L) % n) + 1L)
    }
    // driver-side BigInt mirror of the exact definition
    val rx = (1 to n).map(i => BigInt(2 * i))
    val ry = rows.map { case (_, y) => BigInt(2 * y) }
    val nB = BigInt(n)
    val num = nB * rx.zip(ry).map { case (a, b) => a * b }.sum -
      rx.sum * ry.sum
    val aT = nB * rx.map(r => r * r).sum - rx.sum * rx.sum
    def isqrtBig(x: BigInt): BigInt = {
      if (x < 2) return x.max(0)
      var s = BigInt(1) << ((x.bitLength + 1) / 2)
      var t = (s + x / s) / 2
      while (t < s) { s = t; t = (s + x / s) / 2 }
      s
    }
    val bT = nB * ry.map(r => r * r).sum - ry.sum * ry.sum
    assert(aT > BigInt(Long.MaxValue)) // the regression precondition
    // BigInt / truncates toward zero — the engines' semantics
    val expRho = (num * 1000000 / (isqrtBig(aT) * isqrtBig(bT))).toLong
    val r = rho(rows)
    assert(r._1 === n.toLong && r._3 === expRho)
    assert(math.abs(expRho) < 1000000L) // nondegenerate interior value
    // past the A,B <= 1e16 exact-rational envelope, rho2 derives from
    // rho_micro on the same branch in both engines
    val sign = if (num >= 0) 1L else -1L
    assert(r._2 === sign * (expRho * expRho / 1000000L))
  }
}
