package graft

import org.apache.spark.sql.functions._

/** The KMV estimator's 2⁶² ceiling (ADVICE r9 / VERDICT r10 #5): a
  * pathologically tiny k-th hash must clamp to exactly 2⁶² — not
  * saturate to Long.MaxValue (Spark's bare non-ANSI double→long cast)
  * and not raise (DuckDB's). Both engines spell `least(·, 2⁶²)` before
  * the cast; this pins the Spark side's exact value so the oracle's
  * identical formula stays hash-comparable.
  */
class KmvClampSpec extends SparkSpec {

  import spark.implicits._

  // k = 8: the clamp needs (k-1)*2^60/h_k > 2^62, i.e. h_k < (k-1)/4 —
  // impossible for k <= 5 with integer hashes, so the spec's k must be
  // large enough that a planted h_k = 1 actually crosses the ceiling
  private val k = 8

  private def est(arr: Seq[Long]): Long =
    Seq(Tuple1(arr)).toDF("kmv")
      .select(graft.queries.LlmSurface.kmvEst("kmv", k).as("e"))
      .head().getLong(0)

  test("planted tiny h_k clamps to exactly 2^62, not Long.MaxValue") {
    // (k-1)*2^60/h_k = 7*2^60/7 = 2^60 < 2^62: no clamp
    assert(est(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 7L)) === (1L << 60))
    // h_k = 1: quotient 7*2^60 = 1.75*2^62 -> the ceiling, bit-exact
    assert(est(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 1L)) === 4611686018427387904L)
  }

  test("unsaturated sketch reports its exact size") {
    assert(est(Seq(10L, 20L)) === 2L)
  }

  test("normal regime: exact floor((k-1)*2^60 / h_k)") {
    val hk = 103548857136060L
    assert(est(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, hk)) ===
      math.floor(7.0 * math.pow(2, 60) / hk.toDouble).toLong)
  }
}
