package graft

import graft.operators.BrierDecomp

/** X379 Brier decomposition: hand-computed two-bin panel, the Murphy
  * identity BS = rel − res + unc at bin-center forecasts, and the
  * perfect/degenerate forecaster readouts.
  */
class BrierDecompSpec extends SparkSpec {

  import spark.implicits._

  private def d(rows: Seq[(Long, Long)]) =
    BrierDecomp.decompose(rows.toDF("f_pct", "y"), "f_pct", "y")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq

  test("hand-computed two-bin panel on the micro grid") {
    // bin 5 (f=55): y = 1,1,0; bin 9 (f=95): y = 1,1 → n=5, o=4
    // rel₅ = (165−200)²/(10⁴·3·5) → 8166; res₅ = (10−12)²/(3·5³) → 10666
    // rel₉ = (190−200)²/(10⁴·2·5) → 1000; res₉ = (10−8)²/(2·5³) → 16000
    // unc = 4·1/25 → 160000
    val r = d(Seq((55L, 1L), (55L, 1L), (55L, 0L), (95L, 1L),
      (95L, 1L)))
    assert(r === Seq(
      (5L, 55L, 3L, 2L, 5L, 4L, 8166L, 10666L, 160000L),
      (9L, 95L, 2L, 2L, 5L, 4L, 1000L, 16000L, 160000L)))
  }

  test("Murphy identity: BS = rel − res + unc at bin centers") {
    // BS = (0.45² + 0.45² + 0.55² + 0.05² + 0.05²)/5 = 0.1425
    val r = d(Seq((55L, 1L), (55L, 1L), (55L, 0L), (95L, 1L),
      (95L, 1L)))
    val bs = r.map(_._7).sum - r.map(_._8).sum + r.head._9
    assert(bs === 142500L)
  }

  test("a perfectly calibrated bin has zero reliability") {
    // bin 2 (f=25): exactly 1 of 4 positive → stated 25 = realized 25
    val r = d(Seq((25L, 1L), (25L, 0L), (25L, 0L), (25L, 0L)))
    assert(r.head._7 === 0L)
    assert(r.head._8 === 0L) // single bin: ō_k = ō → no resolution
  }

  test("a constant outcome has zero uncertainty") {
    val r = d(Seq((15L, 1L), (85L, 1L), (45L, 1L)))
    assert(r.forall(_._9 === 0L))
  }
}
