package graft

import org.apache.spark.sql.functions.col

import graft.operators.Hilbert

/** X312 Hilbert index: the textbook 4×4 visiting order, and the
  * DEFINING invariant at 8×8 — d is a permutation of 0..63 whose
  * consecutive cells are grid-adjacent (|Δx| + |Δy| = 1), the
  * locality property Morton order does not have.
  */
class HilbertSpec extends SparkSpec {

  import spark.implicits._

  private def dOf(bits: Int): Seq[(Long, Long, Long)] = {
    val n = 1 << bits
    val cells = for { x <- 0 until n; y <- 0 until n }
      yield (x.toLong, y.toLong)
    Hilbert.withD(cells.toDF("x", "y"), "x", "y", bits, "d")
      .select("x", "y", "d")
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("4x4 grid follows the textbook visiting order") {
    val byD = dOf(2).map { case (x, y, d) => d -> ((x, y)) }.toMap
    val expected = Seq( // the classic U-recursive 16-cell walk
      (0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L),
      (0L, 2L), (0L, 3L), (1L, 3L), (1L, 2L),
      (2L, 2L), (2L, 3L), (3L, 3L), (3L, 2L),
      (3L, 1L), (2L, 1L), (2L, 0L), (3L, 0L))
    assert((0L until 16L).map(byD) === expected)
  }

  test("8x8: d is a permutation and every step is grid-adjacent") {
    val cells = dOf(3)
    assert(cells.map(_._3).sorted === (0L until 64L))
    val walk = cells.sortBy(_._3)
    walk.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert((x1 - x2).abs + (y1 - y2).abs === 1L,
        s"jump from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("bits bound is enforced") {
    intercept[IllegalArgumentException] {
      Hilbert.withD(Seq((1L, 1L)).toDF("x", "y"), "x", "y", 0, "d")
    }
  }
}
