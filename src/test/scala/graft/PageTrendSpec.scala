package graft

import graft.operators.Page

/** X364 Page's trend: perfect within-block order both directions with
  * hand-computed z², a tied block, and incomplete-block exclusion.
  */
class PageTrendSpec extends SparkSpec {

  import spark.implicits._

  private def pg(rows: Seq[(String, Long, Long)]) =
    Page.trend(rows.toDF("b", "j", "v"), "b", "j", "v")
      .as[(Long, Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().head

  test("perfect rising order in every block: z² = 6 exactly") {
    // S2 = (6, 12, 18), t = (1, 2, 3) → L2 = 84, E2 = 3·3·16/2 = 72,
    // 144·Var scale v144 = 3·9·4·8 = 864 → z² = 144·36·10⁶/864 = 6·10⁶
    val r = pg(Seq(
      ("b1", 1L, 1L), ("b1", 2L, 2L), ("b1", 3L, 3L),
      ("b2", 1L, 10L), ("b2", 2L, 20L), ("b2", 3L, 30L),
      ("b3", 1L, 5L), ("b3", 2L, 6L), ("b3", 3L, 7L)))
    assert(r === ((3L, 3L, 0L, 84L, 72L, 6000000L, true, true)))
  }

  test("perfect falling order: mirrored L2, same z², rising = false") {
    val r = pg(Seq(
      ("b1", 1L, 3L), ("b1", 2L, 2L), ("b1", 3L, 1L),
      ("b2", 1L, 30L), ("b2", 2L, 20L), ("b2", 3L, 10L),
      ("b3", 1L, 7L), ("b3", 2L, 6L), ("b3", 3L, 5L)))
    assert(r === ((3L, 3L, 0L, 60L, 72L, 6000000L, false, true)))
  }

  test("tied pair dampens the trend below rejection") {
    // one block, A = B < C: r2 = (3, 3, 6) → L2 = 3 + 6 + 18 = 27,
    // E2 = 24, v144 = 288 → z² = 9·36·10⁶/288 = 1.125
    val r = pg(Seq(("b1", 1L, 5L), ("b1", 2L, 5L), ("b1", 3L, 9L)))
    assert(r === ((1L, 3L, 0L, 27L, 24L, 1125000L, true, false)))
  }

  test("incomplete blocks are excluded and counted") {
    val r = pg(Seq(
      ("b1", 1L, 5L), ("b1", 2L, 5L), ("b1", 3L, 9L),
      ("b2", 1L, 4L))) // b2 misses treatments 2, 3
    assert(r._1 === 1L && r._3 === 1L && r._4 === 27L)
  }
}
