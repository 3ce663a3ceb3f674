package graft

import graft.operators.RichClub

/** X355 rich-club curve: a triangle with a pendant (perfect club), the
  * two-triangle bridge where the club IS the bridge, and the star
  * whose club is degenerate (no row — φ undefined below 2 nodes).
  */
class RichClubSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]) =
    RichClub.curve(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("triangle with a pendant: the deg>1 club is the perfect triangle") {
    val r = run(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    // thresholds are the observed degree values; only k = 1 keeps ≥ 2
    // nodes: {1,2,3} with all 3 internal edges → φ = 1
    assert(r === Seq((1L, 3L, 3L, 1000000L)))
  }

  test("two triangles and a bridge: the rich club IS the bridge") {
    val r = run(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)))
    // deg(3) = deg(4) = 3, everyone else 2: the deg>2 club is the two
    // hubs joined by the bridge edge → φ = 1; the full-graph row sits
    // at no threshold because no node has degree < 2
    assert(r === Seq((2L, 2L, 1L, 1000000L)))
  }

  test("star: every club below 2 nodes is dropped, curve is empty") {
    assert(run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).isEmpty)
  }
}
