package graft

import graft.operators.ClusteringCoefficient

/** X308 local clustering coefficient: K4-minus-an-edge hand values,
  * the deg < 2 convention, triangle-free wedges, and input
  * canonicalization (reversed/duplicate edges).
  */
class ClusteringCoefficientSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]) =
    ClusteringCoefficient.perNode(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Double)].collect().toSet

  test("K4 minus one edge: hand-computed per-node lcc") {
    // edges: all pairs of {1,2,3,4} except (3,4); triangles (1,2,3),(1,2,4)
    val out = run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
    assert(out === Set(
      (1L, 3L, 2L, 0.666667), // 2*2/(3*2)
      (2L, 3L, 2L, 0.666667),
      (3L, 2L, 1L, 1.0), // its single wedge closes
      (4L, 2L, 1L, 1.0)))
  }

  test("open wedge scores 0 at the apex; leaves (deg 1) score 0") {
    val out = run(Seq((1L, 2L), (2L, 3L)))
    assert(out === Set(
      (1L, 1L, 0L, 0.0), (2L, 2L, 0L, 0.0), (3L, 1L, 0L, 0.0)))
  }

  test("reversed and duplicate edges canonicalize before counting") {
    val out = run(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L)))
    assert(out === Set(
      (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0), (3L, 2L, 1L, 1.0)))
  }
}
