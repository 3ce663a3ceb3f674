package graft

import org.apache.spark.sql.functions.col

import graft.operators.Matching

/** X316 locally-dominant matching: equality with sequential greedy on
  * hand graphs, vertex-disjointness + maximality properties, the
  * adversarial increasing chain (one dominant edge per round), and
  * tie-breaking by (w, lo, hi).
  */
class MatchingSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)],
      maxRounds: Int = 24): Set[(Long, Long, Long)] =
    Matching.greedy(edges.toDF("a", "b", "w"), "a", "b", "w", maxRounds)
      .as[(Long, Long, Long)].collect().toSet

  test("triangle: the lightest edge matches, the third node is alone") {
    assert(run(Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 3L)))
      === Set((2L, 3L, 1L)))
  }

  test("path with increasing weights: sequential-greedy result, "
    + "one dominant edge per round") {
    // greedy by ascending w takes (1,2) then (3,4): 2 rounds needed
    val m = run(Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L)))
    assert(m === Set((1L, 2L, 1L), (3L, 4L, 3L)))
    intercept[IllegalArgumentException] {
      run(Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L)), maxRounds = 1)
    }
  }

  test("equal weights break by (lo, hi); matching is vertex-disjoint "
    + "and maximal") {
    val edges = Seq((1L, 2L, 4L), (2L, 3L, 4L), (3L, 4L, 4L),
      (4L, 5L, 4L), (5L, 6L, 4L))
    val m = run(edges)
    assert(m === Set((1L, 2L, 4L), (3L, 4L, 4L), (5L, 6L, 4L)))
    val touched = m.flatMap(e => Seq(e._1, e._2))
    assert(touched.size === 2 * m.size) // disjoint
    edges.foreach { case (a, b, _) => // maximal
      assert(touched(a) || touched(b))
    }
  }

  test("parallel and reversed edges collapse; empty input is empty") {
    assert(run(Seq((2L, 1L, 9L), (1L, 2L, 3L))) === Set((1L, 2L, 3L)))
    assert(run(Seq.empty) === Set.empty)
  }
}
