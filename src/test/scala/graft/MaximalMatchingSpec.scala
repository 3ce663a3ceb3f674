package graft

import graft.operators.MaximalMatching

/** X376 locally-minimal maximal matching: the matching and maximality
  * properties on a fixed graph, the single-winner primitives, the
  * empty degenerate, and determinism across runs.
  */
class MaximalMatchingSpec extends SparkSpec {

  import spark.implicits._

  private def matchOf(edges: Seq[(Long, Long)]) =
    MaximalMatching.matching(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Int)].collect().toSeq

  // a 12-vertex graph with a clique, a path, and a star mixed in
  private val g: Seq[(Long, Long)] =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (7L, 8L), (7L, 9L), (7L, 10L), (7L, 11L), (11L, 12L))

  test("result is a matching: no vertex appears twice") {
    val m = matchOf(g)
    val verts = m.flatMap { case (a, b, _) => Seq(a, b) }
    assert(verts.distinct.size === verts.size)
  }

  test("result is MAXIMAL: every input edge touches a matched vertex") {
    val covered = matchOf(g).flatMap { case (a, b, _) => Seq(a, b) }.toSet
    assert(g.forall { case (a, b) => covered(a) || covered(b) })
  }

  test("a single edge matches itself in round 1") {
    assert(matchOf(Seq((1L, 2L))) === Seq((1L, 2L, 1)))
  }

  test("a triangle yields exactly one matched edge") {
    val m = matchOf(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(m.size === 1)
  }

  test("empty input yields an empty matching") {
    assert(matchOf(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("deterministic: two runs agree exactly") {
    assert(matchOf(g) === matchOf(g))
  }

  test("star center matches exactly one leaf") {
    val star = (2L to 8L).map(i => (1L, i))
    val m = matchOf(star)
    assert(m.size === 1 && m.head._1 === 1L)
  }
}
