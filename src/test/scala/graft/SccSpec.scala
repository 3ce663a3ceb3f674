package graft

import graft.operators.Scc

/** Hand-checked semantics for the FB-coloring strongly-connected-
  * components operator.
  */
class SccSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long]) =
    Scc.components(edges.toDF("src", "dst"), nodes.toDF("id"))
      .as[(Long, Long)].collect().toMap

  test("triangle plus tail: cycle collapses, tail stays singleton") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)),
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }

  test("two cycles behind a bridge need the outer peel") {
    // {1,2} and {3,4} are separate SCCs; 2→3 bridges them one-way.
    // Round 1 colors everything 1 but only {1,2} reaches the root —
    // {3,4} must survive to the second peel.
    val got = run(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L)),
      Seq(1L, 2L, 3L, 4L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("isolated nodes and a self-contained DAG are all singletons") {
    val got = run(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L, 9L))
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 9L -> 9L))
  }
}
