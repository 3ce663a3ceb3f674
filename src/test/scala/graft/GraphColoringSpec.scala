package graft

import org.apache.spark.sql.functions.col

import graft.operators.GraphColoring

/** X309 Jones–Plassmann coloring: properness on every test graph
  * (no edge joins two equal colors), the Δ+1 bound, full node
  * coverage, star two-colorability, canonicalization, and
  * determinism across runs.
  */
class GraphColoringSpec extends SparkSpec {

  import spark.implicits._

  private def color(edges: Seq[(Long, Long)]): Map[Long, Int] =
    GraphColoring.jonesPlassmann(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Int)].collect().toMap

  private def assertProper(edges: Seq[(Long, Long)],
      c: Map[Long, Int]): Unit =
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      assert(c(a) != c(b), s"edge ($a,$b) monochromatic")
    }

  test("triangle needs exactly the colors {0, 1, 2}") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val c = color(edges)
    assertProper(edges, c)
    assert(c.values.toSet === Set(0, 1, 2))
  }

  test("star colors with exactly two colors, every node covered") {
    val edges = (2L to 9L).map(i => (1L, i))
    val c = color(edges)
    assertProper(edges, c)
    assert(c.keySet === (1L to 9L).toSet)
    assert(c.values.toSet.subsetOf(Set(0, 1)))
    assert(c.values.toSet.size === 2)
  }

  test("proper and within Delta+1 on a denser graph; deterministic") {
    // wheel: hub 0 + cycle 1..8 (Delta = 8)
    val rim = (1L to 8L).map(i => (i, if (i == 8L) 1L else i + 1))
    val edges = rim ++ (1L to 8L).map(i => (0L, i))
    val c = color(edges)
    assertProper(edges, c)
    assert(c.values.max <= 8)
    assert(color(edges) === c) // md5 priorities: same run, same answer
  }

  test("reversed/duplicate edges and self-loops canonicalize away") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 3L), (2L, 3L))
    val c = color(Seq((1L, 2L), (2L, 1L), (3L, 3L), (2L, 3L)))
    // self-loop node 3 still appears via its real edge (2,3)
    assertProper(edges.filter(e => e._1 != e._2), c)
    assert(c.keySet === Set(1L, 2L, 3L))
  }

  test("local finisher ≡ distributed JP rounds (incl. mid-loop switch)") {
    // JP with fixed priorities == sequential greedy in decreasing
    // (h, id) order; colors must match COLOR-FOR-COLOR, not just be
    // proper. 60 nodes, modular edges, triangle-rich.
    val edges = (0 until 220)
      .map(i => ((i * 17 % 60).toLong, (i * 41 % 60).toLong))
      .filter { case (a, b) => a != b }
    def run(cap: Long): Map[Long, Int] =
      GraphColoring.jonesPlassmann(edges.toDF("s", "d"), "s", "d",
        localFinishCap = cap).as[(Long, Int)].collect().toMap
    val viaDist = run(0L)
    assert(run(200000L) === viaDist) // round-0 switch
    assert(run(60L) === viaDist)     // mid-loop switch (uncol shrinks)
    assertProper(edges, viaDist)
  }
}
