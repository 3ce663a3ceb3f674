package graft

import org.apache.spark.sql.functions._
import graft.operators.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def tris(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    Triangles.triangleList(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long)].collect().toSet

  test("K4 has exactly its four triangles") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(tris(k4) === Set((0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 3L), (1L, 2L, 3L)))
  }

  test("paths and stars are triangle-free") {
    assert(tris(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Set.empty)
    assert(tris((1L to 20L).map(i => (0L, i))) === Set.empty)
  }

  test("celebrity hub + one closing edge yields exactly one triangle") {
    // the star's center has degree 21 — naive middle-vertex wedging
    // would generate 210 candidates; orientation points every star
    // edge AWAY from the leaves into the hub, so only the closed wedge
    // survives generation
    val star = (1L to 20L).map(i => (0L, i)) :+ (7L, 8L)
    assert(tris(star) === Set((0L, 7L, 8L)))
  }

  test("duplicate, reversed, and self-loop edges do not change the count") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = base ++ Seq((2L, 1L), (3L, 2L), (1L, 2L), (2L, 2L))
    assert(tris(base) === Set((1L, 2L, 3L)))
    assert(tris(noisy) === tris(base))
  }

  test("matches brute force on a deterministic pseudo-random graph") {
    val n = 24
    val edges = (for {
      a <- 0 until n; b <- 0 until n
      if a < b && (a * 31 + b * 17) % 5 == 0
    } yield (a.toLong, b.toLong))
    val es = edges.toSet
    val brute = (for {
      a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n
      if es((a.toLong, b.toLong)) && es((b.toLong, c.toLong)) && es((a.toLong, c.toLong))
    } yield (a.toLong, b.toLong, c.toLong)).toSet
    assert(tris(edges) === brute)
    assert(brute.nonEmpty) // the fixture must actually exercise closure
  }
}
