package graft

import graft.operators.SpectralCut

/** X323 spectral bipartition: the barbell graph — two K4 cliques
  * joined by one bridge — must split exactly at the bridge (the
  * sparsest cut), sides must be clean, and the integer iteration must
  * be bit-deterministic across runs.
  */
class SpectralCutSpec extends SparkSpec {

  import spark.implicits._

  // K4 on {1..4}, K4 on {5..8}, bridge 4-5.
  private val barbell = (
    (for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong)) ++
      (for { a <- 5 to 8; b <- (a + 1) to 8 } yield (a.toLong, b.toLong)) ++
      Seq((4L, 5L))).toDF("lo", "hi")

  test("barbell splits at the bridge with clean sides") {
    val out = SpectralCut.bipartition(barbell, "lo", "hi", rounds = 8)
      .as[(Long, Long, Boolean)].collect()
    assert(out.map(_._1).sorted === (1L to 8L).toArray)
    val side = out.map(r => r._1 -> r._3).toMap
    assert(Set(1L, 2L, 3L, 4L).map(side).size === 1,
      s"left clique must be one side: $side")
    assert(Set(5L, 6L, 7L, 8L).map(side).size === 1,
      s"right clique must be one side: $side")
    assert(side(1L) !== side(8L), s"cliques must take opposite sides: $side")
    // scores live on the +-scale grid and the extremes are far from 0
    assert(out.forall(r => math.abs(r._2) <= 1000000L))
    assert(out.map(r => math.abs(r._2)).max === 1000000L)
  }

  test("integer iteration is bit-deterministic across runs") {
    val a = SpectralCut.bipartition(barbell, "lo", "hi", rounds = 8)
      .as[(Long, Long, Boolean)].collect().toSet
    val b = SpectralCut.bipartition(barbell, "lo", "hi", rounds = 8)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(a === b)
  }
}
