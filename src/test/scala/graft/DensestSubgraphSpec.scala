package graft

import graft.operators.DensestSubgraph

/** X375 BKV densest-subgraph peeling: a hand-computed clique-plus-tail
  * trajectory, the exact micro density grid, the empty degenerate, and
  * the loud round-cap contract.
  */
class DensestSubgraphSpec extends SparkSpec {

  import spark.implicits._

  private def peel(edges: Seq[(Long, Long)], maxRounds: Int = 32) =
    DensestSubgraph.peel(spark, edges.toDF("a", "b"), "a", "b", maxRounds)
      .as[(Int, Long, Long, Long, Boolean)].collect().toSeq

  // K6 on 1..6 plus a 20-edge pendant path hanging off vertex 6
  private val k6 = for {
    i <- 1L to 6L; j <- (i + 1) to 6L
  } yield (i, j)
  private val tail = (6L until 26L).map(i => (i, i + 1))
  private val cliqueTail = k6 ++ tail

  test("peel strips the tail first, then the clique: hand trajectory") {
    // round 0: V=26, E=35, ρ=35/26 → threshold deg ≥ 3·35/26 ≈ 4.04:
    // clique degrees 5..6 survive, path degrees ≤ 2 die.
    // round 1: the bare K6 (V=6, E=15, ρ=2.5) → threshold 7.5 kills all.
    assert(peel(cliqueTail) === Seq(
      (0, 26L, 35L, 1346153L, false),
      (1, 6L, 15L, 2500000L, true)))
  }

  test("best round is the max-density state, not the last") {
    val rows = peel(cliqueTail)
    assert(rows.filter(_._5).map(_._1) === Seq(1))
    assert(rows.map(_._4).max === 2500000L)
  }

  test("a bare clique reports exactly one state") {
    // K4: V=4, E=6, ρ=1.5, threshold deg·4 ≥ 18 → deg ≥ 4.5 > 3: all die
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    assert(peel(k4) === Seq((0, 4L, 6L, 1500000L, true)))
  }

  test("empty edge set yields zero rounds") {
    assert(peel(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("the round cap raises loudly instead of truncating") {
    val e = intercept[IllegalStateException] {
      peel(cliqueTail, maxRounds = 1)
    }
    assert(e.getMessage.contains("DensestSubgraph"))
  }
}
