package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.GridJoin

/** hotCellCap contract for the grid proximity join (r12 verdict #2 —
  * the hotBandCap discipline applied to GridJoin): default cap keeps
  * exact classical semantics; under a cap, a whale cell degrades to a
  * star around its min-id representative (connectivity preserved,
  * intra-cell pair list thinned), cold cells and mixed cold↔hot pairs
  * stay EXACT, and no pair is invented.
  */
class GridJoinCapSpec extends SparkSpec {

  import spark.implicits._

  // one whale cell: ids 1-5 packed within dist 4 of each other at the
  // origin corner (cell side = maxDist = 15; with shift 2²⁰ the cell
  // boundary falls at coord 14, so 0..13 share one cell); a cold
  // neighbor (6) at (0,14) — the ADJACENT cell, within 15 of every
  // whale member; an isolated cold pair (7, 8); a loner (9)
  private val pts: DataFrame = Seq(
    (1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 2L, 2L), (5L, 3L, 0L),
    (6L, 0L, 14L), (7L, 200L, 200L), (8L, 205L, 200L),
    (9L, 500L, 500L)).toDF("id", "x", "y")

  private def pairs(df: DataFrame): Set[(Long, Long, Long)] =
    df.as[(Long, Long, Long)].collect().toSet

  test("default cap is the exact classical join") {
    val exact = pairs(GridJoin.proximityJoin(pts, "id", "x", "y",
      maxDist = 15L))
    // brute force over the 9 points
    val raw = pts.as[(Long, Long, Long)].collect()
    val brute = (for {
      a <- raw; b <- raw if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= 225L
    } yield (a._1, b._1, d2)).toSet
    assert(exact === brute)
    assert(exact === pairs(GridJoin.proximityJoin(pts, "id", "x", "y",
      maxDist = 15L, hotCellCap = Int.MaxValue)))
  }

  test("capped join: star inside the whale cell, exact elsewhere, subset overall") {
    val exact = pairs(GridJoin.proximityJoin(pts, "id", "x", "y",
      maxDist = 15L))
    val capped = pairs(GridJoin.proximityJoin(pts, "id", "x", "y",
      maxDist = 15L, hotCellCap = 3))
    // no invented pairs
    assert(capped.subsetOf(exact))
    // whale members 2-5 each keep their edge to representative 1
    Seq(2L, 3L, 4L, 5L).foreach { m =>
      assert(capped.exists(p => p._1 == 1L && p._2 == m),
        s"star edge 1-$m missing")
    }
    // the cold pair far away is untouched
    assert(capped.exists(p => p._1 == 7L && p._2 == 8L))
    // mixed cold↔hot pairs stay exact: 6 at (0,14) is within 15 of
    // every whale member, from its own (cold, adjacent) cell
    Seq(1L, 2L, 3L, 4L, 5L).foreach { m =>
      assert(capped.contains(exact.find(p =>
        p._1 == m && p._2 == 6L).get), s"mixed pair $m-6 missing")
    }
    // what's traded away: non-representative intra-whale pairs
    assert(!capped.exists(p => p._1 == 2L && p._2 == 3L))
    assert(exact.exists(p => p._1 == 2L && p._2 == 3L))
  }

  test("capped join preserves whale connectivity in the CC sense") {
    val capped = GridJoin.proximityJoin(pts, "id", "x", "y",
      maxDist = 15L, hotCellCap = 3)
    val touched = capped
      .select(explode(array(col("id_a"), col("id_b"))).as("d"))
      .filter(col("d") <= 5L).distinct().count()
    assert(touched === 5L) // every whale member appears in some pair
  }

  test("capped probe exposes only the whale representative to the batch") {
    val batch = Seq((100L, 1L, 1L)).toDF("id", "x", "y")
    val exact = pairs(GridJoin.proximityProbe(batch, pts, "id", "x", "y",
      maxDist = 15L))
    val capped = pairs(GridJoin.proximityProbe(batch, pts, "id", "x", "y",
      maxDist = 15L, hotCellCap = 3))
    assert(capped.subsetOf(exact))
    // probe reaches the representative (cluster connectivity)...
    assert(capped.exists(p => p._1 == 1L && p._2 == 100L))
    // ...but not the whale's other members
    assert(!capped.exists(p => p._1 == 2L && p._2 == 100L))
    // cold base cells stay exact: 6 at (0,14) is within 15 of (1,1)
    assert(capped.exists(p => p._1 == 6L && p._2 == 100L))
    // uncapped probe finds the full member set
    Seq(1L, 2L, 3L, 4L, 5L, 6L).foreach { m =>
      assert(exact.exists(p => p._1 == m && p._2 == 100L))
    }
  }
}
