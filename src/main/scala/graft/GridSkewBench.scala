package graft

import org.apache.spark.sql.functions._
import graft.operators.GridJoin

/** Adversarial hot-cell artifact for the grid proximity join (the r12
  * verdict's task #2, the spatial sibling of NearDupSkewBench):
  * `proximityJoin`'s candidate work is quadratic PER CELL, and one
  * planted whale cluster — n co-located embeddings landing in a single
  * grid cell — contributes ~n²/2 candidates from that cell's own 3×3
  * neighborhood. This main PLANTS that hotspot inside a benign spread
  * corpus, measures candidate counts and wall-clock with `hotCellCap`
  * off and on, and checks the detection contract the MST/linkage
  * consumers need: with the cap on, every whale member still reaches
  * its cell's representative (connectivity preserved; only the
  * intra-cell pair LIST is thinned). Also measures the incremental
  * `proximityProbe` against a whale BASE cell.
  *
  * Prints one JSON line; recorded in BASELINE.md.
  */
object GridSkewBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-grid-skew").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (Double, T) = {
      val s = System.nanoTime()
      val out = f
      ((System.nanoTime() - s) / 1e9, out)
    }

    // benign corpus: 20k points in 10k isolated pairs — partners 30
    // apart (one qualifying pair each at maxDist = 40), pair anchors
    // 500 apart (never cross-pair candidates). Whale: 2000 points
    // packed into a 28×28-unit square — the square may straddle a
    // cell boundary, but any single cell's slice of it has diameter
    // ≤ 28√2 < 40, so every member is within maxDist of its own
    // cell's representative (the connectivity contract the star cap
    // must preserve).
    val benign = 20000L
    val hot = 2000L
    val pairs = spark.range(benign)
      .select(col("id"),
        expr("(id div 2) % 200 * 500 + (id % 2) * 30").as("x"),
        expr("(id div 2) div 200 * 500").as("y"))
    val whale = spark.range(benign, benign + hot)
      .select(col("id"),
        (lit(900000L) + (col("id") - benign) % 28L).as("x"),
        (lit(900000L) + ((col("id") - benign) / 28L).cast("long") % 28L)
          .as("y"))
    val pts = pairs.unionByName(whale).localCheckpoint(true)

    val (tUncapped, nUncapped) = time(GridJoin.candidatePairs(
      pts, "id", "x", "y", maxDist = 40L, shift = 1L << 20,
      hotCellCap = Int.MaxValue).count())
    val (tCapped, nCapped) = time(GridJoin.candidatePairs(
      pts, "id", "x", "y", maxDist = 40L, shift = 1L << 20,
      hotCellCap = 64).count())

    // detection contract under the cap: every whale member reaches the
    // representative (the downstream CC/MST input stays connected)
    val (tJoin, capped) = time(GridJoin.proximityJoin(
        pts, "id", "x", "y", maxDist = 40L, hotCellCap = 64)
      .localCheckpoint(true))
    val whaleTouched = capped
      .filter(col("id_a") >= benign || col("id_b") >= benign)
      .select(explode(array(col("id_a"), col("id_b"))).as("d"))
      .filter(col("d") >= benign).distinct().count()

    // incremental probe against the whale BASE: 500 new points at the
    // whale's location — uncapped work is |probe|·|whale|
    val probe = spark.range(benign + hot, benign + hot + 500L)
      .select(col("id"), lit(900010L).as("x"), lit(900010L).as("y"))
    val (tProbeUn, nProbeUn) = time(GridJoin.proximityProbe(
      probe, pts, "id", "x", "y", maxDist = 40L).count())
    val (tProbeCap, nProbeCap) = time(GridJoin.proximityProbe(
      probe, pts, "id", "x", "y", maxDist = 40L, hotCellCap = 64).count())

    val out = Map(
      "metric" -> "\"grid_skew\"",
      "benign_points" -> benign,
      "whale_points" -> hot,
      "candidates_uncapped" -> nUncapped,
      "candidates_capped" -> nCapped,
      "sec_candidates_uncapped" -> f"$tUncapped%.3f",
      "sec_candidates_capped" -> f"$tCapped%.3f",
      "sec_capped_join_end_to_end" -> f"$tJoin%.3f",
      "whale_points_connected_under_cap" -> whaleTouched,
      "probe_pairs_uncapped" -> nProbeUn,
      "probe_pairs_capped" -> nProbeCap,
      "sec_probe_uncapped" -> f"$tProbeUn%.3f",
      "sec_probe_capped" -> f"$tProbeCap%.3f")
    println(out.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}"))
    require(whaleTouched == hot,
      s"cap broke connectivity: $whaleTouched of $hot whale points touched")
    spark.stop()
  }
}
