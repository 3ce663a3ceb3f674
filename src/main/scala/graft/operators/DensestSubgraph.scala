package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Densest-subgraph peeling (Bahmani–Kumar–Vattani, VLDB 2012) — the
  * MapReduce 2(1+ε)-approximation to the Goldberg max-density
  * subgraph: repeatedly delete every vertex whose degree is below
  * 2(1+ε)·ρ (ρ = |E|/|V| the current average density) and remember
  * the densest intermediate state. With ε = ½ (threshold 3ρ) at most
  * ⅔ of the survivor set can clear the bar each round (Σdeg = 2|E|,
  * so at most 2|V|/3 vertices hold degree ≥ 3|E|/|V|), giving a
  * deterministic ⌈log_{1.5}|V|⌉+1 round bound and a 3-approximation
  * guarantee — the round-bounded shape a 1000-executor job needs
  * (each round is one degree aggregate plus two semi-joins; no
  * windows, no driver-side graph).
  * No reference counterpart (SURVEY §2.6); north-star extension
  * surface — "find the boilerplate/core cluster worth inspecting" is
  * the graph-side sibling of the hot-band dedup caps.
  *
  * Exactness: the peel threshold is the CROSS-MULTIPLIED integer test
  * deg(v)·|V| ≥ 3·|E| — no ratio is ever materialized — and the
  * reported density is the floored micro ⌊10⁶·|E|/|V|⌋, so the DuckDB
  * oracle replays every round bit-for-bit from the same edge list.
  *
  * Driver actions: one 2-long aggregate fetch per round (the stats
  * ARE the output — bounded by the round count, ≤ maxRounds rows
  * total), the FacilityLocation bounded-collect discipline.
  *
  * Returns one row per peeling round, the state BEFORE that round's
  * peel: (round, n_vertices, n_edges, density_micro, is_best);
  * is_best marks the max-density round (first such round on ties) —
  * its survivor set is the approximate densest subgraph.
  */
object DensestSubgraph {

  /** Edges undirected (srcCol, dstCol), duplicates/self-loops assumed
    * pre-removed by the caller. Vertices = edge endpoints (isolated
    * input vertices carry no density and are ignored). */
  def peel(
      spark: SparkSession,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 32): DataFrame = {
    // Iterate.cut, not plain localCheckpoint: the loop joins e against
    // projections of itself every round, and carried origin stats
    // would square per round (the Borůvka BigInteger-overflow gotcha)
    var e = Iterate.cut(
      edges.select(col(srcCol).as("a"), col(dstCol).as("b")))
    val stats = Seq.newBuilder[(Int, Long, Long)]
    var round = 0
    var done = false
    while (!done) {
      // degree per surviving vertex; survivors of the PREVIOUS peel
      // that lost all edges have degree 0 here and are dropped — the
      // vertex set tracked is the edge-endpoint set, matching the
      // density denominator below.
      val deg = e.select(col("a").as("n"))
        .unionAll(e.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
        .localCheckpoint() // stats fetch + survivor filter share it
      val Array(vRow) = deg.agg(count(lit(1)), sum("d")).collect()
      val v = vRow.getLong(0)
      val m = if (v == 0) 0L else vRow.getLong(1) / 2 // Σdeg = 2|E|
      if (v > 0) stats += ((round, v, m))
      if (v == 0 || m == 0) done = true
      else {
        round += 1
        if (round >= maxRounds) throw new IllegalStateException(
          s"DensestSubgraph: not exhausted after $maxRounds rounds "
            + s"($v vertices, $m edges remain) — the ⅔-shrink bound "
            + "guarantees ⌈log₁.₅|V|⌉+1 rounds; raise maxRounds for "
            + "larger graphs")
        val keep = deg.filter(col("d") * v >= 3L * m).select("n")
        e = Iterate.cut(e
          .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi"))
      }
    }
    val rows = stats.result()
    val bestDensity = rows.map { case (_, v, m) => 1000000L * m / v }
      .foldLeft(0L)(math.max)
    val bestRound = rows
      .collectFirst { case (r, v, m) if 1000000L * m / v == bestDensity => r }
      .getOrElse(-1)
    import spark.implicits._
    rows.toDF("round", "n_vertices", "n_edges")
      .select(col("round").cast("int"),
        col("n_vertices"), col("n_edges"),
        // integer div, NOT `/` — Spark's `/` on longs returns DOUBLE
        expr("(1000000 * n_edges) div n_vertices").as("density_micro"),
        (col("round") === bestRound).as("is_best"))
  }
}
