package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Spectral bipartition by deflated power iteration on the LAZY random
  * walk (Fiedler 1973's algebraic connectivity read through the walk
  * matrix; Shi–Malik PAMI 2000's normalized cut is the same second
  * eigenvector) — the global complement to the local clustering the
  * dedup stack already has: single linkage (X315) merges through any
  * bridge, DBSCAN (X281) needs a density scale; the spectral sign cut
  * seeks the BOTTLENECK — two halves with few crossing edges relative
  * to volume — which is what a shard planner or a two-way partitioner
  * actually wants.
  *
  * Algebra: the walk matrix P = D⁻¹A has top eigenpair (1, const);
  * the second eigenvector changes sign across the sparsest cut
  * (Cheeger). Power iteration needs two fixes to land there: (1) the
  * LAZY step x ← (x + Px)/2 maps eigenvalues into [0, 1] so the
  * bipartite-ish negative end can't alternate; (2) deflation — after
  * every step subtract the stationary projection (Σdᵢxᵢ)/(Σdᵢ) (π ∝
  * d is P's LEFT top eigenvector, so this removes the constant
  * component exactly) — leaving the second eigenvector dominant.
  *
  * Rounds are accuracy, stated honestly: amplification of the target
  * eigenvector per round is 1/λ₂(within), and geometric proximity
  * graphs mix SLOWLY (tiny gap), so 8 rounds land on a smooth
  * low-frequency cut rather than the global optimum —
  * SpectralScaleBench measures it: conductance 0.161 vs 0.513 for a
  * random balanced cut on the 2× graph (3.2× better), while the
  * planted zero-conductance component split itself would need
  * O(1/gap) rounds (twin purity 0.555 recorded, not hidden).
  *
  * Exactness (the X200 PCA-power discipline): all integer — neighbor
  * sums are exact Longs, the per-node divide by dᵢ, the lazy halving,
  * the deflation constant (decimal(38,0) sums, truncating division:
  * Spark `div` and DuckDB `//` both truncate toward zero, pinned
  * (-7)//2 = -3), and the rescale to max|x| = scale. Both engines
  * replay every round bit-identically; "after `rounds` rounds" is the
  * semantics, convergence is an accuracy statement.
  *
  * Scale shape: one symmetrize + degree pass over the edge list, then
  * per round ONE edge⋈vector equi-join + combine sum (the matvec) and
  * two 1-row scalar aggregates broadcast back onto the node table.
  * Everything is |E| or |V| sized; no all-pairs shape anywhere, and
  * the rounds are bounded (8), so plain localCheckpoint per round is
  * the right barrier (SURVEY round-11: unbounded loops need
  * Iterate.cut, bounded ones don't).
  */
object SpectralCut {

  /** edges(loCol, hiCol): undirected unique pairs. Returns one row per
    * endpoint id: (id, score_q on the ±scale grid, pos_side). */
  def bipartition(edges: DataFrame, loCol: String, hiCol: String,
      rounds: Int = 8, scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val e = edges.select(col(loCol).as("a"), col(hiCol).as("b"))
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true) // the matvec side of every round
    val deg = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("d"))
    // Start: deterministic ±scale by md5 parity — any engine replays
    // it, and a generic sign pattern is not orthogonal to the target.
    val start = deg.select(col("id"), col("d"),
      when(conv(substring(md5(concat(lit("spec|"),
          col("id").cast("string"))), 1, 1), 16, 10).cast("long") % 2 === 0,
        lit(scale)).otherwise(lit(-scale)).as("x"))
    // Deflate (remove the stationary component) then rescale to
    // max|x| = scale so round r+1 starts on the same integer grid.
    def normalize(cur: DataFrame): DataFrame = {
      val s = cur.agg(sum(dec(col("d") * col("x"))).as("sdx"),
        sum(dec(col("d"))).as("sd"))
      val centered = cur.crossJoin(broadcast(s))
        .select(col("id"), col("d"),
          (col("x") - TextOps.truncDivDec(col("sdx"), col("sd"))
            .cast("long")).as("x"))
      val m = centered.agg(max(abs(col("x"))).as("m"))
      centered.crossJoin(broadcast(m))
        .select(col("id"), col("d"),
          when(col("m") > 0, expr(s"(x * $scale) div m"))
            .otherwise(lit(0L)).as("x"))
    }
    var x = normalize(start).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val nbr = sym
        .join(x.select(col("id").as("b"), col("x").as("xj")), "b")
        .groupBy(col("a").as("id")).agg(sum("xj").as("sx"))
      val stepped = x.join(nbr, "id")
        .select(col("id"), col("d"),
          expr("(x + (sx div d)) div 2").as("x"))
      x = normalize(stepped).localCheckpoint(true)
    }
    x.select(col("id"), col("x").as("score_q"),
      (col("x") >= 0).as("pos_side"))
  }
}
