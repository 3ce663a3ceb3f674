package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Moran's I spatial autocorrelation on a rook-adjacency lattice
  * (Moran 1950; Cliff & Ord 1981 normality moments) — the SPATIAL
  * clustering question next to the value-domain drift family: are
  * occupied embedding-grid cells surrounded by similarly-occupied
  * cells (I → +1 clusters, ≈ −1/(N−1) noise, → −1 checkerboards)?
  *
  * The lattice is the full bounding rectangle of the observed cells,
  * zero-filled — empty cells are REAL observations of emptiness, and
  * a complete rectangle makes every cell's rook degree analytic
  * ((cx>min)+(cx<max)+(cy>min)+(cy<max)): no adjacency join for the
  * moments at all, and Σ_adj z_i z_j needs only the RIGHT and UP
  * shifted equi-joins, doubled by symmetry.
  *
  * Exactness: with z_i = N·x_i − S every term is an integer:
  *   I = N·Σ_adj z_i z_j / (W·Σz²),  E[I] = −1/(N−1),
  * each emitted as ONE toward-zero micro division. The normality
  * variance (S1 = 2W, S2 = 4Σdeg²) and the α = 0.05 decision live on
  * the DEFINED micro grid — (i−e)²·10⁶ ≥ 3841458·var_micro — a
  * quantized z-test (error bounded by the 10⁻⁶ grid, identical in
  * both engines; the exact-rational form overflows decimal(38,0) on
  * the Σz² squares).
  *
  * Scale shape: one combine agg to occupied cells, a bounded
  * rectangle spine (grid-domain, never points), two shifted
  * equi-joins, metadata arithmetic after.
  */
object MoranI {

  /** points(cxCol, cyCol): pre-gridded integer cell coordinates, one
    * row per point. One row out: (n_cells, w_pairs, i_micro, e_micro,
    * var_micro, reject_05). A constant lattice (Σz² = 0) reports
    * zeros and no rejection. */
  def moran(points: DataFrame, cxCol: String, cyCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val occ = points.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"))
      .agg(count(lit(1)).as("c"))
    val b = occ.agg(min("cx").as("x0"), max("cx").as("x1"),
      min("cy").as("y0"), max("cy").as("y1"))
    val spine = b.select(explode(sequence(col("x0"), col("x1"))).as("cx"),
        col("x0"), col("x1"), col("y0"), col("y1"))
      .select(col("cx"), explode(sequence(col("y0"), col("y1"))).as("cy"),
        col("x0"), col("x1"), col("y0"), col("y1"))
    val cells = spine.join(occ, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), coalesce(col("c"), lit(0L)).as("x"),
        ((col("cx") > col("x0")).cast("long")
          + (col("cx") < col("x1")).cast("long")
          + (col("cy") > col("y0")).cast("long")
          + (col("cy") < col("y1")).cast("long")).as("deg"))
      .localCheckpoint(true) // moments + two shifted joins read it
    val m = cells.agg(count(lit(1)).as("n"), sum("x").as("s"),
      sum("deg").as("w"),
      sum(dec(col("deg")) * dec(col("deg"))).as("sdeg2"))
    val z = cells.crossJoin(broadcast(m)) // 1-row scalar join
      .select(col("cx"), col("cy"),
        (dec(col("n")) * dec(col("x")) - dec(col("s"))).as("z"))
      .localCheckpoint(true) // both sides of both shifted joins
    def shifted(dx: Int, dy: Int) = z
      .join(z.select((col("cx") - dx).as("cx"), (col("cy") - dy).as("cy"),
        col("z").as("z2")), Seq("cx", "cy"))
      .agg(coalesce(sum(col("z") * col("z2")), dec(lit(0L))).as("p"))
    val adj = shifted(1, 0).crossJoin(shifted(0, 1).select(col("p").as("p2")))
      .select((lit(2) * (col("p") + col("p2"))).as("sumadj"))
    val sz2 = z.agg(coalesce(sum(col("z") * col("z")), dec(lit(0L)))
      .as("sz2"))
    m.crossJoin(broadcast(adj)).crossJoin(broadcast(sz2))
      .select(col("sz2").as("_sz2"),
        col("n").as("n_cells"), col("w").as("w_pairs"),
        when(col("sz2") > 0 && col("w") > 0,
          graft.llm.TextOps.truncDivDec(
            dec(col("n")) * col("sumadj") * lit(1000000L),
            dec(col("w")) * col("sz2")).cast("long"))
          .otherwise(lit(0L)).as("i_micro"),
        when(col("n") > 1,
          -graft.llm.TextOps.floorDivDec(dec(lit(1000000L)),
            dec(col("n") - 1)).cast("long"))
          .otherwise(lit(0L)).as("e_micro"),
        when(col("n") > 1 && col("w") > 0,
          (graft.llm.TextOps.floorDivDec(
            (dec(col("n")) * dec(col("n")) * lit(2L) * dec(col("w"))
              - dec(col("n")) * lit(4L) * col("sdeg2")
              + lit(3L) * dec(col("w")) * dec(col("w"))) * lit(1000000L),
            dec(col("w")) * dec(col("w"))
              * (dec(col("n")) * dec(col("n")) - 1))
            - graft.llm.TextOps.floorDivDec(dec(lit(1000000L)),
              dec(col("n") - 1) * dec(col("n") - 1))).cast("long"))
          .otherwise(lit(0L)).as("var_micro"))
      .withColumn("reject_05",
        // z² = Δm²/(10⁶·vm) ≥ 3.841458 ⟺ Δm² ≥ 3841458·vm (micro
        // grid); a CONSTANT lattice (Σz² = 0) carries no test at all
        col("_sz2") > 0 && col("var_micro") > 0
          && dec(col("i_micro") - col("e_micro"))
            * dec(col("i_micro") - col("e_micro"))
            >= dec(lit(3841458L)) * dec(col("var_micro")))
      .select("n_cells", "w_pairs", "i_micro", "e_micro", "var_micro",
        "reject_05")
  }
}
