package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rich-club coefficient curve φ(k) (Zhou & Mondragón 2004; Colizza
  * et al. 2006 normalization left to the caller's null model) — the
  * "do the hubs talk to each other" readout next to assortativity's
  * single global correlation: φ(k) = 2·E_k/(N_k(N_k−1)) over the
  * subgraph induced by nodes of degree > k, traced across every
  * threshold at once.
  *
  * Exactness & shape: an edge survives threshold k iff
  * min(deg_a, deg_b) > k, and that min IS one of the graph's degree
  * values — so BOTH curves come from cumulative windows over the
  * DEGREE-VALUE spine (value-domain sized, never nodes or edges):
  * N_k = totN − cumN(k), E_k = totE − cumE(k), and φ is one floored
  * micro division per threshold. No per-threshold subgraph is ever
  * materialized; thresholds where N_k < 2 are dropped (φ undefined).
  */
object RichClub {

  /** edges(aCol, bCol): undirected simple edges, a ≠ b. One row per
    * distinct degree threshold k with N_k ≥ 2:
    * (k, n_rich, e_rich, phi_micro), ascending k. */
  def curve(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true) // degree agg + the min-degree pass read it
    val deg = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .localCheckpoint(true) // spine + both edge-end joins read it
    val dhist = deg.groupBy("d").agg(count(lit(1)).as("nc"))
    val emin = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(least(col("da"), col("db")).as("d"))
      .groupBy("d").agg(count(lit(1)).as("ec"))
    val spine = dhist.join(emin, Seq("d"), "left")
      .select(col("d"), col("nc"), coalesce(col("ec"), lit(0L)).as("ec"))
    val tot = spine.agg(sum("nc").as("tn"), sum("ec").as("te"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .withColumn("cn", sum("nc").over(w))
      .withColumn("ce", sum("ec").over(w))
      .crossJoin(broadcast(tot)) // 1-row scalar join
      .select(col("d").as("k"),
        (col("tn") - col("cn")).as("n_rich"),
        (col("te") - col("ce")).as("e_rich"))
      .filter(col("n_rich") >= 2)
      .withColumn("phi_micro",
        expr("(2 * e_rich * 1000000) div (n_rich * (n_rich - 1))"))
      .orderBy("k")
  }
}
