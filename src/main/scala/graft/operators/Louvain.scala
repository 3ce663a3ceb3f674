package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One synchronous Louvain phase-1 local-move round from singleton
  * communities (Blondel et al. 2008) — the MODULARITY-seeking move
  * next to label propagation's frequency-seeking one (llm_label_prop /
  * llm_modularity score an LPA partition; this operator performs the
  * Louvain move itself and reports the modularity delta it buys).
  *
  * From singletons, the gain of node i adopting neighbor j's
  * community is ΔQ = w_ij/m − k_i·k_j/(2m²); with m2 = 2m = Σk the
  * ranking (and the >0 test) cross-multiplies EXACTLY:
  *   gain2(i,j) = m2·w_ij − k_i·k_j     (shared positive denominator)
  * Each node picks argmax over neighbors (gain2 desc, j asc) when the
  * best gain is positive, else stays — a deterministic SYNCHRONOUS
  * sweep (all decisions read the singleton state; adoption chains are
  * part of the defined semantics, as in parallel Louvain variants).
  * Modularity before/after in the llm_modularity identity
  *   Q·m2² = Σ_c (2·in_c·m2 − tot_c²),
  * one toward-zero micro division at the end (Q can be negative).
  *
  * Scale shape: degrees and m2 are combine aggs; gains live on the
  * EDGE list (one row per directed edge — never nodes²); the argmax
  * is a per-node window over each node's adjacency; both modularity
  * sides are label-keyed combine aggs. No iteration, no collect.
  */
object Louvain {

  /** edges(aCol, bCol, wCol): undirected weighted edges, a < b. One
    * row: (n_nodes, n_communities, n_moved, q_before_micro,
    * q_after_micro). */
  def moveRound(edges: DataFrame, aCol: String, bCol: String,
      wCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"),
      col(wCol).as("w")).localCheckpoint(true) // sym + in_w both read it
    val sym = e.select(col("a").as("n"), col("b").as("m"), col("w"))
      .unionAll(e.select(col("b").as("n"), col("a").as("m"), col("w")))
    val deg = sym.groupBy("n").agg(sum("w").as("k"))
      .localCheckpoint(true) // gains, labels, totals all read it
    val m2t = deg.agg(sum(dec(col("k"))).as("m2"))
    val g = sym
      .join(deg.select(col("n"), col("k").as("kn")), "n")
      .join(deg.select(col("n").as("m"), col("k").as("km")), "m")
      .crossJoin(broadcast(m2t)) // 1-row scalar join
      .select(col("n"), col("m"),
        (col("m2") * dec(col("w")) - dec(col("kn")) * dec(col("km")))
          .as("g2"))
    val pick = g.filter(col("g2") > 0)
      .withColumn("rk", row_number().over(Window.partitionBy("n")
        .orderBy(col("g2").desc, col("m"))))
      .filter(col("rk") === 1)
      .select(col("n"), col("m").as("adopt"))
    val lbl = deg.select("n")
      .join(pick, Seq("n"), "left")
      .select(col("n"), coalesce(col("adopt"), col("n")).as("lbl"))
      .localCheckpoint(true) // totals + in_w + move count read it
    val tot = deg.join(lbl, "n").groupBy("lbl")
      .agg(sum(dec(col("k"))).as("tot_k"))
    val inw = e
      .join(lbl.select(col("n").as("a"), col("lbl").as("la")), "a")
      .join(lbl.select(col("n").as("b"), col("lbl").as("lb")), "b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lbl"))
      .agg(sum(dec(col("w"))).as("in_w"))
    val qparts = tot.join(inw, Seq("lbl"), "left")
      .crossJoin(broadcast(m2t))
      .select((lit(2) * coalesce(col("in_w"), dec(lit(0L))) * col("m2")
        - col("tot_k") * col("tot_k")).as("qn"))
      .agg(sum("qn").as("q_after_num"))
    val stats = lbl.agg(count(lit(1)).as("n_nodes"),
      countDistinct(col("lbl")).as("n_communities"),
      sum(when(col("n") =!= col("lbl"), 1L).otherwise(0L)).as("n_moved"))
    val sk2 = deg.agg(sum(dec(col("k")) * dec(col("k"))).as("sk2"))
    stats.crossJoin(broadcast(m2t)).crossJoin(broadcast(sk2))
      .crossJoin(broadcast(qparts)) // three 1-row scalar joins
      .select(col("n_nodes"), col("n_communities"), col("n_moved"),
        graft.llm.TextOps.truncDivDec(-col("sk2") * lit(1000000L),
          col("m2") * col("m2")).cast("long").as("q_before_micro"),
        graft.llm.TextOps.truncDivDec(col("q_after_num") * lit(1000000L),
          col("m2") * col("m2")).cast("long").as("q_after_micro"))
  }
}
