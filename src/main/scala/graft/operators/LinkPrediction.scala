package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction (Liben-Nowell & Kleinberg
  * CIKM'03) — score NON-adjacent node pairs of an undirected weighted
  * graph by how much their neighborhoods overlap: common-neighbor
  * count, Jaccard overlap, and Adamic–Adar (Σ 1/ln deg(w) over shared
  * neighbors w — rare shared neighbors count more). The "which edge
  * appears next" readout over a co-occurrence graph: parts likely to
  * be co-ordered, docs likely to share a cluster. No reference
  * counterpart (SURVEY §2.6); north-star extension surface (X258).
  *
  * Candidate generation is the wedge join — the same C(deg, 2)
  * per-center blowup as triangle counting (X116), bounded here the
  * X148 way: each center's neighbor list is CAPPED at `cap` entries
  * (weight DESC, id ASC — deterministic, hence reproducible AND
  * oracle-checkable) before pairing, so fan-out is ≤ C(cap, 2) per
  * center regardless of hub skew. ALL THREE scores are then defined
  * self-consistently on the capped structure: with Γ'(u) = {w : u ∈
  * capped(w)} the reverse-membership neighborhood,
  *   cn(u,v)   = |Γ'(u) ∩ Γ'(v)|      (wedge count),
  *   jacc(u,v) = cn / (|Γ'(u)| + |Γ'(v)| − cn)   (exact set identity),
  *   aa(u,v)   = Σ_w 1/ln|capped(w)|  (per-center capped degree ≥ 2
  *               for every wedge center, so ln > 0 always).
  * Capping bias is the documented production trade (X148): pairs
  * hidden behind a hub's dropped tail are undercounted.
  *
  * Determinism: 1/ln in integer micro — 10¹² div ⌊ln(deg)·10⁶⌋ per
  * center (the micro-floored-ln discipline; deg is a small integer,
  * so only ≤ cap−1 distinct ln evaluations exist), summed as exact
  * longs. The top-k order (cn DESC, aa_micro DESC, a ASC, b ASC) is
  * total. Jaccard is the one round6 display ratio.
  *
  * Scale: symmetrize + cap is one window per center; the wedge join
  * is an equi-join on the center key with ≤ cap×cap fan-out; existing
  * edges leave via one anti-join; reverse degrees are one combine
  * agg joined back twice; the only sort is the TakeOrdered top-k.
  * Nothing enumerates node pairs that share no center.
  */
object LinkPrediction {

  /** edges: one row per undirected edge (aCol < bCol) with `weight`. */
  def scores(edges: DataFrame, aCol: String, bCol: String,
      cap: Int, topK: Int): DataFrame = {
    require(cap >= 2, s"cap ($cap) must be >= 2")
    require(topK >= 1, s"topK ($topK) must be >= 1")
    val adj = edges.select(col(aCol).as("ctr"), col(bCol).as("nbr"),
        col("weight"))
      .unionAll(edges.select(col(bCol).as("ctr"), col(aCol).as("nbr"),
        col("weight")))
    val byCtr = Window.partitionBy("ctr")
      .orderBy(col("weight").desc, col("nbr"))
    val capped = adj
      .withColumn("_r", row_number().over(byCtr))
      .filter(col("_r") <= cap)
      .select("ctr", "nbr")
      .localCheckpoint(eager = true) // 3 consumers below (deg, rdeg, wedges)
    // per-center capped degree -> the AA weight 10^12 div floor(ln d * 10^6);
    // wedge centers always have deg >= 2, so ln is never 0
    val degAa = capped.groupBy("ctr").agg(count(lit(1)).as("_d"))
      .filter(col("_d") >= 2)
      .select(col("ctr"),
        expr("1000000000000L DIV CAST(floor(ln(_d) * 1000000) AS LONG)")
          .as("aa_c"))
    val rdeg = capped.groupBy(col("nbr").as("node"))
      .agg(count(lit(1)).as("rdeg"))
    val wedges = capped.as("x").join(capped.as("y"), Seq("ctr"))
      .filter(col("x.nbr") < col("y.nbr"))
      .join(degAa, "ctr")
      .select(col("x.nbr").as("a"), col("y.nbr").as("b"), col("aa_c"))
    val cand = wedges.groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum("aa_c").as("aa_micro"))
      .join(edges.select(col(aCol).as("a"), col(bCol).as("b")),
        Seq("a", "b"), "left_anti")
    cand
      .join(rdeg.select(col("node").as("a"), col("rdeg").as("rdeg_a")), "a")
      .join(rdeg.select(col("node").as("b"), col("rdeg").as("rdeg_b")), "b")
      .select(col("a").as("item_a"), col("b").as("item_b"), col("cn"),
        col("aa_micro"), col("rdeg_a"), col("rdeg_b"),
        graft.llm.TextOps.round6(col("cn").cast("double")
          / (col("rdeg_a") + col("rdeg_b") - col("cn")).cast("double"))
          .as("jaccard"))
      .orderBy(col("cn").desc, col("aa_micro").desc, col("item_a"),
        col("item_b"))
      .limit(topK)
  }
}
