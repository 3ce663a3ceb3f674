package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07) — the
  * third leg of the release-privacy family: k-anonymity bounds group
  * SIZE, l-diversity bounds sensitive-value VARIETY, and t-closeness
  * bounds the INFORMATION an equivalence class leaks by requiring the
  * class's sensitive-value distribution to stay within Earth Mover's
  * Distance t of the global one (an attacker who already knows the
  * global distribution learns little from class membership).
  *
  * For an ORDERED sensitive attribute with m values the paper's EMD
  * closed form is (1/(m−1)) · Σᵢ |Σ_{j≤i}(P_j − Q_j)| — prefix sums of
  * the distribution gap. Everything here stays in exact integers until
  * the single final division: with class size n_c and corpus size N,
  * the per-band gap scales to cnt_{c,i}·N − g_i·n_c (longs at test
  * scale; route the two products through decimal(38,0) at petabyte row
  * counts), its running prefix D_i is summed as Σ|D_i| over ALL bands
  * (the last prefix is identically 0 — Σcnt·N = n_c·N = Σg·n_c — so no
  * band-index bookkeeping), and t = Σ|D_i| / ((m−1)·n_c·N) is one
  * exact-integer division rendered once through round6 (the
  * p_window_ranks cross-engine discipline). m = 1 ⇒ t = 0 by
  * convention (a single global band can leak nothing).
  *
  * Scale: ONE corpus-pass combine aggregation to the
  * (quasi-class × band) cell table; the global band histogram, class
  * sizes, and corpus total all REDERIVE from those cells, so nothing
  * reads the corpus twice. The completed class×band grid (absent cells
  * must still contribute their cumulative gap — the X237/X257 complete-
  * the-spine rule) is a broadcast cross join of two metadata-sized
  * frames, and the prefix window partitions by class over ≤
  * |classes|·|bands| rows — no corpus-sized window anywhere.
  */
object TCloseness {

  /** Per-class t over `cells` = one row per (quasi..., band, cnt);
    * bands must be non-negative ordered integers. Returns one row per
    * quasi-class: (quasi..., group_n, emd_num, t, t_violation).
    */
  def audit(cells: DataFrame, quasiCols: Seq[String], bandCol: String,
      cntCol: String, threshold: Double = 0.2): DataFrame = {
    val q = quasiCols.map(col)
    val g = cells.groupBy(col(bandCol)).agg(sum(cntCol).as("_g"))
    val tot = g.agg(sum("_g").as("_n"), count(lit(1)).as("_m"))
    val classN = cells.groupBy(q: _*).agg(sum(cntCol).as("_nc"))
    // complete grid: every class × every globally-present band
    val spine = classN.crossJoin(broadcast(g))
    val filled = spine
      .join(cells.withColumnRenamed(cntCol, "_cnt"),
        quasiCols :+ bandCol, "left")
      .crossJoin(broadcast(tot))
      .select((q :+ col(bandCol) :+ col("_nc") :+ col("_n") :+ col("_m") :+
        (coalesce(col("_cnt"), lit(0L)) * col("_n") -
          col("_g") * col("_nc")).as("_gap")): _*)
    val w = Window.partitionBy(q: _*).orderBy(col(bandCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .select((q :+ col("_nc") :+ col("_n") :+ col("_m") :+
        abs(sum("_gap").over(w)).as("_absD")): _*)
      .groupBy(q :+ col("_nc") :+ col("_n") :+ col("_m"): _*)
      .agg(sum("_absD").as("emd_num"))
      .select((q :+ col("_nc").as("group_n") :+ col("emd_num") :+
        when(col("_m") <= 1, lit(0.0)).otherwise(
          graft.llm.TextOps.round6(col("emd_num").cast("double") /
            ((col("_m") - 1) * col("_nc") * col("_n")).cast("double")))
          .as("t")): _*)
      .withColumn("t_violation", col("t") > threshold)
  }
}
