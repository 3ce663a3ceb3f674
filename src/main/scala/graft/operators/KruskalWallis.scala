package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tie-corrected Kruskal–Wallis H (Kruskal & Wallis 1952) — the
  * k-SAMPLE rank test completing the two-sample row (Mann–Whitney in
  * the A/B family, KS/CvM on histograms): "do these k sources draw
  * from one value distribution", answered from ranks so no normality
  * is assumed.
  *
  * Exactness (the X257/X337 doubled-rank discipline): the average
  * rank of tied value v doubles to the integer R2(v) = 2·cum_before
  * + c_v + 1, so each group's doubled rank sum S2_g = Σ c_{g,v}·R2(v)
  * is an integer and Σ_g S2_g = n(n+1) exactly. With R_g = S2_g/2,
  *   H = 12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1)
  *     = Σ_g 3·S2_g²/(n_g·n(n+1)) − 3(n+1),
  * and the emitted grid is DEFINED term-floored:
  *   h_micro = Σ_g ⌊3·S2_g²·10⁶ / (n_g·n·(n+1))⌋ − 3(n+1)·10⁶
  * (each floor exact in decimal(38,0); the statistic under-reads the
  * real H by < k micro — a DEFINITION both engines share, not a
  * tolerance). Tie correction divides by C = 1 − T/(n³−n) with
  * T = Σ_v (c_v³ − c_v):
  *   h_adj_micro = ⌊h_micro·(n³−n) / (n³−n−T)⌋.
  * The α = 0.05 decision compares h_adj_micro to the micro-floored
  * χ²₀.₉₅ quantile for df = k−1 ≤ 6 — a shared literal, so no
  * cross-engine CDF is evaluated.
  *
  * Envelope: 3·S2_g²·10⁶ ≤ 3·10⁶·(n(n+1))² must fit decimal(38,0),
  * which holds to n ≈ 3·10⁷ rows — enforced LOUDLY (assert_true), not
  * silently wrapped. Group the input upstream (per day, per shard) to
  * stay inside; the histogram route keeps every agg a combine agg.
  *
  * Scale shape: ranks come from the VALUE-HISTOGRAM cumulative window
  * (value-domain sized, never a row sort); per-group moments are one
  * combine agg over the (group, value) histogram.
  */
object KruskalWallis {

  /** χ²₀.₉₅ micro-floored quantiles, df 1..6 — shared decision
    * literals (Friedman reuses them; the oracle inlines the same
    * constants, so no CDF is ever evaluated in either engine). */
  private[operators] val chi95micro: Map[Int, Long] = Map(
    1 -> 3841458L, 2 -> 5991464L, 3 -> 7814727L,
    4 -> 9487729L, 5 -> 11070497L, 6 -> 12591587L)

  /** df(groupCol, valueCol): Long-valued value. One row:
    * (n, k, h_micro, h_adj_micro, reject_05). Requires 2 ≤ k ≤ 7
    * (decision table covers df ≤ 6) and n ≤ 3·10⁷ — both enforced
    * loudly. A fully-tied input (every value equal: n³−n = T) reports
    * 0, 0 and no rejection. */
  def kw(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // value window + group moments + tie agg
    val vh = cells.groupBy("v").agg(sum("c").as("cv"))
      .withColumn("cum", sum("cv").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("v"),
        (lit(2L) * (col("cum") - col("cv")) + col("cv") + 1L).as("r2"),
        col("cv"))
    val grp = cells.join(vh.select("v", "r2"), Seq("v"))
      .groupBy("g")
      .agg(sum("c").as("ng"), sum(dec(col("c")) * dec(col("r2"))).as("s2"))
    val ties = vh.agg(coalesce(sum(dec(col("cv")) * dec(col("cv"))
      * dec(col("cv")) - dec(col("cv"))), dec(lit(0L))).as("t"))
    val tot = grp.agg(sum("ng").as("n"), count(lit(1)).as("k"))
      .crossJoin(ties) // 1-row scalar join
    // loud envelope guard, the Mst/Shapley discipline: past 3·10⁷ the
    // 3·S2_g²·10⁶ product would ANSI-overflow decimal(38,0) anyway —
    // this names the contract instead of surfacing an arithmetic error
    val nChecked = when(col("n") <= 30000000L, col("n"))
      .otherwise(raise_error(concat(lit("KruskalWallis: n = "), col("n"),
        lit(" rows exceeds the decimal(38,0) envelope (3e7); group the"
          + " input upstream"))))
    val terms = grp.crossJoin(broadcast(tot)) // k rows × the 1-row totals
      .select(col("n"), col("k"), col("t"),
        graft.llm.TextOps.floorDivDec(
          dec(lit(3L)) * col("s2") * col("s2") * lit(1000000L),
          dec(col("ng")) * dec(nChecked) * dec(col("n") + 1)).as("term"))
      .groupBy("n", "k", "t")
      .agg(sum("term").as("hsum"))
    terms
      .select(col("n"), col("k"), col("t"),
        (col("hsum") - dec(lit(3L)) * dec(col("n") + 1) * lit(1000000L))
          .as("h_dec"),
        (dec(col("n")) * dec(col("n")) * dec(col("n")) - dec(col("n")))
          .as("n3n"))
      .select(col("n"), col("k"), col("h_dec").cast("long").as("h_micro"),
        when(col("n3n") > col("t"),
          graft.llm.TextOps.truncDivDec(col("h_dec") * col("n3n"),
            col("n3n") - col("t")).cast("long"))
          .otherwise(lit(0L)).as("h_adj_micro"))
      .withColumn("reject_05",
        // shared-literal decision: the χ² quantile is a when-chain over
        // df = k−1; an uncovered df (k outside 2..7) raises loudly
        // instead of silently never rejecting
        col("h_adj_micro") >= chi95micro.toSeq.sortBy(_._1).foldLeft(
          raise_error(lit("KruskalWallis: chi-square table covers"
            + " df 1..6 (k in 2..7)")).cast("long")) {
          case (acc, (d, q)) =>
            when(col("k") - 1 === d, lit(q)).otherwise(acc)
        })
      .select("n", "k", "h_micro", "h_adj_micro", "reject_05")
  }
}
