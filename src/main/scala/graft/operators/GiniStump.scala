package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact Gini decision-stump split finder (Breiman et al. 1984, the
  * CART primitive) — the ONE-SPLIT supervised partitioner next to the
  * unsupervised Jenks/Mondrian cuts: "which threshold on this feature
  * best separates the labels". The stump is the unit every tree
  * ensemble repeats; finding it exactly from histograms is the
  * scalable kernel (the LightGBM histogram trick, here bit-exact).
  *
  * Exactness: minimizing weighted Gini ⟺ maximizing the purity mass
  * S(t) = Σ_c cL_c²/nL + Σ_c cR_c²/nR over thresholds t (split is
  * x ≤ t). Left masses are per-class CUMULATIVE windows over the
  * zero-filled (value × class) spine (value-domain × k cells, never
  * rows); right masses are cy_c − cL_c against the per-class totals.
  * Each side's mass floors ONCE to the micro grid:
  *   score_micro(t) = ⌊ΣcL²·10⁶/nL⌋ + ⌊ΣcR²·10⁶/nR⌋,
  * argmax by (score desc, threshold asc) — a total order, identical
  * in both engines. The parent mass ⌊Σcy²·10⁶/n⌋ shares the scale,
  * so score_micro > parent_micro ⟺ the split purifies (up to the
  * shared 2-micro floor grid).
  *
  * Scale shape: one (value, class) combine agg; k cumulative windows
  * over the value spine; one reduction argmax. Quantize continuous
  * features upstream.
  */
object GiniStump {

  /** df(xCol, yCol): Long-valued feature and class label. One row:
    * (threshold, n_left, n_right, score_micro, parent_micro,
    * purifies); zero rows when no threshold splits (a single distinct
    * feature value). */
  def bestSplit(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val hist = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // spine, class totals, grid all read it
    val cls = hist.groupBy("y").agg(sum("c").as("cy"))
    val tot = cls.agg(sum("cy").as("n"),
      sum(dec(col("cy")) * dec(col("cy"))).as("sc2"))
    val spine = hist.select("x").distinct()
      .crossJoin(broadcast(hist.select("y").distinct()))
      .join(hist, Seq("x", "y"), "left")
      .select(col("x"), col("y"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum", sum("c").over(Window.partitionBy("y")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(cls), "y")
    val perT = spine.groupBy(col("x").as("t"))
      .agg(sum("cum").as("nl"),
        sum(dec(col("cum")) * dec(col("cum"))).as("sl2"),
        sum(dec(col("cy") - col("cum"))
          * dec(col("cy") - col("cum"))).as("sr2"))
      .crossJoin(broadcast(tot)) // 1-row scalar join
      .filter(col("nl") > 0 && col("nl") < col("n"))
      .select(col("t"), col("nl"), (col("n") - col("nl")).as("nr"),
        col("n"), col("sc2"),
        (graft.llm.TextOps.floorDivDec(col("sl2") * lit(1000000L),
          dec(col("nl"))).cast("long")
          + graft.llm.TextOps.floorDivDec(col("sr2") * lit(1000000L),
            dec(col("n") - col("nl"))).cast("long")).as("score_micro"))
    perT
      .groupBy("n", "sc2")
      .agg(min(struct((-col("score_micro")).as("ns"), col("t").as("t"),
        col("nl").as("nl"), col("nr").as("nr"))).as("b"))
      .select(col("b.t").as("threshold"), col("b.nl").as("n_left"),
        col("b.nr").as("n_right"), (-col("b.ns")).as("score_micro"),
        graft.llm.TextOps.floorDivDec(col("sc2") * lit(1000000L),
          dec(col("n"))).cast("long").as("parent_micro"))
      .withColumn("purifies", col("score_micro") > col("parent_micro"))
  }
}
