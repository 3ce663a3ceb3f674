package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact two-sample Kolmogorov–Smirnov from a paired value histogram
  * (X333/X334) — the canonical distribution-equality TEST next to the
  * drift family's W1/PSI/KL distances: D = max|F1 − F2| computed
  * CROSS-MULTIPLIED (|cum1·n2 − cum2·n1|, pure integers — no ratio
  * ever floats), the argmax location tying to the smaller value, and
  * the α = 0.05 decision in exact rational arithmetic:
  *   λ ≥ 1.358  ⟺  D_num²·10⁶ ≥ 1844164·n1·n2·(n1+n2)
  * (1358² = 1844164 — exactly representable, so no constant-folding
  * error is possible; decimal(38,0) keeps the products exact at any
  * corpus size).
  *
  * Scale shape: input is the (value, c1, c2) HISTOGRAM — value-domain
  * sized, never rows — so the cumulative window runs over distinct
  * values only (the p_emd_drift discipline); everything upstream is
  * one combine agg per side.
  */
object KsTest {

  /** counts(s, c1, c2): per distinct value, the two samples' counts.
    * Returns one row: (n1, n2, d_num, at_value, ks_micro, reject_05);
    * an empty-side histogram yields ks_micro = 0 and reject = false,
    * an empty INPUT yields zero rows. */
  def ks2(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val cum = counts
      .withColumn("f1", sum("c1").over(Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("f2", sum("c2").over(Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = counts.agg(coalesce(sum("c1"), lit(0L)).as("n1"),
      coalesce(sum("c2"), lit(0L)).as("n2"))
    cum.crossJoin(broadcast(n))
      .select(col("s"), col("n1"), col("n2"),
        abs(col("f1") * col("n2") - col("f2") * col("n1")).as("dd"))
      .groupBy("n1", "n2")
      .agg(min(struct((-col("dd")).as("nd"), col("s").as("v"))).as("b"))
      .select(col("n1"), col("n2"), (-col("b.nd")).as("d_num"),
        col("b.v").as("at_value"))
      .select(col("n1"), col("n2"), col("d_num"), col("at_value"),
        when(col("n1") > 0 && col("n2") > 0,
          // decimal throughout: d_num can reach n1·n2, so the long
          // product d_num·10⁶ wraps once n1·n2 > ~9.2·10¹² — the
          // decimal route keeps the docstring's any-corpus-size
          // exactness claim true (reject_05 already lives there)
          graft.llm.TextOps.floorDivDec(
            dec(col("d_num")) * lit(1000000L),
            dec(col("n1")) * dec(col("n2"))).cast("long"))
          .otherwise(lit(0L)).as("ks_micro"),
        (col("n1") > 0 && col("n2") > 0
          && dec(col("d_num")) * dec(col("d_num")) * lit(1000000L)
            >= dec(lit(1844164L)) * dec(col("n1")) * dec(col("n2"))
              * dec(col("n1") + col("n2"))).as("reject_05"))
  }
}
