package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cliff's delta (Cliff 1993) — the ordinal EFFECT-SIZE readout next
  * to the Mann–Whitney DECISION: δ = P(x₁ > x₀) − P(x₁ < x₀), the
  * probability-scale dominance of arm 1 over arm 0. A significant U
  * on a 10⁷-user experiment can be practically negligible; δ with
  * Romano et al. (2006) magnitude bands (|δ| < 0.147 negligible,
  * < 0.33 small, < 0.474 medium, else large) is the number the launch
  * review reads.
  *
  * Exactness: gt/lt pair counts come from the VALUE HISTOGRAM with a
  * cumulative window over distinct values — the window is bounded by
  * the value DOMAIN (cents cells), never the row count; the pair
  * products are exact decimals, delta_micro one floored division, and
  * the magnitude bands integer cross-multiplications of |d_num|·10⁶
  * against band·n₀·n₁ — no float anywhere.
  *
  * Scale: one combine agg to the value histogram (map-side partial),
  * one domain-sized window, one final row. A 100 TB log with cent
  * values enters the window as ≤ |domain| cells.
  */
object CliffsDelta {

  /** df(armCol ∈ {0,1}, valCol Long): returns ONE row —
    * (n0, n1, gt_pairs, lt_pairs, d_num, delta_micro, magnitude). */
  def delta(df: DataFrame, armCol: String, valCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val hist = df.select(col(armCol).as("arm"), col(valCol).as("v"))
      .groupBy("v")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist
      .withColumn("below0", coalesce(sum("n0").over(w), lit(0L)))
      .withColumn("below1", coalesce(sum("n1").over(w), lit(0L)))
    val m = cum.agg(
      sum("n0").as("n0"), sum("n1").as("n1"),
      // x1 > x0: each arm-1 cell dominates every arm-0 count below it
      sum(dec(col("n1")) * dec(col("below0"))).as("gt_pairs"),
      // x1 < x0: symmetric — arm-0 cells dominate arm-1 counts below
      sum(dec(col("n0")) * dec(col("below1"))).as("lt_pairs"))
    val dnum = col("gt_pairs") - col("lt_pairs")
    val pairs = dec(col("n0")) * dec(col("n1"))
    val absScaled = abs(dnum) * lit(1000000L)
    m.select(col("n0"), col("n1"),
      col("gt_pairs").cast("long").as("gt_pairs"),
      col("lt_pairs").cast("long").as("lt_pairs"),
      dnum.cast("long").as("d_num"),
      when(col("n0") > 0 && col("n1") > 0,
        when(dnum >= 0, lit(1L)).otherwise(lit(-1L))
          * graft.llm.TextOps.floorDivDec(abs(dnum) * lit(1000000L),
              pairs).cast("long"))
        .otherwise(lit(0L)).as("delta_micro"),
      when(col("n0") === 0 || col("n1") === 0, lit("undefined"))
        .when(absScaled < dec(lit(147000L)) * pairs, lit("negligible"))
        .when(absScaled < dec(lit(330000L)) * pairs, lit("small"))
        .when(absScaled < dec(lit(474000L)) * pairs, lit("medium"))
        .otherwise(lit("large")).as("magnitude"))
  }
}
