package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pettitt's nonparametric change-point test (Pettitt, Applied
  * Statistics 1979) — the RANK-BASED "when did it change" companion to
  * the exact-SSE mean-break scan (EventOps.changepointMean): no
  * normality assumption, robust to the heavy-tailed daily series a
  * traffic feed actually produces.
  *
  * U_t = Σ_{i≤t} Σ_{j>t} sgn(y_i − y_j). Computed via the exact
  * telescoping identity U_t = U_{t−1} + V_t with
  * V_t = Σ_{j≠t} sgn(y_t − y_j): ONE |days|² sign-pair aggregate (the
  * calendar-squared metadata rule — the corpus reduces to the daily
  * series first, so 100 TB enters the quadratic stage as ~90 rows)
  * plus ONE cumulative window over |days| rows. K = max_t |U_t|; the
  * break candidate is the argmax day (ties → the EARLIEST day, pinned
  * by a (|U| desc, day) row_number in both engines).
  *
  * Significance (two-sided, 5%): the asymptotic tail
  * p ≈ 2·exp(−6K²/(n³+n²)) ≤ 0.05 rearranges to the EXACT integer
  * cross-multiplication 6·K²·10⁶ ≥ 3688879·(n³+n²), where
  * 3688879 = ⌊−ln(0.025)·10⁶⌋ is a driver-folded literal shared
  * verbatim with the oracle — no runtime transcendental. Products run
  * in decimal(38,0): K can reach n²/2, so 6K²·10⁶ overflows a long
  * past n ≈ 1900 days.
  *
  * Input: one row per series element, an orderable index column and a
  * long value column. Output: (i, y, u, is_best, k, reject_05) — one
  * row per element, U_n = 0 by construction on the last row.
  */
object Pettitt {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  def test(daily: DataFrame, iCol: String, yCol: String): DataFrame = {
    val d = daily.select(col(iCol).as("i"), col(yCol).cast("long").as("y"))
    val pairs = d.as("a").join(d.as("b"), col("a.i") =!= col("b.i"))
      .select(col("a.i").as("i"),
        when(col("a.y") > col("b.y"), 1L)
          .when(col("a.y") < col("b.y"), -1L)
          .otherwise(0L).as("s"))
    val v = pairs.groupBy("i").agg(sum("s").as("v"))
    // |days|-row metadata: the single-partition cumulative window is
    // the p_vopt_histogram precedent, never a corpus-sized sort.
    val u = d.join(v, Seq("i"), "left")
      .select(col("i"), col("y"), coalesce(col("v"), lit(0L)).as("v"))
      .withColumn("u", sum("v").over(
        Window.orderBy("i")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val stats = u.agg(max(abs(col("u"))).as("k"),
      count(lit(1)).cast("long").as("n"))
    u.crossJoin(broadcast(stats))
      .withColumn("_rk", row_number().over(
        Window.orderBy(abs(col("u")).desc, col("i"))))
      .select(col("i"), col("y"), col("u"),
        (col("_rk") === 1).as("is_best"), col("k"),
        (dec(lit(6L)) * dec(col("k")) * dec(col("k")) * lit(1000000L)
          >= dec(lit(3688879L))
            * (dec(col("n")) * dec(col("n")) * dec(col("n"))
              + dec(col("n")) * dec(col("n")))).as("reject_05"))
  }
}
