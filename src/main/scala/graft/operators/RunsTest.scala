package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wald–Wolfowitz runs test (1940) — the randomness audit next to
  * Ljung–Box: dichotomize a series about its median and count sign
  * RUNS; too few runs means clustering (regimes, drift), too many
  * means alternation (negative feedback, over-correction) — both
  * non-random, both invisible to a mean monitor, and the second
  * largely invisible to autocorrelation tests at the wrong lag.
  *
  * Exactness: median = the lower median (min value whose doubled
  * cumulative count clears n) from the value histogram; days AT the
  * median drop (the standard tie treatment); runs count by one lag
  * window over the day-ordered kept series. The α = 0.05 two-sided
  * decision is EXACT RATIONAL arithmetic — with a = above, b = below,
  * n = a + b, R = runs:
  *   |z| ≥ 1.96  ⟺  (R·n − 2ab − n)²·(n−1)·10⁴ ≥ 38416·2ab·(2ab − n)
  * (196² = 38416 exactly; 2ab ≥ n for a, b ≥ 1 so the RHS is
  * nonnegative; decimal(38,0) keeps the squares exact). Degenerate
  * one-sided series (a = 0 or b = 0) report reject = false.
  *
  * Scale shape: one combine agg to the value histogram (value-domain
  * sized), one cumulative window over it, one calendar-sized lag
  * window — the p_ccf/Holt daily-series discipline.
  */
object RunsTest {

  /** series(idxCol: ordering key, valCol: Long) -> one row:
    * (n_used, n_above, n_below, n_runs, mu_micro, reject_05). */
  def test(series: DataFrame, idxCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val s = series.select(col(idxCol).as("i"), col(valCol).as("v"))
      .localCheckpoint(true) // the histogram AND the sign sequence
    val n = s.agg(count(lit(1)).as("n"))
    val med = s.groupBy("v").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(n))
      .filter(col("cum") * 2 >= col("n"))
      .agg(min("v").as("med"))
    val agg = s.crossJoin(broadcast(med))
      .filter(col("v") =!= col("med"))
      .select(col("i"), (col("v") > col("med")).as("up"))
      .withColumn("prev", lag("up", 1).over(Window.orderBy("i")))
      .agg(coalesce(sum(when(col("up"), 1L).otherwise(0L)), lit(0L))
        .as("n_above"),
        coalesce(sum(when(!col("up"), 1L).otherwise(0L)), lit(0L))
          .as("n_below"),
        coalesce(sum(when(col("prev").isNull
          || col("prev") =!= col("up"), 1L).otherwise(0L)), lit(0L))
          .as("n_runs"))
    agg.select(
      (col("n_above") + col("n_below")).as("n_used"),
      col("n_above"), col("n_below"), col("n_runs"),
      expr("(2 * n_above * n_below * 1000000)"
        + " div greatest(n_above + n_below, 1) + 1000000").as("mu_micro"),
      (col("n_above") > 0 && col("n_below") > 0 &&
        dec(col("n_runs") * (col("n_above") + col("n_below"))
          - lit(2L) * col("n_above") * col("n_below")
          - (col("n_above") + col("n_below")))
          * dec(col("n_runs") * (col("n_above") + col("n_below"))
            - lit(2L) * col("n_above") * col("n_below")
            - (col("n_above") + col("n_below")))
          * dec(col("n_above") + col("n_below") - 1) * lit(10000L)
          >= dec(lit(38416L))
            * (lit(2L) * dec(col("n_above")) * dec(col("n_below")))
            * (lit(2L) * dec(col("n_above")) * dec(col("n_below"))
              - dec(col("n_above") + col("n_below"))))
        .as("reject_05"))
  }
}
