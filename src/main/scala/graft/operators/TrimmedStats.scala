package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trimmed and winsorized means (Tukey–McLaughlin 1963): the robust
  * location estimates a metrics pipeline reports when raw means are
  * hostage to tail spikes — trim drops the extreme 10% per side,
  * winsorize CLAMPS them to the cut boundaries (keeps n, bounds
  * influence). No reference counterpart (SURVEY §2.6).
  *
  * Exact integers from the value histogram — no row-level sort, no
  * percentile approximation: with per-group cumulative counts, the
  * trim zone is the rank interval [t+1, n−t] (t = n div 10); a
  * histogram cell covering ranks [cum−c+1, cum] contributes
  * v · overlap where overlap = max(0, min(cum, n−t) −
  * max(cum−c+1, t+1) + 1) — partial cells handled by arithmetic,
  * not enumeration. Boundaries are the order statistics at ranks
  * t+1 and n−t by the usual integer clearing. Means micro-scaled
  * via TRUNCATING division (matches DuckDB // on either sign — the
  * offPolicyValue rule for sums that could carry a sign).
  *
  * Scale: one combine agg to the (group, value) histogram; one
  * histogram-sized window per group; output is k rows.
  *
  * Output per group: (g, n, t, lo_cents, hi_cents,
  * trimmed_mean_micro, winsor_mean_micro, raw_mean_micro).
  */
object TrimmedStats {

  def means(df: DataFrame, groupCol: String, valCol: String,
      tenths: Int = 1): DataFrame = {
    require(tenths >= 1 && tenths <= 4,
      s"tenths ($tenths) must be in 1..4 — trim fraction = tenths/10 per side")
    val cells = df
      .groupBy(col(groupCol).as("g"), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("cum", sum("c").over(wg))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
      .withColumn("t", expr(s"(n * $tenths) div 10"))
      .localCheckpoint(true) // boundary clearing + overlap pass
    val lo = cum.filter(col("cum") >= col("t") + 1)
      .groupBy("g").agg(min("v").as("lo_v"))
    val hi = cum.filter(col("cum") >= col("n") - col("t"))
      .groupBy("g").agg(min("v").as("hi_v"))
    cum
      .select(col("g"), col("n"), col("t"),
        (col("v").cast("decimal(38,0)") * greatest(lit(0L),
          least(col("cum"), col("n") - col("t"))
            - greatest(col("cum") - col("c") + 1, col("t") + 1) + 1)
          .cast("decimal(38,0)")).as("contrib"),
        (col("v").cast("decimal(38,0)") * col("c").cast("decimal(38,0)"))
          .as("raw"))
      .groupBy("g", "n", "t")
      .agg(sum("contrib").as("s_trim"), sum("raw").as("s_raw"))
      .join(lo, Seq("g")).join(hi, Seq("g"))
      .select(col("g"), col("n"), col("t"),
        col("lo_v").as("lo_cents"), col("hi_v").as("hi_cents"),
        // decimal(38,0) products: cents sums × 10⁶ can pass 9.2·10¹⁸
        // on a 10⁷-row group of large values — the micro MEANS always
        // fit a long
        graft.llm.TextOps.truncDivDec(
          col("s_trim") * lit(1000000L),
          (col("n") - lit(2L) * col("t")).cast("decimal(38,0)"))
          .cast("long").as("trimmed_mean_micro"),
        graft.llm.TextOps.truncDivDec(
          (col("s_trim") + (col("t") * col("lo_v") + col("t") * col("hi_v"))
            .cast("decimal(38,0)")) * lit(1000000L),
          col("n").cast("decimal(38,0)"))
          .cast("long").as("winsor_mean_micro"),
        graft.llm.TextOps.truncDivDec(
          col("s_raw") * lit(1000000L),
          col("n").cast("decimal(38,0)"))
          .cast("long").as("raw_mean_micro"))
      .orderBy("g")
  }
}
