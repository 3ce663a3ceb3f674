package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Murphy decomposition of the Brier score (Murphy 1973) — the
  * classifier-audit readout that splits squared-error calibration
  * loss into the three terms that mean something operationally:
  * reliability (how far each forecast bin's stated probability sits
  * from its realized rate — the term recalibration can remove),
  * resolution (how much the bins separate the outcome — the term
  * recalibration canNOT add), and uncertainty (the outcome's own
  * variance, the floor no forecaster beats). Complements the Platt /
  * isotonic calibrators (X*, llm_calibration/llm_isotonic) with the
  * diagnosis those trainers optimize against.
  *
  * Per-bin output deliberately (the chi-square rule: summing micro
  * floors would stack rounding; the reader folds ≤10 rows):
  * rel_k = (f_k·n_k − 100·o_k)² / (10⁴·n_k·n) and
  * res_k = (o_k·n − o·n_k)² / (n_k·n³), each floored ONCE to micro;
  * unc = o·(n−o)/n², a per-row constant. All inputs are integer
  * counts and integer percent forecasts, so every term is one exact
  * rational — no float, no engine divergence.
  *
  * Scale: one combine aggregate to the ≤10 forecast bins, one 1-row
  * total, one broadcast join — corpus touched once.
  */
object BrierDecomp {

  /** df(fPctCol, yCol): one row per forecast with its integer percent
    * forecast (0..99; binned by tens, stated value = bin center
    * bin·10+5) and binary outcome. Returns one row per NON-EMPTY bin:
    * (bin, f_pct, n_k, o_k, n, o, rel_micro, res_micro, unc_micro).
    */
  def decompose(df: DataFrame, fPctCol: String, yCol: String)
      : DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val bins = df
      .select(expr(s"$fPctCol div 10").as("bin"),
        col(yCol).cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_k"), sum("y").as("o_k"))
    val tot = bins.agg(sum("n_k").as("n"), sum("o_k").as("o"))
    bins.crossJoin(broadcast(tot))
      .select(col("bin"), (col("bin") * 10 + 5).as("f_pct"),
        col("n_k"), col("o_k"), col("n"), col("o"),
        graft.llm.TextOps.floorDivDec(
          {
            val d = dec(col("bin") * 10 + 5) * dec(col("n_k")) -
              dec(lit(100L)) * dec(col("o_k"))
            d * d * lit(1000000L)
          },
          dec(lit(10000L)) * dec(col("n_k")) * dec(col("n")))
          .cast("long").as("rel_micro"),
        graft.llm.TextOps.floorDivDec(
          {
            val d = dec(col("o_k")) * dec(col("n")) -
              dec(col("o")) * dec(col("n_k"))
            d * d * lit(1000000L)
          },
          dec(col("n_k")) * dec(col("n")) * dec(col("n"))
            * dec(col("n"))).cast("long").as("res_micro"),
        graft.llm.TextOps.floorDivDec(
          dec(col("o")) * dec(col("n") - col("o")) * lit(1000000L),
          dec(col("n")) * dec(col("n"))).cast("long").as("unc_micro"))
      .orderBy("bin")
  }
}
