package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** EWMA control chart (Roberts 1959) with λ = ½ — the small-shift
  * monitor completing the control-chart row next to CUSUM
  * (p_cusum_tabular / stream_cusum): smooth the daily series with
  * exponentially decaying weights and flag days whose smoothed value
  * leaves the ±3σ_EWMA band. λ = ½ makes every weight DYADIC
  * (2^(W−1−k) over a W-term horizon), so the smoothed value is one
  * exact rational num/den per day and the whole chart — value and
  * flag — replays bit-for-bit in the oracle.
  *
  * Truncation contract (loud in the semantics, not hidden): the
  * operator computes the W-term truncated EWMA — terms beyond lag
  * W−1 carry weight < 2^(1−W) (< 10⁻⁵ at W = 20) and are DROPPED,
  * with the denominator renormalized to the weights actually present
  * (early days use their full available history). This is what makes
  * the statistic exactly representable; the untruncated recurrence
  * needs unbounded dyadic denominators.
  *
  * The 3σ decision is the usual asymptotic-variance EWMA band read
  * through the truncated weights: flag iff
  * (num·n − Sx·den)² ≥ 9·(n·Sxx − Sx²)·Σw², the fully
  * cross-multiplied integer comparison of (z−μ)² against
  * 9·Var(x)·Σw²/den² — no sqrt, no float, no CDF.
  *
  * Scale: one analytic window per series (partition by series key,
  * W lag terms — codegen'd, no self-join), one 3-long moment
  * aggregate per series broadcast back. The window is over the DENSE
  * daily spine the caller provides; gaps must be zero-filled
  * upstream or the lags stretch across them.
  */
object EwmaChart {

  val W = 20

  /** df(keyCol, dayCol, xCol): ONE ROW PER (series, day) — a dense
    * spine, x integer (cents). Returns (key, day, x, ewma_micro,
    * flag_3sigma) per input row. */
  def chart(df: DataFrame, keyCol: String, dayCol: String,
      xCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
    val num = (0 until W).map { k =>
      coalesce(lag(col(xCol), k).over(w), lit(0L)) *
        lit(1L << (W - 1 - k))
    }.reduce(_ + _)
    val den = (0 until W).map { k =>
      when(lag(col(xCol), k).over(w).isNotNull,
        lit(1L << (W - 1 - k))).otherwise(lit(0L))
    }.reduce(_ + _)
    val sw2 = (0 until W).map { k =>
      when(lag(col(xCol), k).over(w).isNotNull,
        lit(1L << (W - 1 - k)) * lit(1L << (W - 1 - k)))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val stats = df.groupBy(col(keyCol).as("_k"))
      .agg(count(lit(1)).as("n"), sum(col(xCol)).as("sx"),
        sum(dec(col(xCol)) * dec(col(xCol))).as("sxx"))
    df.select(col(keyCol), col(dayCol), col(xCol).cast("long").as("x"),
        num.as("_num"), den.as("_den"), sw2.as("_sw2"))
      .join(broadcast(stats), col(keyCol) === col("_k"))
      .select(col(keyCol), col(dayCol), col("x"),
        graft.llm.TextOps.floorDivDec(
          dec(col("_num")) * lit(1000000L), dec(col("_den")))
          .cast("long").as("ewma_micro"),
        {
          val dev = dec(col("_num")) * dec(col("n")) -
            dec(col("sx")) * dec(col("_den"))
          val varTerm = dec(col("n")) * col("sxx") -
            dec(col("sx")) * dec(col("sx"))
          (dev * dev >= lit(9L) * varTerm * dec(col("_sw2")))
            .as("flag_3sigma")
        })
  }
}
