package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mann–Kendall trend test (Mann 1945; Kendall 1975) — the
  * DISTRIBUTION-FREE monotone-trend question on a time series, next to
  * Theil–Sen's slope estimate (which says HOW steep) and Page's
  * ordered-alternative test (which needs replicated blocks): is the
  * daily series drifting at all, without assuming linearity or
  * normality? S = Σ_{i<j} sign(y_j − y_i) over TIME-ordered pairs;
  * under H₀, S ≈ N(0, Var) with the tie-corrected
  * Var = [n(n−1)(2n+5) − Σ_v t_v(t_v−1)(2t_v+5)] / 18.
  *
  * Exactness: S and the 18-scaled variance numerator are pure
  * integers; the α = 0.05 two-sided decision cross-multiplies
  *   18·S²·10⁶ ≥ χ²₁-micro · var18
  * against the same 3841458 micro literal the other one-df tests use
  * — no sqrt, no CDF, no float anywhere.
  *
  * Scale: the pair join is per-group over the CALENDAR-dense index —
  * |days|² metadata pairs (90 days → 4 005 pairs per group), never
  * rows². The caller reduces the corpus to its daily cells with one
  * combine agg first; a 100 TB event log enters this operator as
  * |types| × |days| rows. The envelope guard keeps 18·S²·10⁶ inside
  * decimal(38,0): n ≤ 10⁵ index points per group (27 years of days),
  * loudly enforced.
  */
object MannKendall {

  /** df(groupCol, idxCol, valCol): one row per (group, time index) —
    * the series must already be dense per group (zero-filled spine)
    * so absent days are real observations. Returns one row per group:
    * (g, n, s_stat, var18, z2_micro, rising, reject_05). A constant
    * series (all values tied) reports var18 = 0, z² = 0, no
    * rejection. */
  def trend(df: DataFrame, groupCol: String, idxCol: String,
      valCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // the envelope guard sits on the pair-join INPUT so an oversize
    // group fails on its first scanned row, not after n² pair work;
    // the count window is over the already-calendar-sized input
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val d = df.select(col(groupCol).as("g"),
        col(idxCol).cast("long").as("i"),
        col(valCol).cast("long").as("y"))
      .withColumn("_n", count(lit(1)).over(wg))
      .withColumn("i", when(col("_n") <= 100000L, col("i"))
        .otherwise(raise_error(concat(lit("MannKendall: "), col("_n"),
          lit(" index points in one group exceeds the decimal(38,0)"
            + " envelope (1e5); aggregate to a coarser calendar unit"
            + " upstream")))))
      .drop("_n")
      .localCheckpoint(true) // both pair-join sides + the tie agg
    // time-ordered pair fold: calendar² cells, the row count never
    // enters the join (the caller pre-aggregated to daily cells)
    val s = d.as("a")
      .join(d.as("b"), col("a.g") === col("b.g") && col("a.i") < col("b.i"))
      .groupBy(col("a.g").as("g"))
      .agg(sum(signum(col("b.y") - col("a.y")).cast("long")).as("s_stat"))
    val ties = d.groupBy("g", "y").agg(count(lit(1)).as("t"))
      .groupBy("g")
      .agg(sum("t").as("n"),
        sum(dec(col("t")) * dec(col("t") - 1) * dec(col("t") * 2 + 5))
          .as("tie_sum"))
    val nChecked = when(col("n") <= 100000L, col("n"))
      .otherwise(raise_error(concat(lit("MannKendall: n = "), col("n"),
        lit(" index points exceeds the decimal(38,0) envelope (1e5);"
          + " aggregate to a coarser calendar unit upstream"))))
    ties.join(s, Seq("g"), "left")
      .select(col("g"), col("n"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"),
        (dec(nChecked) * dec(col("n") - 1) * dec(col("n") * 2 + 5)
          - col("tie_sum")).as("var18"))
      .select(col("g"), col("n"), col("s_stat"),
        col("var18").cast("long").as("var18"),
        when(col("var18") > 0,
          graft.llm.TextOps.floorDivDec(
            dec(col("s_stat")) * dec(col("s_stat")) * lit(18L)
              * lit(1000000L),
            col("var18")).cast("long"))
          .otherwise(lit(0L)).as("z2_micro"),
        (col("s_stat") > 0).as("rising"),
        (col("var18") > 0
          && dec(col("s_stat")) * dec(col("s_stat")) * lit(18L)
            * lit(1000000L) >= dec(lit(3841458L)) * col("var18"))
          .as("reject_05"))
  }
}
