package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Brown–Forsythe homogeneity-of-SPREAD test (Brown & Forsythe 1974;
  * Levene's test with the median center): one-way ANOVA on the
  * absolute deviations from each group's MEDIAN. The variance
  * counterpart of Mood's location test — "did a source's dispersion
  * change" is the drift question variance-based monitors miss when
  * the mean holds. Median-centering (not mean) is what makes it
  * robust on heavy tails, and integer-exact here: deviations from an
  * integer median are integers. No reference counterpart (§2.6).
  *
  * Exactness: group medians by histogram clearing (2·cum ≥ n_g);
  * d = |v − med_g| exact longs; SSB/SSW from Σd, Σd² per group with
  * per-term micro floors — SSB_micro = Σ_g (Sd_g²·10⁶ div n_g) −
  * S²·10⁶ div N, SSW_micro = Σ Sd2_g·10⁶ − Σ (Sd_g²·10⁶ div n_g) —
  * then W_micro = (N−k)·SSB_micro·10⁶ div ((k−1)·SSW_micro). The
  * rejection uses the large-N identity (k−1)·W → χ²_{k−1} against
  * the shared literal table (chi95micro) — documented as the
  * asymptotic decision (F quantiles are data-df-dependent; no
  * runtime CDF, the SPRT folded-constant rule).
  *
  * Scale: one combine agg to the (group, value) histogram; per-group
  * cum windows on the histogram; everything after is k-row metadata.
  * Envelope: Σd per group ≤ 10¹⁵ guarded loudly (then Sd²·10⁶ ≤ 10³⁶
  * inside decimal(38,0)).
  *
  * Output: one row per group, ordered — (g, n, med_cents,
  * mean_absdev_micro, w_micro, df1, df2, reject_05_approx).
  */
object BrownForsythe {

  def test(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df
      .groupBy(col(groupCol).as("g"), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // median clearing + deviation pass
    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val meds = cells
      .withColumn("cum", sum("c").over(wg))
      .withColumn("ntot", sum("c").over(Window.partitionBy("g")))
      .filter(lit(2L) * col("cum") >= col("ntot"))
      .groupBy("g").agg(min("v").as("med"))
    val grp = cells.join(meds, Seq("g"))
      .select(col("g"), col("med"), col("c"),
        abs(col("v") - col("med")).as("d"))
      .groupBy("g", "med")
      .agg(sum("c").as("ng"),
        sum(col("c") * col("d")).as("sd"),
        sum(dec(col("c")) * dec(col("d")) * dec(col("d"))).as("sd2"))
      .select(col("g"), col("med"), col("ng"),
        when(col("sd") <= 1000000000000000L, col("sd"))
          .otherwise(raise_error(concat(lit("BrownForsythe: group "),
            col("g"), lit(" deviation sum "), col("sd"),
            lit(" exceeds the decimal(38,0) envelope (1e15); rescale"
              + " or aggregate the values upstream")))).as("sd"),
        col("sd2"))
      .localCheckpoint(true) // k rows: totals + the term pass
    val div6 = (a: Column, b: Column) =>
      graft.llm.TextOps.floorDivDec(a * lit(1000000L), b)
    val tot = grp
      .select(col("ng"), col("sd"), col("sd2"),
        div6(dec(col("sd")) * dec(col("sd")), dec(col("ng"))).as("sq_ng"))
      .agg(sum("ng").as("nn"), count(lit(1)).as("k"),
        sum("sd").as("s_all"),
        sum(dec(col("sd2")) * lit(1000000L)).as("sd2_all6"),
        sum("sq_ng").as("sq6"))
      .select(col("nn"), col("k"),
        // per-term floors can push an exactly-zero SSB a hair negative
        // (difference of floors) — clamp at 0 so the signed-division
        // floor-vs-trunc engine divergence can never engage
        greatest(col("sq6") - div6(dec(col("s_all")) * dec(col("s_all")),
          dec(col("nn"))), dec(lit(0L))).as("ssb6"),
        greatest(col("sd2_all6") - col("sq6"), dec(lit(0L))).as("ssw6"))
    grp.crossJoin(broadcast(tot))
      .select(col("g"), col("ng").as("n"), col("med").as("med_cents"),
        graft.llm.TextOps.floorDivDec(dec(col("sd")) * lit(1000000L),
          dec(col("ng"))).cast("long").as("mean_absdev_micro"),
        when(col("ssw6") > 0,
          graft.llm.TextOps.floorDivDec(
            dec(col("nn") - col("k")) * col("ssb6") * lit(1000000L),
            dec(col("k") - 1) * col("ssw6")))
          .otherwise(dec(lit(0L))).cast("long").as("w_micro"),
        (col("k") - 1).as("df1"), (col("nn") - col("k")).as("df2"),
        col("k"))
      .withColumn("reject_05_approx",
        dec(col("df1")) * dec(col("w_micro")) >=
          dec(KruskalWallis.chi95micro.toSeq.sortBy(_._1).foldLeft(
            raise_error(lit("BrownForsythe: chi-square table covers"
              + " df 1..6 (k in 2..7)")).cast("long")) {
            case (acc, (d, q)) =>
              when(col("k") - 1 === d, lit(q)).otherwise(acc)
          }))
      .select("g", "n", "med_cents", "mean_absdev_micro", "w_micro",
        "df1", "df2", "reject_05_approx")
      .orderBy("g")
  }
}
