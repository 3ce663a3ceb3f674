package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mood's median test (Mood 1950; the k-sample sign test on the
  * POOLED median): do the groups share a location? Counts per group
  * how many values exceed the pooled median and tests the k×2
  * contingency table against independence. The robustness-first
  * sibling of Kruskal–Wallis — throws away everything but the side
  * of the median, so single-cell corruption cannot move it; the
  * standard "is this metric shifted anywhere" triage on heavy-tailed
  * event values. No reference counterpart (SURVEY §2.6).
  *
  * Exact integer arithmetic end to end (the cross-engine rule): the
  * pooled median comes from the value histogram by integer clearing
  * (min v with 2·cum ≥ N); with A = Σ above, B = N − A, the 2×k χ²
  * collapses to χ² = Σ_g (a_g·N − n_g·A)² / (n_g·A·B) — each term
  * micro-floored as a decimal(38,0) division (per-term floors,
  * deterministic in both engines), decided against the shared
  * χ²₀.₉₅ literal table (KruskalWallis.chi95micro, df = k−1 ≤ 6).
  * Degenerate inputs (every value on one side: A = 0 or B = 0)
  * report χ² = 0, no rejection.
  *
  * Scale: one combine agg to the (group, value) histogram; the value
  * window runs on the histogram, never the rows; the group table is
  * k-sized metadata. Envelope guard: N ≤ 5·10⁶ keeps (a·N − n·A)²·10⁶
  * inside decimal(38,0) — fails loudly on the first oversize total
  * with the remedy named.
  *
  * Output: one row per group, ordered — (g, n, n_above, term_micro,
  * chi2_micro, df, reject_05); chi2/df/reject repeat per row (the
  * group rows ARE the audit table).
  */
object MoodMedian {

  def test(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df
      .groupBy(col(groupCol).as("g"), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // pooled histogram + group tallies
    val pooled = cells.groupBy("v").agg(sum("c").as("cv"))
      .withColumn("cum", sum("cv").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = pooled.agg(sum("cv").as("n_total"))
      .select(when(col("n_total") <= 5000000L, col("n_total"))
        .otherwise(raise_error(concat(lit("MoodMedian: n = "),
          col("n_total"),
          lit(" exceeds the decimal(38,0) envelope (5e6); aggregate"
            + " to coarser cells upstream"))))
        .as("n_total"))
    val med = pooled.crossJoin(broadcast(tot))
      .filter(lit(2L) * col("cum") >= col("n_total"))
      .agg(min("v").as("med"))
    val grp = cells.crossJoin(broadcast(med))
      .groupBy("g")
      .agg(sum("c").as("ng"),
        sum(when(col("v") > col("med"), col("c")).otherwise(lit(0L)))
          .as("ag"))
      .localCheckpoint(true) // k rows: A/B totals + the term pass
    val ab = grp.agg(sum("ag").as("aa"), sum("ng").as("nn"),
      count(lit(1)).as("k"))
    grp.crossJoin(broadcast(ab)).crossJoin(broadcast(med))
      .select(col("g"), col("ng"), col("ag"), col("med"), col("k"),
        when(col("aa") > 0 && col("aa") < col("nn"),
          graft.llm.TextOps.floorDivDec(
            (dec(col("ag")) * dec(col("nn")) - dec(col("ng")) * dec(col("aa")))
              * (dec(col("ag")) * dec(col("nn")) - dec(col("ng")) * dec(col("aa")))
              * lit(1000000L),
            dec(col("ng")) * dec(col("aa")) * dec(col("nn") - col("aa"))))
          .otherwise(dec(lit(0L))).as("term"))
      .withColumn("chi2_micro",
        sum(col("term")).over(Window.partitionBy(lit(1))).cast("long"))
      .select(col("g"), col("ng").as("n"), col("ag").as("n_above"),
        col("med").as("pooled_median"),
        col("term").cast("long").as("term_micro"),
        col("chi2_micro"), (col("k") - 1).as("df"),
        (col("chi2_micro") >=
          KruskalWallis.chi95micro.toSeq.sortBy(_._1).foldLeft(
            raise_error(lit("MoodMedian: chi-square table covers"
              + " df 1..6 (k in 2..7)")).cast("long")) {
            case (acc, (d, q)) =>
              when(col("k") - 1 === d, lit(q)).otherwise(acc)
          }).as("reject_05"))
      .orderBy("g")
  }
}
