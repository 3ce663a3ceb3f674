package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** McNemar–Bowker symmetry test (Bowker 1948): the k-label
  * generalization of McNemar — given two classifiers' labels on the
  * same units, is the disagreement SYMMETRIC? χ² = Σ_{i<j}
  * (n_ij − n_ji)² / (n_ij + n_ji), df = the number of off-diagonal
  * pairs that actually disagree (the standard convention: empty
  * pairs drop and reduce df). Completes the paired-eval ladder:
  * kappa asks "do they agree", McNemar asks "who is right on the
  * gold 2×2", Bowker asks "WHERE does one systematically relabel the
  * other" — the drift question when neither side carries gold.
  *
  * All-integer: per-pair terms micro-floored (numerators are squares
  * — floor ≡ trunc, no signed-division divergence), decided against
  * the shared χ²₀.₉₅ literal table (chi95micro base df 1–6 plus the
  * df 7–10 extension derived by the documented offline bisection —
  * the HashUniformitySpec df=99 precedent; no runtime CDF).
  *
  * Scale: one combine agg to the (a, b) disagreement counts (≤ L²
  * rows); the label universe and the pair grid are L-sized metadata.
  *
  * Output: one row per unordered label pair (i < j), ordered —
  * (lang_a, lang_b, n_ab, n_ba, term_micro, used, chi2_micro, df,
  * reject_05). Zero-disagreement pairs report used = false.
  */
object McNemarBowker {

  /** χ²₀.₉₅ micro-quantiles for df 7–10, derived offline by bisecting
    * the regularized incomplete gamma (series + continued fraction,
    * 200 halvings) — extends KruskalWallis.chi95micro, whose df 1–6
    * literals are left untouched for decision stability.
    */
  private[graft] val chi95microExt: Map[Int, Long] =
    KruskalWallis.chi95micro ++ Map(
      7 -> 14067140L, 8 -> 15507313L, 9 -> 16918978L, 10 -> 18307038L)

  def test(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cnt = df
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // label universe + both pair directions
    val labels = cnt.select(col("a").as("l"))
      .unionAll(cnt.select(col("b").as("l"))).distinct()
    val grid = labels.select(col("l").as("la"))
      .join(labels.select(col("l").as("lb")), col("la") < col("lb"))
    val pairs = grid
      .join(cnt.select(col("a").as("la"), col("b").as("lb"),
        col("c").as("n_ab")), Seq("la", "lb"), "left")
      .join(cnt.select(col("b").as("la"), col("a").as("lb"),
        col("c").as("n_ba")), Seq("la", "lb"), "left")
      .select(col("la"), col("lb"),
        coalesce(col("n_ab"), lit(0L)).as("n_ab"),
        coalesce(col("n_ba"), lit(0L)).as("n_ba"))
      .select(col("la"), col("lb"), col("n_ab"), col("n_ba"),
        when(col("n_ab") + col("n_ba") > 0,
          graft.llm.TextOps.floorDivDec(
            dec(col("n_ab") - col("n_ba")) * dec(col("n_ab") - col("n_ba"))
              * lit(1000000L),
            dec(col("n_ab") + col("n_ba"))))
          .otherwise(dec(lit(0L))).cast("long").as("term_micro"),
        (col("n_ab") + col("n_ba") > 0).as("used"))
    val w = Window.partitionBy(lit(1))
    pairs
      .withColumn("chi2_micro", sum("term_micro").over(w))
      .withColumn("df",
        sum(when(col("used"), 1L).otherwise(0L)).over(w))
      .withColumn("reject_05",
        // CaseWhen evaluates only the matching branch, so the df = 0
        // (no disagreement anywhere) degenerate never reaches the
        // raise_error fallback of the quantile chain
        when(col("df") === 0, lit(false)).otherwise(
          col("chi2_micro") >=
            chi95microExt.toSeq.sortBy(_._1).foldLeft(
              raise_error(lit("McNemarBowker: chi-square table covers"
                + " df 1..10 — more than 5 labels needs a wider table"))
                .cast("long")) {
              case (acc, (d, q)) =>
                when(col("df") === d, lit(q)).otherwise(acc)
            }))
      .select("la", "lb", "n_ab", "n_ba", "term_micro", "used",
        "chi2_micro", "df", "reject_05")
      .orderBy("la", "lb")
  }
}
