package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among a
  * FIXED number of raters per subject, the multi-rater generalization
  * the 2-rater Cohen/Krippendorff pair can't read: when every doc in
  * a labeling campaign gets n independent judgments, how much of the
  * observed per-subject agreement survives after discounting the
  * marginal category prevalences?
  *
  *   P̄  = (Σ_i Σ_j n_ij² − N·n) / (N·n·(n−1))
  *   P̄e = Σ_j (C_j / (N·n))²
  *   κ  = (P̄ − P̄e) / (1 − P̄e)
  *      = (SP·N·n − ΣC²·(n−1)) / ((n−1)·((N·n)² − ΣC²))
  * after clearing denominators — an EXACT signed rational; kappa_micro
  * is one sign-extracted floored division, the only division anywhere.
  *
  * Scale: one combine agg to (subject, category) cells, one to
  * per-subject squared sums, one to the k category marginals — three
  * map-side-partial aggregations and a k-row final fold; no window,
  * no join on data. The rater count per subject is ENFORCED constant
  * (raise_error otherwise): Fleiss' variance algebra silently breaks
  * on ragged panels, and a distributed engine must fail loudly, not
  * average over a lie.
  */
object FleissKappa {

  /** df(subjectCol, catCol): ONE ROW PER RATING (a subject appears
    * exactly n times, once per rater). Returns one row:
    * (n_subjects, n_raters, n_categories, sp, sum_c2,
    *  pbar_micro, pe_micro, kappa_micro). */
  def kappa(df: DataFrame, subjectCol: String, catCol: String)
      : DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(col(subjectCol).as("s"), col(catCol).as("c"))
      .groupBy("s", "c").agg(count(lit(1)).as("nij"))
    val per = cells.groupBy("s")
      .agg(sum(col("nij") * col("nij")).as("sq"), sum("nij").as("n"))
    // the constant-panel contract: every subject rated by the same n
    val panel = per.agg(min("n").as("nmin"), max("n").as("nmax"),
      count(lit(1)).as("nsub"), sum("sq").as("spRaw"))
    val marg = cells.groupBy("c").agg(sum("nij").as("cj"))
      .agg(count(lit(1)).as("k"),
        sum(dec(col("cj")) * dec(col("cj"))).as("sumC2"))
    val checked = panel.select(
      when(col("nmin") === col("nmax") && col("nmin") >= 2, col("nmin"))
        .otherwise(raise_error(concat(
          lit("FleissKappa: ragged rater panel (min "), col("nmin"),
          lit(", max "), col("nmax"),
          lit(" ratings per subject); Fleiss requires a constant"
            + " n >= 2 — complete or filter the panel upstream"))))
        .cast("long").as("n"),
      col("nsub"), col("spRaw"))
    checked.crossJoin(broadcast(marg))
      .select(col("nsub").as("n_subjects"), col("n").as("n_raters"),
        col("k").as("n_categories"),
        (col("spRaw") - col("nsub") * col("n")).cast("long").as("sp"),
        col("sumC2").cast("decimal(38,0)").as("sum_c2"),
        col("n"), col("nsub"), col("spRaw"))
      .select(col("n_subjects"), col("n_raters"), col("n_categories"),
        col("sp"), col("sum_c2").cast("long").as("sum_c2"),
        // P̄·1e6 and P̄e·1e6 — observational readouts, floored micro
        graft.llm.TextOps.floorDivDec(dec(col("sp")) * lit(1000000L),
          dec(col("nsub")) * dec(col("n")) * dec(col("n") - 1))
          .cast("long").as("pbar_micro"),
        graft.llm.TextOps.floorDivDec(col("sum_c2") * lit(1000000L),
          dec(col("nsub")) * dec(col("n")) * dec(col("nsub"))
            * dec(col("n"))).cast("long").as("pe_micro"),
        {
          val num = dec(col("sp")) * dec(col("nsub")) * dec(col("n")) -
            col("sum_c2") * dec(col("n") - 1)
          val den = dec(col("n") - 1) *
            (dec(col("nsub")) * dec(col("n")) * dec(col("nsub"))
              * dec(col("n")) - col("sum_c2"))
          when(den > 0,
            when(num >= 0, lit(1L)).otherwise(lit(-1L))
              * graft.llm.TextOps.floorDivDec(abs(num) * lit(1000000L),
                  den).cast("long"))
            .otherwise(lit(0L)).as("kappa_micro")
        })
  }
}
