package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cochran's Q test (Cochran 1950) — the k-treatment generalization
  * of McNemar for BINARY repeated measures: do k related binary
  * readings (here: "did this subject show each of the k behaviours")
  * share one success rate, or do the treatments differ? Completes the
  * repeated-measures row next to Friedman (ranked values) and McNemar
  * (k = 2): Q = (k−1)·(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²) with
  * C_j the treatment totals and R_i the subject totals, compared to
  * χ²₀.₉₅(k−1) — an EXACT integer rational end to end, decided by
  * cross-multiplication against the shared micro quantile literals
  * (no CDF in either engine).
  *
  * All-zero and all-k subjects are algebraically inert (they add
  * nothing to the denominator, and a constant row shift leaves
  * k·ΣC² − (ΣC)² unchanged), so the operator does NOT need to filter
  * them — absent subjects (R_i = 0) drop out for free.
  *
  * Scale: one combine aggregate to (subject, treatment) presence
  * cells, one to per-subject totals, one to per-treatment totals —
  * three map-side-partial aggregations, a k-row final fold, no
  * window, no data join. The treatment count k is data-derived and
  * ENFORCED within the decision table's df range (loud raise_error
  * otherwise).
  */
object CochranQ {

  /** df(subjectCol, treatmentCol): ONE ROW PER OBSERVED PRESENCE
    * (subject i showed treatment j at least once — duplicates
    * collapse). Returns one row: (k, n_subjects, sum_c, sum_c2,
    * sum_r2, q_micro, reject_05). */
  def q(df: DataFrame, subjectCol: String, treatmentCol: String)
      : DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df
      .select(col(subjectCol).as("s"), col(treatmentCol).as("t"))
      .distinct()
      .localCheckpoint(true) // feeds subject totals AND treatment totals
    val rows = cells.groupBy("s").agg(count(lit(1)).as("r"))
      .agg(count(lit(1)).as("n_subjects"), sum("r").as("sumR"),
        sum(col("r") * col("r")).as("sumR2"))
    val cols = cells.groupBy("t").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("k"), sum("c").as("sumC"),
        sum(dec(col("c")) * dec(col("c"))).as("sumC2"))
    val chi = KruskalWallis.chi95micro
    val dfCase = chi.toSeq.sortBy(_._1).foldLeft(
      lit(null).cast("long")) { case (acc, (d, v)) =>
        when(col("k") - 1 === d, lit(v)).otherwise(acc)
      }
    rows.crossJoin(broadcast(cols))
      .select(col("k"), col("n_subjects"), col("sumC").cast("long")
          .as("sum_c"),
        col("sumC2").cast("long").as("sum_c2"),
        col("sumR2").cast("long").as("sum_r2"),
        // numerator (k−1)(k·ΣC² − (ΣC)²), denominator k·ΣR − ΣR²;
        // ΣR = ΣC (both count the same presence cells)
        {
          val num = dec(col("k") - 1) *
            (dec(col("k")) * col("sumC2") - dec(col("sumC"))
              * dec(col("sumC")))
          val den = dec(col("k")) * dec(col("sumR")) - dec(col("sumR2"))
          when(den > 0, graft.llm.TextOps.floorDivDec(
            num * lit(1000000L), den).cast("long"))
            .otherwise(lit(0L)).as("q_micro")
        },
        {
          val chiV = when(dfCase.isNull, raise_error(concat(
            lit("CochranQ: k = "), col("k"),
            lit(" outside the chi-square decision table (df 1..6); "
              + "extend KruskalWallis.chi95micro"))))
            .otherwise(dfCase)
          val num = dec(col("k") - 1) *
            (dec(col("k")) * col("sumC2") - dec(col("sumC"))
              * dec(col("sumC")))
          val den = dec(col("k")) * dec(col("sumR")) - dec(col("sumR2"))
          (den > 0 && num * lit(1000000L) >= dec(chiV) * den)
            .as("reject_05")
        })
  }
}
