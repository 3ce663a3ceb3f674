package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tie-aware Spearman rank correlation (Spearman 1904; the tied-rank
  * Pearson-on-ranks form) — the MONOTONE-association lens next to the
  * linear Pearson (X54): "does quality rise with length" is a
  * monotonicity question, and Pearson under-reads any curved
  * relationship a rank correlation nails.
  *
  * Exactness (the X257 doubled-rank discipline): the average rank of
  * a tied value v is cum_before + (c+1)/2, so its DOUBLE
  * R2 = 2·cum_before + c + 1 is an integer; the halves cancel in the
  * correlation. Two exact readouts:
  *  - rho2_signed_micro = sign(num)·num²·10⁶ // (A·B) — EXACT
  *    rational (num = n·ΣR2xR2y − ΣR2x·ΣR2y, A/B the rank
  *    sum-of-squares terms), no square root anywhere — WITHIN the
  *    A, B ≤ 10¹⁶ envelope where the products fit decimal(38,0)
  *    (and DuckDB's HUGEINT; A, B grow ~n⁴/3, so that is n ≲ 5·10⁴
  *    rows). Past it both engines branch on the same constant to
  *    the derived sign·rho_micro²//10⁶ — exact on the micro grid
  *    there, since isqrtDec's floored denominator underestimates by
  *    < 1 part in 10¹⁶ at that magnitude;
  *  - rho_micro = num·10⁶ // (isqrtDec(A)·isqrtDec(B)), clamped to
  *    ±10⁶ — the familiar scale at ANY n that fits decimal(38,0)
  *    (full-decimal isqrt: a long-cast would overflow near n ≈ 7·10⁴
  *    — loud under ANSI, a silent ±10⁶ clamp without it).
  * All signed divisions truncate toward zero in both engines.
  *
  * Scale shape: ranks come from the two VALUE-HISTOGRAM cumulative
  * windows (value-domain sized) joined back by value — never a global
  * row sort; the moments are one combine agg. decimal(38,0) carries
  * every product.
  */
object Spearman {

  /** df(xCol, yCol): Long-valued columns. One row:
    * (n, rho2_signed_micro, rho_micro). Degenerate constant columns
    * (A or B = 0) report 0 for both. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .localCheckpoint(true) // two rank joins + the moment agg
    def ranks(c: String, out: String): DataFrame = base
      .groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("v"),
        (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + 1L).as(out))
    val ranked = base
      .join(ranks("x", "rx"), base("x") === col("v")).drop("v")
      .join(ranks("y", "ry"), base("y") === col("v")).drop("v")
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(dec(col("rx"))).as("sx"), sum(dec(col("ry"))).as("sy"),
      sum(dec(col("rx")) * dec(col("rx"))).as("sxx"),
      sum(dec(col("ry")) * dec(col("ry"))).as("syy"),
      sum(dec(col("rx")) * dec(col("ry"))).as("sxy"))
    // exact-rational envelope for rho²: num²·10⁶ and a·b must fit
    // decimal(38,0). |num| ≤ √(a·b) (Cauchy–Schwarz), so a, b ≤ 10¹⁶
    // each guarantees both (a·b ≤ 10³², num²·10⁶ ≤ 10³⁸). Past it
    // (n ≳ 5·10⁴ rows: a, b grow ~n⁴/3) the exact products overflow
    // ANY fixed-width integer — DuckDB's HUGEINT included — so BOTH
    // engines branch on the same constant to the derived form
    // sign·rho_micro²//10⁶, exact on the micro grid there (isqrtDec
    // is exact and its floored denominator underestimates by < 1
    // part in 10¹⁶ at that size — far below a micro).
    val env = lit(new java.math.BigDecimal("10000000000000000"))
      .cast("decimal(38,0)")
    m.select(col("n"),
        (dec(col("n")) * col("sxy") - col("sx") * col("sy")).as("num"),
        (dec(col("n")) * col("sxx") - col("sx") * col("sx")).as("a"),
        (dec(col("n")) * col("syy") - col("sy") * col("sy")).as("b"))
      // rho_micro first (its own projection: the rho² branch reuses
      // it as a bound column reference, not a re-inlined tree)
      .withColumn("rho_micro",
        when(col("a") > 0 && col("b") > 0,
          least(greatest(
            graft.llm.TextOps.truncDivDec(col("num") * lit(1000000L),
              // full-decimal isqrt: a, b pass Long near n ≈ 7·10⁴,
              // where a long-cast would fail (or, non-ANSI, null out
              // and silently clamp the result to ±10⁶)
              graft.llm.TextOps.isqrtDec(col("a"))
                * graft.llm.TextOps.isqrtDec(col("b"))).cast("long"),
            lit(-1000000L)), lit(1000000L)))
          .otherwise(lit(0L)))
      .select(col("n"),
        when(col("a") > 0 && col("b") > 0,
          when(col("a") <= env && col("b") <= env,
            when(col("num") >= 0, lit(1L)).otherwise(lit(-1L)) *
              graft.llm.TextOps.floorDivDec(
                col("num") * col("num") * lit(1000000L),
                col("a") * col("b")).cast("long"))
            .otherwise(
              when(col("num") >= 0, lit(1L)).otherwise(lit(-1L)) *
                graft.llm.TextOps.floorDivDec(
                  dec(col("rho_micro")) * dec(col("rho_micro")),
                  dec(lit(1000000L))).cast("long")))
          .otherwise(lit(0L)).as("rho2_signed_micro"),
        col("rho_micro"))
  }
}
