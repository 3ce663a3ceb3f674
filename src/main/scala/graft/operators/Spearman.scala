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
  *    sum-of-squares terms), no square root anywhere;
  *  - rho_micro = num·10⁶ // (isqrt(A)·isqrt(B)), clamped to ±10⁶ —
  *    the familiar scale, with the floored-isqrt caveat (den
  *    underestimates, negligible at corpus n, clamped at toy n).
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
    m.select(col("n"),
        (dec(col("n")) * col("sxy") - col("sx") * col("sy")).as("num"),
        (dec(col("n")) * col("sxx") - col("sx") * col("sx")).as("a"),
        (dec(col("n")) * col("syy") - col("sy") * col("sy")).as("b"))
      .select(col("n"),
        when(col("a") > 0 && col("b") > 0,
          when(col("num") >= 0, lit(1L)).otherwise(lit(-1L)) *
            graft.llm.TextOps.floorDivDec(
              col("num") * col("num") * lit(1000000L),
              col("a") * col("b")).cast("long"))
          .otherwise(lit(0L)).as("rho2_signed_micro"),
        when(col("a") > 0 && col("b") > 0,
          least(greatest(
            graft.llm.TextOps.truncDivDec(col("num") * lit(1000000L),
              greatest(
                dec(graft.llm.TextOps.isqrt(col("a").cast("long")))
                  * dec(graft.llm.TextOps.isqrt(col("b").cast("long"))),
                dec(lit(1L)))).cast("long"),
            lit(-1000000L)), lit(1000000L)))
          .otherwise(lit(0L)).as("rho_micro"))
  }
}
