package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Page's trend test (Page 1963) — the fourth corner of the rank-test
  * matrix: {pooled, blocked} × {unordered, ordered} = Kruskal–Wallis
  * (X346), Friedman (X353), Jonckheere–Terpstra (X354), and THIS —
  * "do values rise along the treatment order CONSISTENTLY within
  * every block": JT pools day-of-week noise away; Page ranks within
  * each day first, so a trend that holds every day but drowns in
  * day-level waves still accumulates.
  *
  * Exactness: within-block doubled tied ranks (the Friedman
  * discipline: R2 = 2·|{less}| + |{equal}| + 1 from a block-keyed k²
  * self-join), treatment order index j = 1..k by the order column's
  * rank. L2 = Σ_j j·S2_j is an integer; E[L2] = n·k(k+1)²/2 (exact —
  * k(k+1) is even); the classical no-tie variance 144·Var[L] =
  * n·k²(k+1)(k²−1) cross-multiplies the z² decision against the χ²₁
  * literal:
  *   z² ≥ 3.841458 ⟺ (L2−E2)²·36·10⁶ ≥ 3841458·n·k²(k+1)(k²−1).
  * The tie-aware variance is NOT applied (documented; pre-dither
  * heavy-tie feeds or read z² as slightly anti-conservative).
  *
  * Complete blocks only, dropped count reported (the Friedman rule).
  * Scale shape: cells-level combine agg upstream, block-keyed k²
  * rank join, treatment-count-bounded aggs after.
  */
object Page {

  /** cells(blockCol, treatCol, valueCol): ONE row per (block,
    * treatment); treatCol must be ORDERABLE (the trend direction).
    * One row out: (n_blocks, k, n_dropped, l2, e2, z2_micro, rising,
    * reject_05). */
  def trend(cells: DataFrame, blockCol: String, treatCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = cells.select(col(blockCol).as("b"), col(treatCol).as("j"),
      col(valueCol).as("v")).localCheckpoint(true)
    val kAll = base.agg(countDistinct(col("j")).as("k"))
    val bcnt = base.groupBy("b").agg(count(lit(1)).as("bk"))
    val complete = base.join(bcnt, "b").crossJoin(broadcast(kAll))
      .filter(col("bk") === col("k"))
      .select("b", "j", "v")
      .localCheckpoint(true) // rank self-join both sides
    val nDropped = bcnt.crossJoin(broadcast(kAll))
      .filter(col("bk") =!= col("k")).agg(count(lit(1)).as("n_dropped"))
    val ranked = complete
      .join(complete.select(col("b"), col("v").as("v2")), "b")
      .groupBy("b", "j", "v")
      .agg((lit(2L) * sum(when(col("v2") < col("v"), 1L).otherwise(0L))
        + sum(when(col("v2") === col("v"), 1L).otherwise(0L)) + 1L)
        .as("r2"))
    val order = complete.select("j").distinct()
      .withColumn("t", row_number().over(Window.orderBy("j")).cast("long"))
    val l2t = ranked.join(order, "j")
      .agg(coalesce(sum(dec(col("t")) * dec(col("r2"))), dec(lit(0L)))
        .as("l2"))
    val nb = complete.select("b").distinct().agg(count(lit(1)).as("n"))
    nb.crossJoin(broadcast(kAll)).crossJoin(broadcast(nDropped))
      .crossJoin(broadcast(l2t)) // 1-row scalar joins
      .select(col("n").as("n_blocks"), col("k"), col("n_dropped"),
        col("l2").cast("long").as("l2"),
        graft.llm.TextOps.floorDivDec(
          dec(col("n")) * dec(col("k")) * dec(col("k") + 1)
            * dec(col("k") + 1), dec(lit(2L))).cast("long").as("e2"),
        (dec(col("n")) * dec(col("k")) * dec(col("k"))
          * dec(col("k") + 1)
          * (dec(col("k")) * dec(col("k")) - 1)).as("v144"))
      .select(col("n_blocks"), col("k"), col("n_dropped"), col("l2"),
        col("e2"),
        when(col("v144") > 0,
          graft.llm.TextOps.floorDivDec(
            dec(col("l2") - col("e2")) * dec(col("l2") - col("e2"))
              * lit(36L) * lit(1000000L), col("v144")).cast("long"))
          .otherwise(lit(0L)).as("z2_micro"),
        (col("l2") > col("e2")).as("rising"),
        (col("v144") > 0
          && dec(col("l2") - col("e2")) * dec(col("l2") - col("e2"))
            * lit(36L) * lit(1000000L)
            >= dec(lit(3841458L)) * col("v144")).as("reject_05"))
  }
}
