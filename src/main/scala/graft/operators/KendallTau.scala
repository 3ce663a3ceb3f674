package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tie-aware Kendall τ-b per group (Kendall 1938; the τ-b tie form of
  * Kendall 1945) — the PAIRWISE-order association lens next to
  * Spearman's rank-moment one (X337): τ reads "what fraction of item
  * pairs agree in order", directly interpretable as a probability,
  * and it is the statistic under Kendall-distance rank aggregation.
  *
  * Exactness: every quantity is an integer. S = C − D is accumulated
  * from the JOINT VALUE HISTOGRAM — for cells a, b with x_a < x_b the
  * pair weight is c_a·c_b·sign(y_b − y_a); pairs sharing an x (or a
  * whole cell) contribute 0 by definition. With doubled-pair tie
  * terms Tx = Σ_x c_x(c_x−1), Ty = Σ_y c_y(c_y−1) and
  * P = n(n−1) − Tx, Q = n(n−1) − Ty (each TWICE the classical
  * n0 − n1, n0 − n2),
  *   τ_b = S / √((n0−n1)(n0−n2)) = 2S / √(P·Q),
  * so tau_micro = ⌊2·S·10⁶ / isqrtDec(P·Q)⌋ (toward zero, the shared
  * Spark DIV / DuckDB // semantics), clamped to ±10⁶. P, Q ≤ n²
  * keeps P·Q ≤ n⁴ inside decimal(38,0) to n ≈ 3·10⁹ rows; isqrtDec's
  * floored root underestimates by < 1 part in 10¹⁶ at that size —
  * far below a micro.
  *
  * Scale shape: the O(n²) pair sum NEVER touches rows — it runs on
  * the joint histogram, whose size is the product of the two VALUE
  * DOMAINS (here ≤ a few thousand cells per group), so the self-join
  * is an equi-join on the group key with cells² pair work that is
  * independent of the corpus row count. Histogram build is one
  * combine agg. Quantize continuous columns before calling.
  */
object KendallTau {

  /** df(groupCol, xCol, yCol): Long-valued x, y. One row per group:
    * (group, n, s_stat, tau_micro). A group where either column is
    * constant (P or Q = 0) reports tau_micro = 0. */
  def tauB(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df
      .groupBy(col(groupCol).as("g"), col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // pair join + three tie/total aggs
    // two aliases of the one checkpointed cell plan
    val left = cells.select(col("g"), col("x").as("xa"),
      col("y").as("ya"), col("c").as("ca"))
    val right = cells.select(col("g").as("g2"), col("x").as("xb"),
      col("y").as("yb"), col("c").as("cb"))
    val s = left.join(right,
        left("g") === right("g2") && col("xa") < col("xb"))
      .groupBy("g")
      .agg(sum(dec(col("ca")) * dec(col("cb")) *
        when(col("yb") > col("ya"), 1L)
          .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("s2"))
    val tx = cells.groupBy("g", "x").agg(sum("c").as("cx"))
      .groupBy("g").agg(sum(dec(col("cx")) * dec(col("cx") - 1)).as("tx"))
    val ty = cells.groupBy("g", "y").agg(sum("c").as("cy"))
      .groupBy("g").agg(sum(dec(col("cy")) * dec(col("cy") - 1)).as("ty"))
    val tot = cells.groupBy("g").agg(sum("c").as("n"))
    tot.join(s, Seq("g"), "left").join(tx, Seq("g")).join(ty, Seq("g"))
      .select(col("g"), col("n"),
        coalesce(col("s2"), dec(lit(0L))).as("s_dec"),
        (dec(col("n")) * dec(col("n") - 1) - col("tx")).as("p"),
        (dec(col("n")) * dec(col("n") - 1) - col("ty")).as("q"))
      .select(col("g"), col("n"), col("s_dec").cast("long").as("s_stat"),
        // exact rational, no root anywhere: sign(S)·4S²·10⁶ // (P·Q)
        // (4S² ≤ P·Q by Cauchy–Schwarz on the pair indicators, so the
        // value is a true τ² on the micro grid — the Spearman rho²
        // discipline). 4S²·10⁶ ≤ n⁴·10⁶ fits decimal(38,0) to n ≈ 10⁷.
        when(col("p") > 0 && col("q") > 0,
          when(col("s_dec") >= 0, lit(1L)).otherwise(lit(-1L)) *
            graft.llm.TextOps.floorDivDec(
              dec(lit(4L)) * col("s_dec") * col("s_dec") * lit(1000000L),
              col("p") * col("q")).cast("long"))
          .otherwise(lit(0L)).as("tau2_signed_micro"),
        // familiar ±10⁶ scale; the floored root under-reads √(P·Q) by
        // < 1 part in √(P·Q) — sub-micro once groups pass ~10³ rows
        // (toy-n inputs read the coarser grid; pinned in the spec)
        when(col("p") > 0 && col("q") > 0,
          least(greatest(
            graft.llm.TextOps.truncDivDec(
              col("s_dec") * lit(2L) * lit(1000000L),
              graft.llm.TextOps.isqrtDec(col("p") * col("q")))
              .cast("long"),
            lit(-1000000L)), lit(1000000L)))
          .otherwise(lit(0L)).as("tau_micro"))
      .orderBy("g")
  }
}
