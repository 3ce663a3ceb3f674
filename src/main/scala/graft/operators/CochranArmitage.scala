package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cochran–Armitage trend test (Cochran 1954; Armitage 1955) — the
  * BINARY-outcome trend question next to Jonckheere's continuous one:
  * does the error RATE rise along the ordered dose (hour buckets,
  * exposure levels)? A plain k-proportions χ² ignores the order and
  * wastes its power across k−1 df; CA spends one df on the monotone
  * contrast.
  *
  * Exactness: with integer scores t_g = g, T = Σ t·r_g, S1 = Σ t·n_g,
  * S2 = Σ t²·n_g, the z² cross-multiplies to pure integers:
  *   z² = (nT − R·S1)²·(n−1) / (R(n−R)·(nS2 − S1²)),
  * decided against the shared χ²₁ micro literal — no CDF, no sqrt,
  * no ratio ever floats. One combine agg to the k dose cells; the
  * statistic is metadata arithmetic after that.
  *
  * Envelope: (nT − R·S1)²·(n−1)·10⁶ grows ~n⁵·k² and fits
  * decimal(38,0) to n ≈ 10⁶ rows — loudly enforced; stratify
  * upstream (per day, per shard) past it.
  */
object CochranArmitage {

  /** df(groupCol, flagCol): Long-valued ordered dose score and a
    * boolean outcome. One row: (n, r, k, z2_micro, rising,
    * reject_05). Degenerate inputs (all-success, all-failure, or a
    * single dose level) report z² = 0 and no rejection. */
  def trend(df: DataFrame, groupCol: String, flagCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(col(groupCol).as("g"),
        when(col(flagCol), 1L).otherwise(0L).as("y"))
      .groupBy("g").agg(count(lit(1)).as("ng"), sum("y").as("rg"))
    val m = cells.agg(
      sum("ng").as("n"), sum("rg").as("r"), count(lit(1)).as("k"),
      sum(dec(col("g")) * dec(col("rg"))).as("t"),
      sum(dec(col("g")) * dec(col("ng"))).as("s1"),
      sum(dec(col("g")) * dec(col("g")) * dec(col("ng"))).as("s2"))
    val nChecked = when(col("n") <= 1000000L, col("n"))
      .otherwise(raise_error(concat(lit("CochranArmitage: n = "),
        col("n"), lit(" rows exceeds the decimal(38,0) envelope (1e6);"
          + " stratify upstream"))))
    m.select(col("n"), col("r"), col("k"),
        (dec(nChecked) * col("t") - dec(col("r")) * col("s1")).as("num"),
        (dec(col("r")) * dec(col("n") - col("r"))
          * (dec(col("n")) * col("s2") - col("s1") * col("s1")))
          .as("den"))
      .select(col("n"), col("r"), col("k"),
        when(col("den") > 0,
          graft.llm.TextOps.floorDivDec(
            col("num") * col("num") * dec(col("n") - 1) * lit(1000000L),
            col("den")).cast("long"))
          .otherwise(lit(0L)).as("z2_micro"),
        (col("num") > 0).as("rising"),
        (col("den") > 0
          && col("num") * col("num") * dec(col("n") - 1) * lit(1000000L)
            >= dec(lit(3841458L)) * col("den")).as("reject_05"))
  }
}
