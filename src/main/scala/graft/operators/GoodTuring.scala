package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Good–Turing frequency re-estimation (Good '53) from the
  * count-of-counts table — the missing-mass readout next to the
  * Kneser–Ney LM (X275): how much probability belongs to words NEVER
  * seen (p0 = N₁/N, the Turing estimate that also drives
  * capture–recapture-style vocabulary-growth expectations), and the
  * adjusted counts r* = (r+1)·N_{r+1}/N_r that de-bias every rare
  * count before it feeds a language model or a quality score.
  *
  * Raw Turing estimates only: the Gale–Sampson SIMPLE GT smooths N_r
  * by a log-log regression before applying the formula — that
  * regression is one OLS over ≤ maxR points (the p_groupwise_ols
  * machinery) a caller runs on this very table; emitting the raw
  * (r-star, N_r) pairs keeps this operator assumption-free and
  * oracle-exact. Rows where N_r = 0 report r* = 0 (the formula is
  * undefined there — exactly the hole SGT's smoothing fills), and the
  * r = 1..maxR spine is COMPLETE (the X237 rule) so both engines
  * agree on absent rows.
  *
  * Scale: input is the word-count table (vocabulary-bounded, itself
  * one corpus combine agg); count-of-counts is a second combine agg
  * to ≤ max-count rows; the spine join is range × metadata. All
  * integers — r*·10⁶ and p₀·10⁶ are exact integer floors.
  */
object GoodTuring {

  /** `counts`: one row per type with its token count. Output: one row
    * per r in 1..maxR — (r, n_r, n_next, r_star_micro, p0_micro).
    */
  def countOfCounts(counts: DataFrame, cntCol: String,
      maxR: Int = 10): DataFrame = {
    require(maxR >= 1, s"maxR ($maxR) must be >= 1")
    val nr = counts.select(col(cntCol).as("r"))
      .groupBy("r").agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = true) // spine join reads it twice (r, r+1)
    val tot = counts.agg(coalesce(sum(col(cntCol)), lit(0L)).as("nn"))
    val n1 = nr.filter(col("r") === 1)
      .agg(coalesce(sum("n"), lit(0L)).as("n1"))
    counts.sparkSession.range(1, maxR + 1).select(col("id").as("r"))
      .join(nr, Seq("r"), "left")
      .join(nr.select((col("r") - 1).as("r"), col("n").as("_n2")),
        Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(n1))
      .select(col("r"), coalesce(col("n"), lit(0L)).as("n_r"),
        coalesce(col("_n2"), lit(0L)).as("n_next"),
        col("nn"), col("n1"))
      .select(col("r"), col("n_r"), col("n_next"),
        when(col("n_r") > 0,
          expr("((r + 1) * n_next * 1000000) div n_r"))
          .otherwise(lit(0L)).as("r_star_micro"),
        when(col("nn") > 0, expr("(n1 * 1000000) div nn"))
          .otherwise(lit(0L)).as("p0_micro"))
      .orderBy("r")
  }
}
