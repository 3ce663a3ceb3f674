package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Capture–recapture population estimation (Lincoln–Petersen with
  * Chapman's 1951 bias correction) from two independent "captures" of
  * the same hidden population — here: two near-dup DETECTORS' flagged
  * sets, estimating the total duplicate population including what
  * NEITHER method found (X271). The dedup-QA question this answers is
  * unphraseable from either method alone: "how much is still out
  * there". N̂ = (n₁+1)(n₂+1)/(m+1) − 1; est_missed = max(N̂ − |union|,
  * 0). A nested pair (one detector ⊆ the other) collapses to N̂ =
  * |union| and missed = 0 — the degenerate-independence readout, not
  * an error.
  *
  * All integer: counts, one exact [[TextOps.floorDivDec]]. Scale:
  * two distinct-aggregates, one equi-join for the overlap, one union
  * distinct — each a combine-agg over the flagged sets, which are
  * tiny relative to the corpus by construction.
  */
object CaptureRecapture {

  /** `m1`, `m2`: one column `d` each (the flagged members). Returns a
    * single row (n1, n2, overlap, n_union, chapman_est, est_missed).
    */
  def chapman(m1In: DataFrame, m2In: DataFrame): DataFrame = {
    val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
    val m1 = m1In.select("d").distinct().localCheckpoint(eager = true)
    val m2 = m2In.select("d").distinct().localCheckpoint(eager = true)
    m1.agg(count(lit(1)).as("n1"))
      .crossJoin(m2.agg(count(lit(1)).as("n2")))
      .crossJoin(m1.join(m2, "d").agg(count(lit(1)).as("overlap")))
      .crossJoin(m1.unionAll(m2).distinct()
        .agg(count(lit(1)).as("n_union")))
      .withColumn("chapman_est",
        (TextOps.floorDivDec(dec(col("n1") + 1) * dec(col("n2") + 1),
          dec(col("overlap") + 1)) - 1).cast("long"))
      .withColumn("est_missed",
        greatest(col("chapman_est") - col("n_union"), lit(0L)))
  }
}
