package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D skyline (Pareto frontier), both dimensions maximized — the
  * multi-objective selection primitive behind "which documents are not
  * strictly beaten on BOTH quality and length?" (budgeted curation
  * reads the frontier before trading the objectives off; Börzsönyi et
  * al. ICDE 2001 introduced the operator).
  *
  * Dominance: s dominates r iff s.x ≥ r.x ∧ s.y ≥ r.y and at least one
  * is strict. Ties survive together (neither dominates).
  *
  * Scale shape — prune-then-verify, NO global sort, NO corpus
  * self-join:
  *  1. bucket rows by x (fixed integer width — deterministic, no
  *     quantiles needed), one map-side-combine groupBy gives each
  *     bucket's max y;
  *  2. the prefix-max of STRICTLY-higher buckets (a lag-max window over
  *     the ≤|buckets|-row metadata table) prunes every row it strictly
  *     beats: a higher-bucket witness has strictly greater x, so
  *     `above ≥ y` proves dominance. Skyline rows always survive
  *     (a surviving witness would contradict their skyline-ness), so
  *     candidates ⊇ skyline;
  *  3. exact dominance anti-join among the surviving CANDIDATES only —
  *     frontier-sized, broadcast nested-loop is the right plan there.
  * The only corpus-scale operations are the bucket groupBy and the
  * broadcast-prune filter.
  */
object Skyline {

  /** @param xBucketWidth integer bucket width on x (e.g. 31250 for a
    *                     quality-micro axis in [0, 10⁶] → 32 buckets)
    */
  def skyline2D(df: DataFrame, idCol: String, xCol: String, yCol: String,
      xBucketWidth: Long): DataFrame = {
    require(xBucketWidth > 0, s"xBucketWidth ($xBucketWidth) must be > 0")
    val b = df.select(col(idCol), col(xCol).cast("long").as("_x"),
        col(yCol).cast("long").as("_y"))
      .withColumn("_bx", expr(s"_x div ${xBucketWidth}L"))
    val above = b.groupBy("_bx").agg(max("_y").as("_by"))
      .withColumn("_above", max("_by").over(
        Window.orderBy(col("_bx").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select("_bx", "_above")
    val cand = b.join(broadcast(above), "_bx")
      .filter(col("_above").isNull || col("_above") < col("_y"))
      .select(col(idCol), col("_x"), col("_y"))
    val witnesses = broadcast(
      cand.select(col("_x").as("_sx"), col("_y").as("_sy")))
    cand.join(witnesses,
        col("_sx") >= col("_x") && col("_sy") >= col("_y")
          && (col("_sx") > col("_x") || col("_sy") > col("_y")),
        "left_anti")
      .select(col(idCol), col("_x").as(xCol), col("_y").as(yCol))
      .orderBy(idCol)
  }
}
