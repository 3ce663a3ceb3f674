package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANSAC line fit (Fischler & Bolles '81) with DETERMINISTIC md5
  * sampling — the high-breakdown robust estimator next to Theil–Sen
  * (X256) and MAD (X274): Theil–Sen survives ~29% outliers, RANSAC's
  * consensus maximization survives any contamination that leaves the
  * inlier structure the largest consistent set — the right tool when
  * a fifth of a feed is a different population (bot traffic, a
  * corrupted shard) rather than noise.
  *
  * Sampling is the X241 md5-rank discipline: the 2k lowest (md5, id)
  * points pair consecutively into k candidate lines — deterministic,
  * engine-replayable, and at corpus scale a TakeOrdered top-2k, never
  * a full sort. Scoring is one broadcast cross join of the k-row
  * candidate table against the corpus (map-side, combine-counted):
  * point (x, y) is an inlier of the line through (x1, y1)–(x2, y2)
  * iff |(y−y1)·(x2−x1) − (x−x1)·(y2−y1)| ≤ tol·|x2−x1| — the
  * y-residual test cross-multiplied into EXACT integers, no division,
  * no float. x-degenerate candidates (x1 = x2, no y = f(x) form) are
  * dropped. Winner = max consensus, ties to the smaller candidate id.
  *
  * Output: one row per surviving candidate (cand_id, x1, y1, x2, y2,
  * n_inliers, is_best) — the full consensus table, so the margin
  * between best and runner-up is auditable, not just the argmax.
  */
object Ransac {

  def lineFit(pts: DataFrame, idCol: String, xCol: String, yCol: String,
      k: Int = 32, tol: Long = 100L, salt: String = "rc"): DataFrame = {
    require(k >= 1 && tol >= 0, s"need k >= 1 (got $k), tol >= 0 (got $tol)")
    val p = pts.select(col(idCol).as("_id"),
      col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
    val ranked = p.select(col("_id"), col("_x"), col("_y"),
        conv(substring(md5(concat(lit(s"$salt|"),
          col("_id").cast("string"))), 1, 15), 16, 10).cast("long")
          .as("_h"))
      .orderBy("_h", "_id").limit(2 * k)
    // 2k rows: the single-partition window is metadata
    val rn = org.apache.spark.sql.expressions.Window.orderBy("_h", "_id")
    val cands = ranked
      .withColumn("_rn", row_number().over(rn))
      .withColumn("cand_id", expr("(_rn - 1) div 2"))
      .groupBy("cand_id")
      .agg(min(struct(col("_rn"), col("_x"), col("_y"))).as("_p1"),
        max(struct(col("_rn"), col("_x"), col("_y"))).as("_p2"))
      .select(col("cand_id"), col("_p1._x").as("x1"),
        col("_p1._y").as("y1"), col("_p2._x").as("x2"),
        col("_p2._y").as("y2"))
      .filter(col("x1") =!= col("x2"))
      .localCheckpoint(eager = true) // scored against the corpus + report
    val counts = p.crossJoin(broadcast(cands))
      .filter(abs((col("_y") - col("y1")) * (col("x2") - col("x1"))
        - (col("_x") - col("x1")) * (col("y2") - col("y1")))
        <= lit(tol) * abs(col("x2") - col("x1")))
      .groupBy("cand_id").agg(count(lit(1)).as("n_inliers"))
    val scored = cands.join(counts, Seq("cand_id"), "left")
      .select(col("cand_id"), col("x1"), col("y1"), col("x2"), col("y2"),
        coalesce(col("n_inliers"), lit(0L)).as("n_inliers"))
    val best = scored
      .agg(min(struct((-col("n_inliers")).as("ni"), col("cand_id")
        .as("ci"))).as("_b"))
    scored.crossJoin(broadcast(best))
      .select(col("cand_id"), col("x1"), col("y1"), col("x2"), col("y2"),
        col("n_inliers"),
        (col("_b.ni") === -col("n_inliers") &&
          col("_b.ci") === col("cand_id")).as("is_best"))
      .orderBy("cand_id")
  }
}
