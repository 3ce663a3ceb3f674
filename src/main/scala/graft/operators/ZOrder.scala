package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout + min/max skipping index — the
  * clustering trick behind multi-dimensional file pruning (Delta/Iceberg
  * OPTIMIZE ZORDER, public literature: Morton 1966): interleaving the
  * bits of two query dimensions makes files cover compact RECTANGLES of
  * (x, y) space, so a box predicate touches few files, where a
  * one-dimensional or ingestion-order layout smears every file across
  * the full range of the second dimension and nothing can be skipped.
  *
  * At 100 TB the skipping index IS the query planner's first join:
  * per-file min/max footers are metadata-scale (|files| rows), and a
  * predicate that prunes 15 of 16 files saves 94% of the scan before a
  * single row is read. This operator computes both halves: the z-value
  * assignment (a pure bit-arithmetic projection — codegen'd, exact in
  * any engine) and the per-file stats table a scan would consult.
  *
  * File assignment here is `z div span` — direct z-range bucketing, NO
  * global sort: at scale the write path is `repartitionByRange` on the
  * z-value (a sampled range exchange, not a single-partition sort); the
  * bucket spelling keeps the demo deterministic and proves the locality
  * property itself, which is a property of the KEY, not of how rows
  * reach files.
  */
object ZOrder {

  /** Morton-interleave two non-negative int columns at `bits` bits each:
    * x occupies even bit positions, y odd. Pure integer shifts/masks —
    * bit-identical cross-engine for any input in [0, 2^bits).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits ($bits) must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    }
    terms.reduce(_ + _).cast("long")
  }

  /** Per-file skipping index over an assigned layout: one row per
    * (layout, file) with row count, the min/max footer stats for both
    * dimensions, and whether a scan for the given box predicate
    * [x0,x1]×[y0,y1] must read the file (its bounding box intersects
    * the query box). Metadata-scale aggregation: |files| groups.
    */
  def skippingIndex(df: DataFrame, layoutCol: String, fileCol: String,
      xCol: String, yCol: String,
      x0: Int, x1: Int, y0: Int, y1: Int): DataFrame =
    df.groupBy(col(layoutCol).as("layout"), col(fileCol).as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(xCol).as("min_x"), max(xCol).as("max_x"),
        min(yCol).as("min_y"), max(yCol).as("max_y"))
      .withColumn("scan_needed",
        col("min_x") <= x1 && col("max_x") >= x0 &&
          col("min_y") <= y1 && col("max_y") >= y0)
}
