package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planner: given a file listing (group, file,
  * bytes), assign each input file to an output file so adjacent small
  * files coalesce toward a target size — the table-maintenance job every
  * long-lived 100 TB table needs (a petabyte table accreting 10k tiny
  * files per ingest hour dies by open() overhead and scheduler pressure
  * long before it dies by data volume).
  *
  * Binning rule: contiguous cumulative-sum packing. Files are taken in
  * their existing order within the group (preserving any clustering the
  * layout already has — compaction must not destroy a sort or z-order)
  * and file f goes to output bin `floor(cum_bytes_before(f) / target)`:
  * the bins are the `target`-wide windows of the group's cumulative
  * byte axis. Deterministic and single-pass, with the guarantee that
  * matters for compaction: a group emits at most
  * `ceil(total_bytes / target)` output files (each nonempty window is
  * one bin; a file spanning several windows only removes bins), so the
  * planned file count — the metric small-file pressure is measured by —
  * is bounded regardless of how fragmented the input listing is. An
  * individual closed bin can undershoot `target` when its predecessor's
  * straddling file ate into its window (the straddler stays in the
  * earlier bin), but the byte deficit equals that overshoot, so sizes
  * average out to `target` across the group.
  *
  * Scale design: the plan runs over file METADATA — |files| rows, not
  * corpus rows — so the window below partitions by group and orders by
  * file id over listings bounded by files-per-group (what a catalog
  * returns per partition), never over data. The corpus itself moves
  * only when the plan executes, as one narrow read-coalesce-write per
  * output bin. Cumulative sums use integer byte counts and integer
  * `div`, so the assignment is exact cross-engine for any file size.
  */
object Compaction {

  /** One row per planned output file: (group, out_file, n_inputs,
    * out_bytes, first_file, last_file).
    */
  def compactionPlan(files: DataFrame, groupCol: String, fileCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes ($targetBytes) must be > 0")
    val w = Window.partitionBy(groupCol).orderBy(fileCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("_before",
        coalesce(sum(col(bytesCol).cast("long")).over(w), lit(0L)))
      .withColumn("out_file", expr(s"_before div ${targetBytes}L"))
      .groupBy(col(groupCol), col("out_file"))
      .agg(count(lit(1)).as("n_inputs"),
        sum(col(bytesCol).cast("long")).as("out_bytes"),
        min(col(fileCol)).as("first_file"),
        max(col(fileCol)).as("last_file"))
  }
}
