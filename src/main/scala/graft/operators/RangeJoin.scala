package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join.
  *
  * The naive plan for `points JOIN intervals ON p BETWEEN lo AND hi` is
  * a broadcast-nested-loop (or worse, a cartesian) — every point tests
  * every interval. This implementation grids the domain: each interval
  * explodes onto the fixed-width buckets it overlaps, each point maps to
  * exactly one bucket, and the join becomes a plain EQUI-join on the
  * bucket id followed by the exact range predicate. Work scales with
  * |points| + Σ interval-width/bucket-width instead of |points| ×
  * |intervals|.
  *
  * Pick `bucketWidth` near the typical interval width: much smaller
  * multiplies the interval replication; much larger multiplies the
  * per-bucket candidate fan-in.
  */
object RangeJoin {

  /** @param points rows with numeric column `pCol` (cast to long)
    * @param intervals rows with inclusive-exclusive [loCol, hiCol) longs
    * @param bucketWidth grid width in the same units
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val loB = floor(col(loCol) / bucketWidth).cast("long")
    // hi is exclusive: an interval touching a bucket boundary exactly
    // does not occupy the next bucket
    val hiB = floor((col(hiCol) - 1) / bucketWidth).cast("long")
    val gridded = intervals
      .withColumn("_bucket", explode(sequence(loB, hiB)))
    val bucketed = points
      .withColumn("_bucket", floor(col(pCol) / bucketWidth).cast("long"))
    bucketed
      .join(gridded, Seq("_bucket"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("_bucket")
  }
}
