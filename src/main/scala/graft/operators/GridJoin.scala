package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed L2 proximity self-join over integer coordinates — the
  * spatial/metric analog of the LSH bucket joins: all pairs within
  * `maxDist`, found without the n² cross product.
  *
  * Standard cell trick: with cell side = maxDist, any qualifying pair's
  * cells differ by ≤ 1 per axis, so candidates are an EQUI-join of each
  * point's home cell against the other side exploded to its 3×3 cell
  * neighborhood. Each unordered pair is generated exactly TWICE (a-home
  * vs b-probe and b-home vs a-probe) and the `id < id_b` cut keeps
  * exactly one — no distinct pass, because a probe's 9 cells are
  * distinct and the home side has one cell, so a given (a,b) cannot
  * match two cell keys.
  *
  * Exactness: coordinates are integers (micro/milli-units upstream);
  * the distance test is exact integer dist² ≤ maxDist² — no sqrt, no
  * float, no engine divergence. `shift` biases coordinates positive so
  * `div` flooring never straddles zero (integer div truncates toward
  * zero, which would fold cells −1 and 0 together at the origin).
  *
  * Scale: shuffle keys are grid cells — fan-out is 9× the POINT count
  * (map-side explode, combine-free equi-join), candidate work is
  * Σ|cell|·|neighbor cells|, bounded by local density, never n². Dense
  * hotspot cells are the skew knob: shrink maxDist or pre-salt the
  * heavy cells (the X23 playbook) if one cell holds a whale cluster.
  */
object GridJoin {

  /** Two-sided probe: all pairs (probe point, base point) within
    * `maxDist`, as canonical (id_a < id_b, dist2) rows — the
    * INCREMENTAL form of [[proximityJoin]]: a batch of new points
    * probes the existing grid without regenerating base×base pairs,
    * so per-batch cost is |batch|·9 cells exploded + one equi-join
    * (the X191 probe-vs-index discipline). Probe points present in
    * `base` never pair with themselves; probe-probe pairs (both
    * endpoints in the batch) are found twice and collapsed by the
    * canonical distinct.
    */
  def proximityProbe(probe: DataFrame, base: DataFrame, idCol: String,
      xCol: String, yCol: String, maxDist: Long,
      shift: Long = 1L << 20): DataFrame = {
    require(maxDist > 0, s"maxDist ($maxDist) must be > 0")
    val d = maxDist
    def pts(df: DataFrame) = df.select(col(idCol).as("id"),
        (col(xCol).cast("long") + shift).as("x"),
        (col(yCol).cast("long") + shift).as("y"))
      .withColumn("cx", expr(s"x div $d"))
      .withColumn("cy", expr(s"y div $d"))
    val offs = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val probed = pts(probe)
      .withColumn("_o", explode(array(offs: _*)))
      .select(col("id").as("id_p"), col("x").as("xp"), col("y").as("yp"),
        (col("cx") + col("_o.dx")).as("cx"),
        (col("cy") + col("_o.dy")).as("cy"))
    pts(base).join(probed, Seq("cx", "cy"))
      .filter(col("id") =!= col("id_p"))
      .withColumn("dist2", (col("x") - col("xp")) * (col("x") - col("xp"))
        + (col("y") - col("yp")) * (col("y") - col("yp")))
      .filter(col("dist2") <= lit(d * d))
      .select(least(col("id"), col("id_p")).as("id_a"),
        greatest(col("id"), col("id_p")).as("id_b"), col("dist2"))
      .distinct()
  }

  def proximityJoin(df: DataFrame, idCol: String, xCol: String,
      yCol: String, maxDist: Long, shift: Long = 1L << 20): DataFrame = {
    require(maxDist > 0, s"maxDist ($maxDist) must be > 0")
    val d = maxDist
    val pts = df.select(col(idCol).as("id"),
        (col(xCol).cast("long") + shift).as("x"),
        (col(yCol).cast("long") + shift).as("y"))
      .withColumn("cx", expr(s"x div $d"))
      .withColumn("cy", expr(s"y div $d"))
    val offs = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val probe = pts
      .withColumn("_o", explode(array(offs: _*)))
      .select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
        (col("cx") + col("_o.dx")).as("cx"),
        (col("cy") + col("_o.dy")).as("cy"))
    pts.join(probe, Seq("cx", "cy"))
      .filter(col("id") < col("id_b"))
      .withColumn("dist2", (col("x") - col("xb")) * (col("x") - col("xb"))
        + (col("y") - col("yb")) * (col("y") - col("yb")))
      .filter(col("dist2") <= lit(d * d))
      .select(col("id").as("id_a"), col("id_b"), col("dist2"))
  }
}
