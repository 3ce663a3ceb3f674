package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Optimal 1-D k-class binning by dynamic programming — Jenks natural
  * breaks / exact 1-D k-means (Fisher '58; Wang & Song's
  * Ckmeans.1d.dp) — the PROVABLY-optimal upgrade to the equi-depth
  * histogram (X217) when the bins feed decisions: quality tiers,
  * curriculum buckets, alerting bands. Equi-depth splits mass evenly
  * regardless of structure; Jenks places the k−1 breaks to minimize
  * total within-class SSE, so a multi-modal score distribution gets
  * one class per mode.
  *
  * Everything runs on the VALUE-DOMAIN HISTOGRAM (the X218 argument):
  * one corpus pass to (value, count); prefix sums, the O(k·B²) DP
  * transition table (one triangular join per layer, argmin by combine
  * min), and the k−1 backtrack steps (single-row joins, never a
  * collect) are all metadata-sized. Segment cost uses the
  * weighted-SSE identity SSE·n = n·Σcv² − (Σcv)², exact in
  * decimal(38,0) and micro-floored ONCE per segment, so the DP
  * compares integers both engines quantize identically — the chosen
  * breaks are deterministic cross-engine, optimal up to the micro
  * quantization (the p_changepoint discipline). Ties break to the
  * smaller break index.
  *
  * Output: one row per class m = 1..k — (class, v_lo, v_hi, n,
  * mean_micro, sse_micro); empty if the domain has fewer than k
  * distinct values.
  */
object Jenks {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  def breaks(scores: DataFrame, vCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 6, s"k ($k) must be in [2, 6]")
    val w = Window.orderBy("v")
    val pre = scores.select(col(vCol).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
      .select(col("v"), row_number().over(w).as("i"),
        sum("c").over(w).as("pn"),
        sum(dec(col("c")) * col("v")).over(w).as("ps"),
        sum(dec(col("c")) * col("v") * col("v")).over(w).as("ps2"))
      .localCheckpoint(eager = true) // seg pairs, bounds, value lookups
    val pre0 = pre
      .select((col("i") + 1).as("ii"), col("pn").as("n0"),
        col("ps").as("s0"), col("ps2").as("s20"))
      .unionByName(pre.filter(col("i") === 1)
        .select(lit(1).as("ii"), lit(0L).as("n0"),
          dec(lit(0)).as("s0"), dec(lit(0)).as("s20")))
    val seg = pre
      .select(col("i").as("jj"), col("pn"), col("ps"), col("ps2"))
      .crossJoin(pre0)
      .filter(col("ii") <= col("jj"))
      .select(col("ii"), col("jj"),
        (col("pn") - col("n0")).as("n"),
        (col("ps") - col("s0")).as("s"),
        (col("ps2") - col("s20")).as("s2"))
      .select(col("ii"), col("jj"), col("n"), col("s"),
        TextOps.floorDivDec(
          (dec(col("n")) * col("s2") - col("s") * col("s")) * lit(1000000L),
          dec(col("n"))).cast("long").as("sse"))
      .localCheckpoint(eager = true) // k DP layers + final class stats

    // DP layers: d_m(j) = min over ii of d_{m-1}(ii-1) + sse(ii..jj),
    // bi = the argmin segment start (ties to the smaller ii)
    val layers = ArrayBuffer.empty[DataFrame]
    layers += seg.filter(col("ii") === 1)
      .select(col("jj").as("j"), col("sse").as("d"), lit(1).as("bi"))
      .localCheckpoint(eager = true)
    for (m <- 2 to k) {
      layers += seg.filter(col("ii") >= m)
        .join(layers.last.select((col("j") + 1).as("ii"),
          col("d").as("dp")), "ii")
        .groupBy(col("jj").as("j"))
        .agg(min(struct((col("dp") + col("sse")).as("d"),
          col("ii").as("bi"))).as("m"))
        .select(col("j"), col("m.d").as("d"), col("m.bi").as("bi"))
        .localCheckpoint(eager = true)
    }

    // backtrack: class k ends at B; class m-1 ends where class m starts
    val bounds = ArrayBuffer.empty[DataFrame]
    var end = pre.agg(max("i").as("j"))
    for (m <- k to 1 by -1) {
      val row = layers(m - 1).join(broadcast(end), "j")
        .select(lit(m).as("class"), col("bi").as("ii"), col("j").as("jj"))
        .localCheckpoint(eager = true) // 1 row: next step + report
      bounds += row
      end = row.select((col("ii") - 1).as("j"))
    }
    bounds.reduce(_ unionByName _)
      .join(seg, Seq("ii", "jj"))
      .join(pre.select(col("i").as("ii"), col("v").as("v_lo")), "ii")
      .join(pre.select(col("i").as("jj"), col("v").as("v_hi")), "jj")
      .select(col("class"), col("v_lo"), col("v_hi"), col("n"),
        TextOps.floorDivDec(col("s") * lit(1000000L), dec(col("n")))
          .cast("long").as("mean_micro"),
        col("sse").as("sse_micro"))
      .orderBy("class")
  }
}
