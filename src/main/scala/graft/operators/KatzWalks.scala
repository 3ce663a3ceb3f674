package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Truncated walk counting for Katz centrality (Katz 1953): c_k = A·c_{k−1}
  * with c_0 = 1 — c_k(v) is the number of length-k walks ending at v.
  * Each round is ONE adjacency equi-join + combine sum; the round count
  * is statically bounded (the caller picks the truncation depth and an
  * attenuation below 1/max-degree so dropped tails are negligible), so
  * plain localCheckpoint per round is loop-safe.
  *
  * Input: symmetric adjacency (v, u). Output: (n, k, c) for k in
  * [1, rounds] — every vertex of the adjacency appears in every round
  * (degree ≥ 1 by construction of an edge list).
  */
object KatzWalks {

  def walkCounts(und: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val adj = und.select(col("v").as("_kv"), col("u").as("_ku"))
    val nodes = adj.select(col("_kv").as("n")).distinct()
    var c = nodes.select(col("n"), lit(1L).as("c"))
    val out = Seq.newBuilder[DataFrame]
    for (k <- 1 to rounds) {
      c = adj
        .join(c.withColumnRenamed("n", "_ku").withColumnRenamed("c", "cu"),
          Seq("_ku"))
        .groupBy(col("_kv").as("n")).agg(sum("cu").as("c"))
        .localCheckpoint(true)
      out += c.select(col("n"), lit(k).as("k"), col("c"))
    }
    out.result().reduce(_ unionAll _)
  }
}
