package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection over a weighted undirected graph, the cheap first-pass
  * community structure a curation run reads over co-occurrence graphs
  * (co-ordered items, co-engaged users) where connected components
  * (X51) are too coarse: CC merges everything reachable; LPA splits a
  * component along its weighted density structure.
  *
  * Determinism discipline: SYNCHRONOUS rounds (every node updates from
  * the same previous-round labels — asynchronous LPA is
  * execution-order-dependent and can never hash-match an oracle), a
  * FIXED round count, and a total tie order: each node adopts the label
  * with the max incident-WEIGHT vote, ties broken toward the SMALLEST
  * label. The argmax is `max(struct(vote_weight, -label))` — a
  * combine-friendly aggregate (partial max runs map-side), not a window
  * sort, so each round costs exactly two exchanges: (node, label) vote
  * sum, then (node) argmax. Labels start as node ids; synchronous LPA
  * on near-bipartite regions can oscillate, which a fixed round count
  * reports honestly (round r is a pure function of the graph).
  *
  * Scale shape: per round, work is O(|edges|) vote rows with map-side
  * combine; the label table is O(|nodes|); nothing quadratic, nothing
  * driver-side. The symmetric edge table is materialized once and
  * reused by every round.
  */
object LabelPropagation {

  /** @param edges undirected weighted edges (aCol, bCol, wCol), each
    *              pair listed once
    * @return (node, label) after `rounds` synchronous rounds
    */
  def communities(edges: DataFrame, aCol: String, bCol: String,
      wCol: String, rounds: Int,
      materialize: DataFrame => DataFrame = _.localCheckpoint(eager = true))
      : DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val sym = materialize(
      edges.select(col(aCol).as("n"), col(bCol).as("m"), col(wCol).as("w"))
        .unionAll(
          edges.select(col(bCol).as("n"), col(aCol).as("m"), col(wCol).as("w"))))
    var labels = materialize(
      sym.select(col("n")).distinct().select(col("n"), col("n").as("lbl")))
    (1 to rounds).foreach { _ =>
      labels = materialize(
        sym.join(labels.withColumnRenamed("n", "m"), "m")
          .groupBy("n", "lbl").agg(sum("w").as("vw"))
          .groupBy("n")
          .agg(max(struct(col("vw"), (-col("lbl")).as("neg"))).as("best"))
          .select(col("n"), (-col("best.neg")).as("lbl")))
    }
    labels
  }
}
