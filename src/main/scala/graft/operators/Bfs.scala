package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop BFS (min-hop labeling) over an undirected edge list —
  * the blast-radius / transitive-exposure closure: "everything within
  * k hops of the flagged set" (recalled items through co-occurrence,
  * contaminated docs through near-dup edges, compromised hosts through
  * connections). No reference counterpart (SURVEY §2.6); north-star
  * extension surface.
  *
  * Frontier expansion is MONOTONE — the reached set only grows, and
  * once a round adds nothing every later round adds nothing — which is
  * what licenses the unrolled oracle (the k-core argument, X147):
  * maxHops unrolled rounds equal the true bounded closure whenever the
  * frontier empties in time, and surplus rounds are no-ops.
  *
  * Scale: per hop, ONE equi-join of the edge list against the CURRENT
  * frontier (not the full reached set — a node's first discovery is
  * its min hop, so re-expanding old nodes is pure waste) plus an
  * anti-join to drop already-reached nodes; per-round lineage cut with
  * localCheckpoint. Frontier size is bounded by the true neighborhood
  * growth; a hub-heavy graph fans out early and converges in few
  * rounds — the loop cost is O(hops) scans of a shrinking-relevance
  * edge list, never |V|² anything.
  */
object Bfs {

  /** `seeds`: one column `n`. Returns (n, hop) for every node within
    * `maxHops` of a seed, hop = minimum distance (seeds at 0).
    */
  def minHops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops ($maxHops) must be >= 0")
    // Symmetrize ONCE (2|E| rows, checkpointed) so each round is a
    // single equi-join instead of two directional ones — measured 6.5
    // → 4.6 s at sf0.1 on the 3-hop blast-radius query, and at scale
    // it halves the per-round probe of the dominant table.
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var reached = seeds.select(col("n"), lit(0).as("hop"))
      .distinct().localCheckpoint()
    var frontier = reached.select("n")
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val nbrs = sym.join(frontier.withColumnRenamed("n", "a"), Seq("a"))
        .select(col("b").as("n"))
        .distinct()
      frontier = nbrs.join(reached.select("n"), Seq("n"), "left_anti")
        .localCheckpoint()
      reached = reached
        .unionByName(frontier.withColumn("hop", lit(hop)))
        .localCheckpoint()
    }
    reached
  }
}
