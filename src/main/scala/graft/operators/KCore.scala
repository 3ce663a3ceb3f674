package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling — the graph-cleaning step
  * between pair detection (X3/X46) and clustering: the k-core is the
  * maximal subgraph where every node keeps degree ≥ k, the standard
  * filter for "dense duplicate clusters / co-engagement cliques worth
  * acting on" as opposed to incidental pairs. No reference counterpart
  * (SURVEY §2.6); north-star extension surface.
  *
  * Semantics: repeatedly delete nodes of degree < k (with the edges
  * they carry) until none remain. The loop is a MONOTONE fixpoint —
  * each round only removes, and once a round removes nothing the
  * subgraph is stable forever — which is what licenses the oracle: a
  * DuckDB query with R unrolled peel rounds equals the true fixpoint
  * whenever convergence takes ≤ R rounds (extra rounds are no-ops);
  * too-small an R fails the hash gate loudly.
  *
  * Scale (the CC playbook, X51): each round is one combine-style
  * degree aggregate (map-side partial, |nodes| keys) plus two
  * broadcast-or-shuffle semi-joins pruning the edge list — no windows,
  * no collects; the edge list only shrinks. Rounds are bounded by the
  * peel depth (≤ |V| pathologically, small double digits on real
  * graphs); per-round lineage is cut with localCheckpoint exactly like
  * ConnectedComponents. Output: surviving nodes with their degree
  * INSIDE the core (≥ k by construction).
  */
object KCore {

  /** Edges are undirected, (srcCol, dstCol), self-loops and duplicate
    * pairs assumed pre-removed by the caller. Returns (node, core_deg).
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxRounds: Int = 50): DataFrame = {
    val e = coreEdges(edges, srcCol, dstCol, k, maxRounds)
    e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("core_deg"))
  }

  /** The EDGE set of the k-core — the induced subgraph the peel
    * converges to. Exposed for consumers that keep working on edges
    * (KTruss pre-peels with it: truss ⊆ (k−1)-core, and the degree
    * peel is triangle-free — far cheaper than a wedge pass over
    * doomed edges). Returns (a, b) in the caller's orientation.
    */
  def coreEdges(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    var e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .localCheckpoint()
    // carry the edge count across rounds: one count action per round,
    // not a before/after pair (the fixpoint test only needs the delta)
    var prevCount = e.count()
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val deg = e.select(col("a").as("n"))
        .unionAll(e.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("n")
      val pruned = e
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint()
      val after = pruned.count()
      e = pruned
      done = after == prevCount
      prevCount = after
      rounds += 1
    }
    e
  }
}
