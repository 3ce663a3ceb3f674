package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact bounded-radius multi-source BFS — the (seed, node, distance)
  * ball table of a bounded seed panel, the shared traversal under the
  * panel-local graph readouts (X395 harmonic centrality; the walks
  * ball restriction uses the same expansion shape inline).
  *
  * Level-synchronous: each round joins the current frontier with the
  * adjacency and anti-joins the per-seed visited set, so a node enters
  * at its TRUE BFS distance exactly once per seed. All frames are
  * panel × ball sized — corpus-shaped data appears only as the probed
  * adjacency (which callers checkpoint). Rounds are statically bounded
  * (`maxDepth`), so plain localCheckpoint per level is loop-safe (the
  * Iterate.cut rule is for data-dependent round counts).
  *
  * Input: `und` symmetric adjacency (u, v); `seeds` one column `u`.
  * Output: (seed, node, d) with d in [0, maxDepth], including the
  * seed itself at d = 0.
  */
object BoundedBfs {

  def balls(und: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth ($maxDepth) must be >= 1")
    // Rename the adjacency columns up front: callers usually derive
    // `seeds` FROM `und` (the panel filter), and a frontier sharing
    // und's lineage makes `und("u")` ambiguous in the self-join.
    val adj = und.select(col("u").as("_bu"), col("v").as("_bv"))
    var visited = seeds.select(col("u").as("seed"), col("u").as("node"),
      lit(0).as("d"))
    var frontier = visited
    for (t <- 1 to maxDepth) {
      val nxt = frontier.join(adj, col("node") === col("_bu"))
        .select(col("seed"), col("_bv").as("node")).distinct()
        .join(visited, Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(t).as("d"))
        .localCheckpoint(true)
      visited = visited.unionAll(nxt).localCheckpoint(true)
      frontier = nxt
    }
    visited
  }
}
