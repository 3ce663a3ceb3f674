package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted single-source(-set) shortest paths by synchronous
  * Bellman–Ford rounds (Bellman 1958) over an undirected weighted edge
  * list — the MIN-PLUS companion to [[Bfs.minHops]]'s hop closure:
  * BFS asks "within k hops?", this asks "how CHEAP is the cheapest
  * path?", which differs the moment edges carry costs (one strong tie
  * can beat three weak hops — the 'effective proximity' a
  * recommendation or contamination model actually wants). No reference
  * counterpart (SURVEY §2.6); north-star extension surface (X270).
  *
  * Rounds are MONOTONE (distances only decrease, min-plus is
  * idempotent), so `rounds` unrolled iterations equal the true
  * fixpoint whenever no (rounds+1)-edge path improves on a
  * ≤rounds-edge one — the X147/X152 surplus-rounds-are-no-ops
  * argument, and exactly what licenses the unrolled MATERIALIZED
  * oracle. All costs are exact integers, so there is no float
  * accumulation across relaxations.
  *
  * Scale: per round ONE equi-join of the symmetrized edge list against
  * the current distance table on the source endpoint, a unionAll, and
  * ONE min combine-agg on the node key; per-round lineage cut by
  * checkpoint (freed when the next round materializes). Unreached
  * nodes never materialize rows at all.
  */
object Sssp {

  /** `edges`: (srcCol, dstCol, costCol) with integral nonnegative
    * costs; `seeds`: one column `n`. Returns (n, dist) for every node
    * reachable within `rounds` relaxations, dist = exact integer
    * min-plus distance (seeds at 0).
    */
  def distances(edges: DataFrame, srcCol: String, dstCol: String,
      costCol: String, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds ($rounds) must be >= 0")
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"),
      col(costCol).cast("long").as("w"))
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b"),
        col("w")))
      .localCheckpoint(eager = true)
    var dist = seeds.select(col("n"), lit(0L).as("dist"))
      .distinct().localCheckpoint(eager = true)
    (1 to rounds).foreach { _ =>
      val relaxed = sym.join(dist.withColumnRenamed("n", "a"), "a")
        .select(col("b").as("n"), (col("dist") + col("w")).as("dist"))
      val prev = dist
      dist = dist.unionAll(relaxed)
        .groupBy("n").agg(min("dist").as("dist"))
        .localCheckpoint(eager = true)
      SuffixArray.freeCheckpoint(prev)
    }
    // the final dist table is materialized; the edge blocks can go
    SuffixArray.freeCheckpoint(sym)
    dist
  }
}
