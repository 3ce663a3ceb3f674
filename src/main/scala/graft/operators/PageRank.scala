package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration (Page et al. 1999; the Pregel/GraphX
  * formulation re-expressed as DataFrame joins) — the canonical
  * join-per-round graph operator: rank flows along edges, damped toward
  * a uniform base.
  *
  * Determinism: ranks are INTEGER nano-units end to end. Each round is
  * `r'(v) = (15·SCALE) div (100·N) + (85 · Σ_{u→v} r(u) div out(u)) div 100`
  * — every operation integer `div`/`+`/`×`, so partition count, merge
  * order, and engine cannot change a single unit (the X56 k-means
  * argument applied to graph propagation). Truncation loses ≤1 unit per
  * op — 10⁻⁹ of the mass, invisible at 6-dp display. Dangling nodes
  * (no out-edges) simply leak their mass, the standard simplification;
  * a total-mass audit is the caller's choice.
  *
  * Scale design (the reason this shape survives a 100 TB edge list):
  * each round is ONE equi-join of the edge table with the rank table on
  * `src` plus one partial-combine `sum` on `dst` — no windows, no
  * driver state, no adjacency lists in memory. The rank table is
  * `localCheckpoint`ed per round (the X51 CC rule: iterative lineage
  * must be truncated or round k replans rounds 1..k-1). Out-degrees are
  * computed once, outside the loop. A celebrity in-degree node skews
  * the `dst` aggregation's reduce side only as a hot GROUP — partial
  * aggregation absorbs it map-side; a celebrity SOURCE fans out through
  * the join exactly |out(u)| times, which is the work PageRank
  * fundamentally requires.
  *
  * `edges`: (src, dst) long columns, one row per directed edge.
  * `nodes`: (id) — every rankable node (isolated ones included).
  * Output: (id, rank) with rank in integer nano-units of probability.
  */
object PageRank {

  val Scale = 1000000000L

  /** PERSONALIZED PageRank (Haveliwala 2002): teleport mass returns to
    * a SEED set instead of the uniform base, so rank measures proximity
    * to the seeds — "expand relevance from these flagged docs/domains",
    * the weighted counterpart of [[Bfs.minHops]]'s hop closure (BFS
    * says WHETHER you're within k hops; PPR says HOW MUCH of the
    * seeds' influence reaches you, damped per hop).
    *
    * Same integer nano-unit arithmetic and per-round shape as [[run]]:
    * `r'(v) = (seed(v) ? 15·SCALE div (100·|S|) : 0) + (85·Σ inflow) div 100`
    * — the only change is WHERE the teleport lands. Nodes unreachable
    * from the seeds hold rank 0 forever (exact, not approximate-small).
    * The seed tag is joined once and checkpointed with the rank table,
    * so each round stays one edge⋈rank equi-join + one combine sum.
    */
  def personalized(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
      iters: Int,
      materialize: DataFrame => DataFrame = _.localCheckpoint(eager = true))
      : DataFrame = {
    require(iters >= 0, s"iters ($iters) must be >= 0")
    val nSeeds = seeds.count() // 1-value scalar, the PageRank.run precedent
    require(nSeeds > 0, "seeds must be non-empty")
    val out = edges.groupBy("src").agg(count(lit(1)).as("_out"))
    val tagged = materialize(
      nodes.join(seeds.select(col("id"), lit(1).as("_s")), Seq("id"), "left")
        .select(col("id"), coalesce(col("_s"), lit(0)).as("_is_seed")))
    val base = (Scale * 15) / (100 * nSeeds)
    var r = tagged.select(col("id"),
      when(col("_is_seed") === 1, lit(Scale / nSeeds)).otherwise(lit(0L))
        .as("rank"))
    for (_ <- 1 to iters) {
      val inflow = edges.join(out, "src")
        .join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank div _out").as("_c"))
        .groupBy("id").agg(sum("_c").as("_in"))
      r = materialize(
        tagged.join(inflow, Seq("id"), "left")
          .select(col("id"),
            (when(col("_is_seed") === 1, lit(base)).otherwise(lit(0L))
              + expr("(85 * coalesce(_in, CAST(0 AS BIGINT))) div 100"))
              .as("rank")))
    }
    r
  }

  def run(edges: DataFrame, nodes: DataFrame, iters: Int,
      materialize: DataFrame => DataFrame = _.localCheckpoint(eager = true))
      : DataFrame = {
    require(iters >= 0, s"iters ($iters) must be >= 0")
    val n = nodes.count() // the legitimate 1-value scalar (tfidf precedent)
    require(n > 0, "nodes must be non-empty")
    val out = edges.groupBy("src").agg(count(lit(1)).as("_out"))
    val base = (Scale * 15) / (100 * n)
    var r = nodes.select(col("id"), lit(Scale / n).as("rank"))
    for (_ <- 1 to iters) {
      val inflow = edges.join(out, "src")
        .join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank div _out").as("_c"))
        .groupBy("id").agg(sum("_c").as("_in"))
      r = materialize(
        nodes.join(inflow, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr("(85 * coalesce(_in, CAST(0 AS BIGINT))) div 100"))
              .as("rank")))
    }
    r
  }
}
