package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs and authorities (Kleinberg, JACM 1999) — the directed-graph
  * companion to [[PageRank]]: PageRank scores a page by the rank that
  * FLOWS INTO it; HITS separates "points at good pages" (hub) from "is
  * pointed at by good hubs" (authority), the split that matters on
  * bipartite-ish link structures (crawl seed lists → content pages,
  * member docs → hub docs) where one number conflates the two roles.
  *
  * Determinism: scores are INTEGER micro-units end to end. Classical
  * HITS normalizes by the L2 norm — an IEEE sqrt per round, not
  * bit-stable cross-engine — so this uses the equally standard L∞
  * (divide-by-max) normalization: `a(v) = (Σ_{u→v} h(u)) · 10⁶ div
  * max_raw`, same for h from the FRESH a (the classical update order).
  * Ratios between scores are what HITS means; the norm choice only
  * fixes the scale, and integer `div` makes every round replay
  * bit-identically in any engine and under any partitioning.
  *
  * Scale shape (the [[PageRank.run]] argument): each round is two
  * {edge ⋈ score equi-join + partial-combine sum} passes plus a 1-row
  * max broadcast — no windows, no adjacency lists, no driver state
  * beyond the scalar max. Score tables are checkpointed per round (the
  * X51 rule: iterative lineage must be truncated). A celebrity
  * authority is a hot GROUP absorbed map-side by partial aggregation.
  *
  * `edges`: (src, dst) long columns, one row per directed edge.
  * `nodes`: (id) — every scorable node (isolated ones score 0).
  * Output: (id, auth_micro, hub_micro), 10⁶ = the round's max.
  */
object Hits {

  val Scale = 1000000L

  def run(edges: DataFrame, nodes: DataFrame, iters: Int,
      materialize: DataFrame => DataFrame = _.localCheckpoint(eager = true))
      : DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")

    // one normalized propagation step: raw(v) = Σ score(u) over e keyed
    // u-side, landed v-side; then ×10⁶ div max — the 1-row max rides a
    // broadcast crossJoin (the degreeAssortativity precedent)
    def step(score: DataFrame, fromCol: String, toCol: String): DataFrame = {
      val raw = edges.join(score.withColumnRenamed("id", fromCol), fromCol)
        .groupBy(col(toCol).as("id")).agg(sum("s").as("_raw"))
      val mx = raw.agg(max("_raw").as("_mx"))
      materialize(
        nodes.join(raw, Seq("id"), "left").crossJoin(broadcast(mx))
          .select(col("id"),
            expr(s"(coalesce(_raw, CAST(0 AS BIGINT)) * ${Scale}) div _mx")
              .as("s")))
    }

    var hub = nodes.select(col("id"), lit(Scale).as("s"))
    var auth = hub
    for (_ <- 1 to iters) {
      auth = step(hub, "src", "dst")   // a ← h of in-neighbors
      hub = step(auth, "dst", "src")   // h ← FRESH a of out-neighbors
    }
    nodes
      .join(auth.select(col("id"), col("s").as("auth_micro")), Seq("id"), "left")
      .join(hub.select(col("id"), col("s").as("hub_micro")), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("auth_micro"), lit(0L)).as("auth_micro"),
        coalesce(col("hub_micro"), lit(0L)).as("hub_micro"))
  }
}
