package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration by degree-ordered orientation
  * (Suri & Vassilvitskii WWW'11, public literature) — the graph
  * statistic behind community detection and link-spam scoring of a
  * crawl graph.
  *
  * Why not the naive three-way self-join: its wedge step fans out as
  * Σ deg(v)² on the middle vertex — one celebrity node in a crawl graph
  * (deg 10⁷) alone generates 10¹⁴ candidates ("the curse of the last
  * reducer"). Degree-ordered orientation fixes the asymptotics, not
  * just the constant: orient every undirected edge from its
  * (degree, id)-smaller endpoint to the larger; the result is acyclic
  * and every vertex's OUT-degree is O(√m), so wedge generation — a
  * self-join of the directed edges on the apex — is Σ outdeg(v)² =
  * O(m^1.5) total, the optimal bound, regardless of how skewed the
  * original degrees are. Each triangle then has exactly ONE apex (its
  * order-minimal vertex), so closing wedges against the undirected
  * edge set counts every triangle exactly once — no /3 correction, no
  * dedup shuffle.
  *
  * Every step is an equi-join or partial-combine aggregation: degree
  * count (combine agg), orientation (join edges×degrees twice, both
  * sides hash-partitioned on a vertex), wedge self-join (equi-join on
  * apex), closing check (equi-join on the canonical (lo, hi) pair).
  * Ties in the order are broken by vertex id, so the orientation — and
  * with it the result — is deterministic in any engine.
  */
object Triangles {

  /** Canonical undirected edge set: (lo, hi) with lo < hi, self-loops
    * dropped, parallel edges collapsed.
    */
  def canonicalEdges(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") < col("hi"))
      .distinct()

  /** One row per triangle: (a, b, c) = the triangle's vertices sorted
    * by id ascending — a total output order any engine reproduces.
    */
  def triangleList(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = canonicalEdges(edges, srcCol, dstCol)
    val deg = canon.select(col("lo").as("v"))
      .union(canon.select(col("hi").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient lo→hi in (degree, id) order: u precedes w iff
    // (d_u, u) < (d_w, w)
    val directed = canon
      .join(deg.select(col("v").as("lo"), col("d").as("_dl")), "lo")
      .join(deg.select(col("v").as("hi"), col("d").as("_dh")), "hi")
      .select(
        when(col("_dl") < col("_dh")
            || (col("_dl") === col("_dh") && col("lo") < col("hi")),
          struct(col("lo").as("u"), col("hi").as("w")))
          .otherwise(struct(col("hi").as("u"), col("lo").as("w")))
          .as("_e"))
      .select(col("_e.u").as("u"), col("_e.w").as("w"))
    // wedges at each apex u: every ordered pair of its out-neighbors
    val wedges = directed.as("x")
      .join(directed.as("y"), col("x.u") === col("y.u"))
      .filter(col("x.w") < col("y.w"))
      .select(col("x.u").as("apex"),
        col("x.w").as("_v1"), col("y.w").as("_v2"))
    // a wedge closes iff its two far endpoints are an edge (canonical
    // form — _v1 < _v2 already holds by the filter above)
    wedges
      .join(canon, col("_v1") === col("lo") && col("_v2") === col("hi"))
      .select(array_sort(array(col("apex"), col("_v1"), col("_v2"))).as("_t"))
      .select(col("_t").getItem(0).as("a"), col("_t").getItem(1).as("b"),
        col("_t").getItem(2).as("c"))
  }
}
