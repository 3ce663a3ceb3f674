package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node local clustering coefficient (Watts–Strogatz '98):
  * lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — how close each node's
  * neighborhood is to a clique. The node-level readout the triangle
  * LIST (X172) doesn't give: hub-vs-clique structure audit of a
  * co-occurrence graph, and the standard feature the link-spam /
  * community literature keys on.
  *
  * Built on [[Triangles.triangleList]]'s degree-ordered orientation
  * (O(m^1.5) wedge work regardless of skew — the Suri–Vassilvitskii
  * argument lives there): per-node triangle counts are one explode of
  * the triangle list's three corners + a combine agg; degrees one agg
  * over the canonical edge set; the join is node-keyed. lcc is a
  * single exact-integer division rendered through round6 (products
  * deg·(deg−1) and 2·tri are far inside 2⁵³). deg < 2 ⇒ lcc = 0 by
  * convention (no wedge to close).
  *
  * Output: (node, degree, n_triangles, lcc), one row per node with at
  * least one edge.
  */
object ClusteringCoefficient {

  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = Triangles.canonicalEdges(edges, srcCol, dstCol)
      .localCheckpoint(eager = true) // feeds degrees AND the triangle list
    val deg = canon.select(col("lo").as("node"))
      .unionByName(canon.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val triN = Triangles.triangleList(canon, "lo", "hi")
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(triN, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2, graft.llm.TextOps.round6(
          (coalesce(col("n_triangles"), lit(0L)) * 2).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double")))
          .otherwise(lit(0.0)).as("lcc"))
  }
}
