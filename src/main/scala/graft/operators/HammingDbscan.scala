package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Density-based near-dup clustering in SimHash space (X281; Ester et
  * al. KDD'96 DBSCAN, over the Manku WWW'07 pigeonhole candidate
  * machinery) — the fix for connected-component dup-grouping's known
  * failure mode: CC chains through SPARSE BRIDGES, so one borderline
  * pair welds two unrelated big clusters into a single "dup group"
  * and the keep-one policy deletes half a topic. DBSCAN's density
  * requirement demotes low-degree bridge points to border/noise:
  * clusters only extend through CORE points (≥ minPts−1 neighbors
  * within the radius), so a one-off bridge can belong to a cluster
  * but never merge two.
  *
  * Exact semantics (no sampling, no approximation):
  *  - neighbors: ALL pairs within `maxHamming` — the pigeonhole
  *    equi-join ([[TextOps.hammingNearDupPairs]]) is provably
  *    lossless for k < chunks, so this IS exact DBSCAN, not an LSH
  *    approximation of it;
  *  - core: |N(p) ∪ {p}| ≥ minPts (the textbook count includes the
  *    point itself);
  *  - cluster id: smallest doc id in the core-subgraph component
  *    (alternating-star CC); an isolated core is its own singleton
  *    cluster;
  *  - border: non-core with ≥ 1 core neighbor, assigned the SMALLEST
  *    core-neighbor cluster id (the textbook "arbitrary" choice made
  *    deterministic);
  *  - noise: everything else (cluster_id null).
  *
  * Scale: candidates are the chunk-collision equi-join (corpus-
  * duplication-bounded, the same argument as the MinHash bands); the
  * degree count, the core filter, the CC loop (|core dup docs|-
  * bounded), and the border argmin are all combine-aggs or
  * equi-joins. No all-pairs anywhere; at 100 TB the cost is the
  * candidate join.
  */
object HammingDbscan {

  def cluster(hashed: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, minPts: Int, chunks: Int = 4, bits: Int = 60)
      : DataFrame = {
    require(minPts >= 2, s"minPts ($minPts) must be >= 2")
    // pinned: the pigeonhole candidate join feeds sym (twice via the
    // union), coreEdges, and through sym the degree count and the
    // border argmin — unmaterialized, the 4-chunk collision join
    // re-executes per consumer (measured 9.5 s -> the recheck below)
    val pairs = TextOps.hammingNearDupPairs(hashed, idCol, hashCol,
        maxHamming, chunks, bits)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val sym = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("doc", "nbr")
    val deg = sym.groupBy("doc").agg(count(lit(1)).as("n_neighbors"))
    val core = deg.filter(col("n_neighbors") >= (minPts - 1).toLong)
      .select("doc")
    val coreEdges = pairs
      .join(core.select(col("doc").as("doc_a")), "doc_a")
      .join(core.select(col("doc").as("doc_b")), "doc_b")
    val groups = ConnectedComponents.dupGroups(coreEdges, "doc_a", "doc_b")
      .select(col("doc_id").as("doc"), col("group_id"))
    // pinned: referenced by the border argmin AND the final join —
    // without this the whole CC fixpoint above runs twice
    val coreClusters = core.join(groups, Seq("doc"), "left")
      .select(col("doc"), coalesce(col("group_id"), col("doc"))
        .as("cluster_id"), lit(true).as("_is_core"))
      .localCheckpoint(true)
    val borderClusters = sym
      .join(coreClusters.select(col("doc").as("nbr"),
        col("cluster_id").as("_bc")), "nbr")
      .groupBy("doc").agg(min("_bc").as("_b_cluster"))
    hashed.select(col(idCol).as("doc"))
      .join(deg, Seq("doc"), "left")
      .join(coreClusters, Seq("doc"), "left")
      .join(borderClusters, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        when(col("_is_core"), "core")
          .when(col("_b_cluster").isNotNull, "border")
          .otherwise("noise").as("role"),
        when(col("_is_core"), col("cluster_id"))
          .otherwise(col("_b_cluster")).as("cluster_id"))
      .orderBy(idCol)
  }
}
