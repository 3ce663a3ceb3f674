package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED edge list by iterative
  * forward–backward coloring (the Orzan coloring step of FB-SCC;
  * Fleischer/Hendrickson/Pınar's divide-and-conquer made dataflow-
  * parallel) — the directed closure the graph family still lacked:
  * [[ConnectedComponents]] answers "touching at all" on the
  * UNDIRECTED view, which conflates a citation loop with a one-way
  * chain; SCC separates genuine cycles (mutual reachability — link
  * rings, mutual-reference clusters, retry loops in event graphs)
  * from mere reachability.
  *
  * One outer round over the unassigned subgraph:
  *  1. forward-min to fixpoint: F(v) = min{u : u →* v} via the exact
  *     per-round shape of [[ConnectedComponents.labelPropagation]]
  *     (edge⋈label equi-join + partial-combine min; label flows WITH
  *     edge direction only);
  *  2. roots r (F(r) = r) seed a BACKWARD flag restricted to edges
  *     whose endpoints share a color (F equal): v is flagged iff it
  *     reaches its color's root in-class. The classical lemma makes
  *     the combination exact — v ∈ SCC(r) ⟺ F(v) = r ∧ v →* r, and
  *     every such witness path stays inside color r (any vertex on it
  *     is itself mutually reachable with r);
  *  3. flagged nodes are assigned scc = F(v) and removed; the rest
  *     iterate (each round settles every color's root SCC, so rounds
  *     = the graph's "SCC peel depth", small for link-shaped graphs;
  *     `maxOuter` bounds it loudly).
  *
  * Every step is equi-joins + combine aggregations over (id, label)
  * rows — no adjacency lists, no driver graph state; per-round
  * results are checkpointed (the X51 iterative-lineage rule) and
  * convergence probes are `limit(1)` scans, not counts. Labels are
  * min node ids — no ties, no floats — so the fixpoint is engine-
  * independent and the DuckDB oracle recomputes it from the mutual-
  * reachability closure directly.
  *
  * Output: (id, scc) for every node, scc = min id of the component.
  */
object Scc {

  def components(edges: DataFrame, nodes: DataFrame,
      maxOuter: Int = 10, maxInner: Int = 50,
      materialize: DataFrame => DataFrame = Iterate.cut)
      : DataFrame = {

    def fixpointMin(e: DataFrame, init: DataFrame): DataFrame = {
      var f = init
      var iter = 0
      var done = f.isEmpty
      while (!done && iter < maxInner) {
        val inc = e.join(f.select(col("id").as("src"), col("f").as("_fs")),
            "src")
          .groupBy(col("dst").as("id")).agg(min("_fs").as("_fin"))
        val stepped = materialize(
          f.join(inc, Seq("id"), "left").select(col("id"),
            col("f").as("_old"),
            least(col("f"), coalesce(col("_fin"), col("f"))).as("f")))
        done = stepped.filter(col("f") < col("_old")).limit(1).isEmpty
        f = stepped.select("id", "f")
        iter += 1
      }
      require(done, s"forward-min did not converge within $maxInner rounds")
      f
    }

    var remaining = materialize(nodes.select(col("id")))
    var result: Option[DataFrame] = None
    var outer = 0
    while (!remaining.isEmpty && outer < maxOuter) {
      val e = materialize(edges
        .join(remaining.withColumnRenamed("id", "src"), "src")
        .join(remaining.withColumnRenamed("id", "dst"), "dst")
        .select("src", "dst"))
      val f = materialize(
        fixpointMin(e, materialize(remaining.select(col("id"),
          col("id").as("f")))))
      // in-class edges: both endpoints share a forward-min color
      val ec = materialize(e
        .join(f.select(col("id").as("src"), col("f").as("_fa")), "src")
        .join(f.select(col("id").as("dst"), col("f").as("_fb")), "dst")
        .filter(col("_fa") === col("_fb"))
        .select("src", "dst"))
      // backward flag from each color's root along in-class edges
      var flag = materialize(
        f.filter(col("f") === col("id")).select("id"))
      var innerDone = false
      var inner = 0
      while (!innerDone && inner < maxInner) {
        val grown = materialize(flag.unionByName(
            ec.join(flag.withColumnRenamed("id", "dst"), "dst")
              .select(col("src").as("id")))
          .distinct())
        innerDone = grown.join(flag, Seq("id"), "left_anti")
          .limit(1).isEmpty
        flag = grown
        inner += 1
      }
      require(innerDone, s"backward flag did not converge within $maxInner")
      val assigned = materialize(
        flag.join(f, "id").select(col("id"), col("f").as("scc")))
      result = Some(result.fold(assigned)(r =>
        materialize(r.unionByName(assigned))))
      remaining = materialize(
        remaining.join(assigned.select("id"), Seq("id"), "left_anti"))
      outer += 1
    }
    require(remaining.isEmpty,
      s"SCC peel did not finish within $maxOuter outer rounds")
    result.getOrElse(nodes.select(col("id"), col("id").as("scc")))
  }

  /** Condensation of the graph under an SCC assignment: the DAG of
    * components plus each component's LONGEST-PATH level — the
    * "dependency depth" readout (build stages, citation strata,
    * crawl-frontier generations) that only exists once cycles are
    * collapsed; on the raw graph longest-path is undefined.
    *
    * Levels by iterative max propagation — level'(t) = max(level(t),
    * max_{s→t} level(s) + 1) to fixpoint, rounds = DAG depth — the
    * [[components]] loop shape with max instead of min, exact
    * integers, per-round checkpoints, limit(1) probes. The condensed
    * edge list is one distinct over the node edges joined to the
    * assignment twice.
    *
    * Output: (scc, n_nodes, level), level 0 = source components.
    */
  def condensationLevels(edges: DataFrame, assignment: DataFrame,
      maxIter: Int = 50,
      materialize: DataFrame => DataFrame = Iterate.cut)
      : DataFrame = {
    val ce = materialize(edges
      .join(assignment.select(col("id").as("src"), col("scc").as("_sa")),
        "src")
      .join(assignment.select(col("id").as("dst"), col("scc").as("_sb")),
        "dst")
      .filter(col("_sa") =!= col("_sb"))
      .select(col("_sa").as("s"), col("_sb").as("t"))
      .distinct())
    val sizes = assignment.groupBy("scc").agg(count(lit(1)).as("n_nodes"))
    var lvl = materialize(sizes.select(col("scc"), lit(0L).as("lvl")))
    var iter = 0
    var done = lvl.isEmpty
    while (!done && iter < maxIter) {
      val inc = ce.join(lvl.select(col("scc").as("s"), col("lvl")
          .as("_ls")), "s")
        .groupBy(col("t").as("scc")).agg(max(col("_ls") + 1).as("_lin"))
      val stepped = materialize(
        lvl.join(inc, Seq("scc"), "left").select(col("scc"),
          col("lvl").as("_old"),
          greatest(col("lvl"), coalesce(col("_lin"), col("lvl")))
            .as("lvl")))
      done = stepped.filter(col("lvl") > col("_old")).limit(1).isEmpty
      lvl = stepped.select("scc", "lvl")
      iter += 1
    }
    require(done, s"condensation levels did not converge within $maxIter " +
      "rounds — the assignment is not acyclic (not a valid SCC partition)")
    sizes.join(lvl, "scc")
      .select(col("scc"), col("n_nodes"), col("lvl").as("level"))
      .orderBy("scc")
  }
}
