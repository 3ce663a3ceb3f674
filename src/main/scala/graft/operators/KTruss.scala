package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition (Cohen 2008) — the TRIANGLE-grade community
  * filter one rung above k-core: keep the maximal subgraph where
  * every edge closes ≥ k−2 triangles WITHIN the subgraph. Degree
  * survives hubs that merely touch many strangers; triangle support
  * demands witnessed common neighbors, which is why k-truss is the
  * standard "cohesive community worth acting on" cut for co-occurrence
  * graphs. No reference counterpart (SURVEY §2.6); north-star
  * extension surface.
  *
  * Fixpoint semantics exactly like k-core: delete under-supported
  * edges, recompute support on the survivors, repeat until a round
  * deletes nothing — MONOTONE (rounds only delete; a stable round is
  * stable forever), which licenses the unrolled oracle: R unrolled
  * rounds equal the fixpoint whenever convergence takes ≤ R (surplus
  * rounds are no-ops, too few fails the hash gate loudly).
  *
  * Scale: support per round is ONE wedge equi-join (a<b<c ordered
  * edges: (a,b)⋈(b,c) on the shared middle vertex) closed by a
  * left-semi probe on (a,c), then a 3-way unionAll → combine count
  * per edge — never an n² pair product; wedge fan-out is bounded
  * upstream by the capped projection feeding it (the X257
  * BipartiteProjection cap rule). The edge set only shrinks; each
  * round passes through Iterate.cut (the data-dependent-loop stats
  * rule), and the one driver action per round is the count that
  * decides the fixpoint.
  *
  * Returns the truss edges with their final within-truss support:
  * (a, b, support).
  */
object KTruss {

  /** Edges undirected, pre-deduped, and ORIENTED a < b by the caller.
    */
  def truss(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxRounds: Int = 60): DataFrame = {
    require(k >= 3, s"k ($k) must be >= 3 — below that every edge is a truss")

    def support(e: DataFrame): DataFrame = {
      val tri = e
        .join(e.select(col("a").as("b"), col("b").as("c")), "b")
        .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"),
          "left_semi")
        .select("a", "b", "c")
      tri.select(col("a"), col("b"))
        .unionAll(tri.select(col("a"), col("c").as("b")))
        .unionAll(tri.select(col("b").as("a"), col("c").as("b")))
        .groupBy("a", "b").agg(count(lit(1)).as("s"))
    }

    var e = Iterate.cut(
      edges.select(col(srcCol).as("a"), col(dstCol).as("b")))
    var prev = e.count()
    var rounds = 0
    var done = prev == 0
    while (!done) {
      rounds += 1
      if (rounds > maxRounds) throw new IllegalStateException(
        s"KTruss: no fixpoint after $maxRounds rounds ($prev edges "
          + "remain) — raise maxRounds")
      val keep = support(e).filter(col("s") >= k - 2).select("a", "b")
      val pruned = Iterate.cut(e.join(keep, Seq("a", "b"), "left_semi"))
      val after = pruned.count()
      done = after == prev || after == 0
      e = pruned
      prev = after
    }
    e.join(support(e), Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("s"), lit(0L)).as("support"))
  }
}
