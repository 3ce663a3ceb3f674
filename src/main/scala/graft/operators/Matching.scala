package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Locally-dominant greedy matching (Preis '99; Manne–Bisseling's
  * parallel formulation) — pair nodes off 1:1 along their best edges:
  * the "buddy assignment" a dedup pipeline needs when near-duplicates
  * must be ARBITRATED pairwise (keep one of each pair, diff the two,
  * route to one reviewer) rather than clustered, and the classic
  * coarsening step of multilevel graph partitioners.
  *
  * Sequential greedy matching scans edges by ascending weight and
  * takes each edge whose endpoints are both free — a provable
  * 1/2-approximation to minimum-weight maximal matching, but one edge
  * at a time. The parallel form takes, each round, every LOCALLY
  * DOMINANT edge — an edge that is the (w, lo, hi)-minimum incident
  * edge of BOTH its endpoints — simultaneously: dominant edges are
  * vertex-disjoint by definition, and the globally minimum live edge
  * is always dominant, so every round makes progress and the result
  * EQUALS the sequential greedy matching exactly (same total order).
  * Matched nodes retire with their edges; the loop ends when no edge
  * survives.
  *
  * Round shape is the Borůvka kit: per-node best edge is one
  * explode + combine-min, dominance is a count-2 group on the edge
  * identity, retirement two anti-joins. Round COUNT is data-shaped:
  * expected O(log n) on random-ish weights, Θ(n) on an adversarial
  * increasing chain (only the chain's lightest edge is dominant per
  * round) — callers bound it with `maxRounds` and the convergence
  * require names the fix. Data-dependent loop ⇒ [[Iterate.cut]].
  *
  * Output: the matched pairs (lo, hi, w) — vertex-disjoint, maximal
  * (every unmatched edge lost an endpoint to the matching).
  */
object Matching {

  def greedy(edges: DataFrame, loCol: String, hiCol: String,
      wCol: String, maxRounds: Int = 24,
      materialize: DataFrame => DataFrame = Iterate.cut): DataFrame = {
    var e = materialize(edges.select(
        least(col(loCol), col(hiCol)).as("lo"),
        greatest(col(loCol), col(hiCol)).as("hi"),
        col(wCol).cast("long").as("w"))
      .filter(col("lo") =!= col("hi"))
      .groupBy("lo", "hi").agg(min("w").as("w")))

    val parts = ArrayBuffer.empty[DataFrame]
    var round = 0
    var done = e.isEmpty
    while (!done && round < maxRounds) {
      val best = e.select(explode(array(
          struct(col("lo").as("n"), col("w"), col("lo"), col("hi")),
          struct(col("hi").as("n"), col("w"), col("lo"), col("hi"))))
          .as("i"))
        .groupBy("i.n")
        .agg(min(struct(col("i.w"), col("i.lo"), col("i.hi"))).as("b"))
      val dominant = materialize(best
        .groupBy(col("b.lo").as("lo"), col("b.hi").as("hi"),
          col("b.w").as("w"))
        .agg(count(lit(1)).as("_c"))
        .filter(col("_c") === 2)
        .select("lo", "hi", "w"))
      parts += dominant
      val matched = dominant.select(col("lo").as("n"))
        .unionByName(dominant.select(col("hi").as("n")))
      e = materialize(e
        .join(matched.select(col("n").as("lo")), Seq("lo"), "left_anti")
        .join(matched.select(col("n").as("hi")), Seq("hi"), "left_anti")
        .select("lo", "hi", "w"))
      done = e.isEmpty
      round += 1
    }
    require(done, s"greedy matching did not converge within $maxRounds " +
      "rounds — adversarial weight chains are linear-round; raise maxRounds")

    if (parts.isEmpty)
      edges.sparkSession.emptyDataFrame
        .select(lit(0L).as("lo"), lit(0L).as("hi"), lit(0L).as("w"))
        .filter(lit(false))
    else parts.reduce(_ unionByName _)
  }
}
