package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source truth discovery by one trust-reweighted voting round
  * (the data-fusion core of Yin, Han & Yu's TruthFinder, TKDE 2008,
  * and Dong, Berti-Équille & Srivastava, VLDB 2009) — when several
  * crawls/feeds claim conflicting values for the same entity, the
  * curation pipeline needs (a) a consensus value per entity and (b) a
  * reliability weight per source, and the two are circular: trust a
  * source more when it agrees with the consensus, trust a value more
  * when trusted sources claim it. The classic solvers iterate to a
  * fixed point; ONE reweighted round already captures the shape (and
  * keeps the DuckDB replay a straight CTE chain): round 1 takes an
  * unweighted majority per entity, trust = how many of a source's
  * claims match that consensus, round 2 re-draws the consensus with
  * trust-weighted votes.
  *
  * Why this beats naive majority: an entity claimed by only two
  * sources (or where low-quality sources conspire) is a coin flip
  * under counting, but round 2 breaks it toward the source that was
  * right everywhere else — the spec plants exactly that flip.
  *
  * Determinism: both consensus draws break ties by the lexicographic
  * (weight DESC, value ASC) total order via one combine-min over
  * struct((-w, val)) — no window, no sort of the claim set; the
  * oracle's row_number replay lands on the identical winner.
  *
  * Scale shape: claims is (sources × entities) rows; every join is an
  * equi-join on entity against an entity-sized consensus table or a
  * broadcast of the source-count-sized trust table; the aggregations
  * are map-side-combinable. Nothing is quadratic in sources or
  * entities, no driver-side collection at all.
  */
object TruthVote {

  /** Majority value per entity from weighted votes(entity, val, w):
    * max total weight, ties to the smallest value. */
  private def consensus(votes: DataFrame, out: String): DataFrame =
    votes
      .groupBy("entity")
      .agg(min(struct((-col("w")).as("nw"), col("val").as("v"))).as("b"))
      .select(col("entity"), col("b.v").as(out))

  /** Per-source fusion report from claims(entity, source, val) and the
    * held-out truth(entity, tru): n_claims, consensus agreement before
    * and after the trust reweight, and accuracy against truth.
    * Sources need not cover every entity. */
  def report(claims0: DataFrame, truth: DataFrame): DataFrame = {
    // Reused four times below (two vote rounds, trust, the report);
    // eager localCheckpoint prices the synthesis once.
    val claims = claims0.localCheckpoint(true)
    val c1 = consensus(
      claims.groupBy("entity", "val").agg(count(lit(1)).as("w")), "cons")
      .localCheckpoint(true) // feeds trust AND the report
    val trust = claims.join(c1, "entity")
      .groupBy("source")
      .agg(sum(when(col("val") === col("cons"), 1L).otherwise(0L))
        .as("trust"))
    val c2 = consensus(
      claims.join(broadcast(trust), "source")
        .groupBy("entity", "val").agg(sum("trust").as("w")), "cons2")
    claims.join(c1, "entity").join(c2, "entity").join(truth, "entity")
      .groupBy("source")
      .agg(count(lit(1)).as("n_claims"),
        sum(when(col("val") === col("cons"), 1L).otherwise(0L))
          .as("match_r1"),
        sum(when(col("val") === col("cons2"), 1L).otherwise(0L))
          .as("match_r2"),
        sum(when(col("val") === col("tru"), 1L).otherwise(0L))
          .as("n_correct"))
      .orderBy("source")
  }
}
