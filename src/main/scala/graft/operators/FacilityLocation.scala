package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy facility-location data selection (Krause & Golovin's
  * submodular-maximization survey 2014; the CRAIG/coreset-selection
  * shape, Mirzasoleiman et al. ICML 2020) — the subset-selection lens
  * the curation stack still lacked: coverage_select (X260) maximizes
  * WORD coverage (set cover), the k-center coreset (X215) minimizes
  * the worst gap; facility location maximizes Σ_u max_{s∈S} sim(u, s)
  * — "every corpus point should have a close representative", the
  * objective used to pick training subsets that preserve gradient
  * structure. Greedy is the canonical solver (1 − 1/e guarantee,
  * monotone submodular), and its marginal gains are exactly
  * Σ_u max(sim(u, c) − best_u, 0) — one aggregation per round.
  *
  * Determinism: similarities are exact integer dots on the quantized
  * grid, clamped at 0 (facility location needs nonnegative utility);
  * argmax ties break to the smaller candidate id; gains and coverage
  * are exact Long sums. Both engines replay every round.
  *
  * Scale shape: ONE universe×candidates similarity pass (candidates
  * broadcast — the panel-bounded X9 shape, |C| model-sized), pinned
  * by localCheckpoint because every round re-reads it; each round is
  * one combine agg over that table plus a 1-row argmax collected to
  * the driver (the BPE-loop precedent: one bounded-size collect per
  * round, never corpus-sized). The best_u table updates by equi-join
  * against the chosen candidate's column — |U|-sized, bounded rounds,
  * plain localCheckpoint per round.
  */
object FacilityLocation {

  /** univ(id, qv) corpus vectors; cand(cid, cqv) candidate pool.
    * Returns `k` rows: (round, cand_id, gain_q, total_q) — the pick
    * sequence with marginal gains and cumulative coverage.
    *
    * The candidate pool is LOUDLY capped (default 4096): the
    * similarity pass materializes |U|·|C| rows and broadcasts the
    * pool, so an unbounded C silently turns the checkpoint into an
    * all-pairs table (the Shapley ≤20 discipline — enforce the
    * envelope, don't let it degrade). Pre-select candidates (hash
    * sample, k-center, coverage) before calling with a larger pool.
    */
  def greedySelect(univ: DataFrame, cand: DataFrame, k: Int,
      maxCandidates: Int = 4096,
      maxSimRows: Long = 2147483648L): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val nCand = cand.count()
    require(nCand <= maxCandidates,
      s"candidate pool ($nCand) exceeds maxCandidates ($maxCandidates):" +
        " the O(|U|*|C|) similarity checkpoint and the broadcast both" +
        " assume a model-sized pool - pre-select candidates first")
    // corpus-linear CONTRACT (SCALE_SWEEP_r13): the cost is |U|*|C|
    // rows MATERIALIZED in the similarity checkpoint and re-read every
    // round — linear in the corpus only because |C| is capped. Fail
    // loudly before building a checkpoint that exceeds the envelope,
    // with the remedy named, instead of letting a 100x corpus turn
    // the pin into a storage surprise.
    val nUniv = univ.count()
    require(nUniv * nCand <= maxSimRows,
      s"similarity table (|U|=$nUniv x |C|=$nCand = ${nUniv * nCand}" +
        s" rows) exceeds maxSimRows ($maxSimRows): shard the universe" +
        " (run per-shard selects and merge-rank picks) or shrink the" +
        " candidate pool before calling")
    val spark = univ.sparkSession
    import spark.implicits._
    val dot = graft.llm.VectorOps.dotFn(spark)
    // one similarity pass, every round re-reads it
    val sims = univ.crossJoin(broadcast(cand))
      .select(col("id"), col("cid"),
        greatest(dot(col("qv"), col("cqv")), lit(0L)).as("s"))
      .localCheckpoint(true)
    var best = univ.select(col("id"), lit(0L).as("b"))
      .localCheckpoint(true)
    var picked = List.empty[(Long, Long, Long)] // (cid, gain, total)
    for (_ <- 1 to k) {
      val done = picked.map(_._1)
      val gains = sims
        .filter(if (done.isEmpty) lit(true) else !col("cid").isin(done: _*))
        .join(best, "id")
        .groupBy("cid")
        .agg(sum(greatest(col("s") - col("b"), lit(0L))).as("gain"))
      // 1-row argmax to the driver (bounded: |C| rows reduced first)
      val top = gains.orderBy(col("gain").desc, col("cid")).limit(1)
        .as[(Long, Long)].collect().head
      best = best
        .join(sims.filter(col("cid") === top._1)
          .select(col("id"), col("s").as("_sc")), Seq("id"), "left")
        .select(col("id"),
          greatest(col("b"), coalesce(col("_sc"), lit(0L))).as("b"))
        .localCheckpoint(true)
      val total = best.agg(sum("b")).as[Long].collect().head
      picked = picked :+ ((top._1, top._2, total))
    }
    picked.zipWithIndex
      .map { case ((cid, g, t), i) => (i + 1L, cid, g, t) }
      .toDF("round", "cand_id", "gain_q", "total_q")
      .orderBy("round")
  }
}
