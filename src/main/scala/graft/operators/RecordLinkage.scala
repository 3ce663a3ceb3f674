package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage scoring (X284; Fellegi & Sunter JASA
  * 1969) — the decision theory behind every dedup/merge of records
  * WITHOUT shared keys: each comparison field f contributes the
  * log-likelihood ratio of its agreement pattern,
  *   agree:    w_f = ln(m_f / u_f)
  *   disagree: w_f = ln((1−m_f) / (1−u_f))
  * (m_f = P(agree | true match), u_f = P(agree | non-match)), and the
  * pair's score Σ w_f orders pairs for the link / possible / non-link
  * decision. Crucially the WEIGHTS are learned, not hand-tuned: a
  * field that often disagrees even on matches (dirty names) earns a
  * small penalty, a field that rarely agrees by chance (exact name)
  * earns a big reward.
  *
  * This is the SUPERVISED fit: m/u estimated from a labeled truth
  * column on the candidate pairs (a planted-perturbation feed or a
  * clerical-review sample — the EM variant bootstraps the same
  * counts; its fixed-round form is a natural extension). Add-one
  * smoothing keeps every probability in (0,1) so both weights are
  * finite:
  *   m_f = (n_Ma+1)/(n_M+2), u_f = (n_Ua+1)/(n_U+2).
  *
  * Exact arithmetic: each weight is a micro-floored ln PAIR on
  * integer products (the X276 discipline) —
  *   wa_f = ⌊ln((n_Ma+1)(n_U+2))·10⁶⌋ − ⌊ln((n_M+2)(n_Ua+1))·10⁶⌋ —
  * so scores are exact integer sums and the verdict thresholds are
  * integer comparisons.
  *
  * Scale: ONE combine-agg over the candidates to a 1-row weight
  * table (2 counts per field + 2 totals), broadcast back; scoring is
  * a projection. Candidate generation is the CALLER's blocking
  * equi-join — this operator never sees the cross product.
  */
object RecordLinkage {

  def fellegiSunter(cands: DataFrame, fields: Seq[String],
      truthCol: String, passCols: Seq[String],
      upperMicro: Long = 4000000L, lowerMicro: Long = 0L): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(upperMicro >= lowerMicro,
      s"upper ($upperMicro) must be >= lower ($lowerMicro)")
    def lmu(x: Column): Column =
      floor(log(x.cast("double")) * 1000000.0).cast("long")
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val aggs = Seq(
      sum(when(col(truthCol), 1L).otherwise(0L)).as("_nm"),
      sum(when(col(truthCol), 0L).otherwise(1L)).as("_nu")) ++
      fields.flatMap { f => Seq(
        sum(when(col(truthCol) && col(f), 1L).otherwise(0L)).as(s"_ma_$f"),
        sum(when(!col(truthCol) && col(f), 1L).otherwise(0L)).as(s"_ua_$f"))
      }
    val w = cands.agg(aggs.head, aggs.tail: _*)
    val scored = cands.crossJoin(broadcast(w))
    val score = fields.map { f =>
      val wa = lmu((dec(col(s"_ma_$f")) + 1) * (dec(col("_nu")) + 2)) -
        lmu((dec(col("_nm")) + 2) * (dec(col(s"_ua_$f")) + 1))
      val wd = lmu((dec(col("_nm") - col(s"_ma_$f")) + 1) *
          (dec(col("_nu")) + 2)) -
        lmu((dec(col("_nm")) + 2) *
          (dec(col("_nu") - col(s"_ua_$f")) + 1))
      when(col(f), wa).otherwise(wd)
    }.reduce(_ + _)
    val nAgree = fields.map(f => when(col(f), 1).otherwise(0))
      .reduce(_ + _)
    scored.select(passCols.map(col) ++ Seq(
        nAgree.as("n_agree"),
        score.as("score_micro"),
        when(score >= upperMicro, "link")
          .when(score >= lowerMicro, "possible")
          .otherwise("nonlink").as("verdict"),
        col(truthCol).as("is_match")): _*)
      .orderBy(passCols.map(col): _*)
  }

  /** Sorted-neighborhood candidate pairs (X291; Hernández & Stolfo
    * SIGMOD'95) — the OTHER standard blocking next to equi-key
    * blocking: sort all records by a fuzzy key, emit every pair
    * within a sliding window of `w` ranks. Where an equi-block
    * fragments under dirt (an OCR'd prefix moves a record to a
    * different block forever), a well-chosen sort key keeps the dirty
    * record ADJACENT to its master, and multi-pass SN with different
    * keys (the caller unions passes) covers each key's blind spots.
    *
    * Determinism: the sort order is (keys…, id) — total. Rank
    * assignment is a range-partitioned sort with per-partition local
    * numbering stitched by driver-held partition counts
    * (`zipWithIndex` — metadata-only, no global single-partition
    * window, the SuffixArray global-rank discipline); rank values are
    * partition-layout-independent because the order is total. Pairing
    * is an explode of the (w−1) forward offsets + one equi-join on
    * rank — never a range join, never a cross product; candidates are
    * exactly n·(w−1) rows.
    *
    * Returns (id_a, id_b) with id_a earlier in sort order.
    */
  def sortedNeighborhoodPairs(recs: DataFrame, idCol: String,
      orderCols: Seq[Column], w: Int): DataFrame = {
    require(w >= 2, s"window ($w) must be >= 2")
    val spark = recs.sparkSession
    import spark.implicits._
    val keyed = recs.select(col(idCol).cast("long").as("_id") +:
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"_k$i") }: _*)
    val ord = orderCols.indices.map(i => col(s"_k$i")) :+ col("_id")
    val sorted = keyed
      .repartitionByRange(ord: _*)
      .sortWithinPartitions(ord: _*)
    val rn = sorted.select(col("_id")).as[Long].rdd.zipWithIndex()
      .map { case (id, i) => (id, i + 1) }
      .toDF("_id", "_rn")
      .localCheckpoint(true) // both sides of the offset join
    rn.select(col("_id").as("id_a"), col("_rn"),
        explode(array((1 until w).map(lit): _*)).as("_o"))
      .withColumn("_rn2", col("_rn") + col("_o"))
      .join(rn.select(col("_id").as("id_b"), col("_rn").as("_rn2")),
        "_rn2")
      .select("id_a", "id_b")
  }

  /** Unsupervised Fellegi–Sunter parameter fit by fixed-round EM
    * (X325; Winkler '88 — the extension [[fellegiSunter]]'s scaladoc
    * promises): when NO truth column exists, the m/u/p parameters are
    * latent and EM over the comparison-PATTERN counts recovers them —
    * the two-class conditional-independence mixture. E-step: posterior
    * match weight per pattern w_γ = p·Πf(m)/(p·Πf(m)+(1−p)·Πf(u));
    * M-step: p, m_f, u_f re-estimated from w-weighted pattern counts.
    *
    * Everything after ONE corpus combine-agg runs on the ≤2^|fields|
    * -row pattern table and a 1-row parameter frame per round —
    * model-sized, unrolled, no driver collection. Fixed point: params
    * live on the micro grid clamped to [1000, 999000] (no zeros, no
    * saturation), likelihood products chain in NANO (micro floors
    * zero small products — the pLSA lesson), every division floors
    * once on nonnegative operands, so DuckDB `//` replays Spark `div`
    * exactly and the oracle unrolls rounds as MATERIALIZED CTEs.
    *
    * Returns the pattern table after `rounds` EM rounds: the fields,
    * n_pairs, the posterior w_match_micro, and the fitted params as
    * constant columns (p_micro, plus m and u per field).
    */
  def emFit(cands: DataFrame, fields: Seq[String], rounds: Int = 5)
    : DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val dec = (x: Column) => x.cast("decimal(38,0)")
    def caseOf(f: String, kind: String): String =
      s"CASE WHEN $f THEN ${kind}_$f ELSE 1000000 - ${kind}_$f END"
    def prodOf(kind: String): String =
      fields.tail.foldLeft(s"(${caseOf(fields.head, kind)} * 1000)")(
        (a, f) => s"(($a * ${caseOf(f, kind)}) div 1000000)")
    val pat = cands.groupBy(fields.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // every round's E-step + the final output
    def estep(par: DataFrame): DataFrame =
      pat.crossJoin(broadcast(par))
        .withColumn("_num", expr(s"(p * ${prodOf("m")}) div 1000000"))
        .withColumn("_den2",
          expr(s"((1000000 - p) * ${prodOf("u")}) div 1000000"))
        .withColumn("w",
          expr("(_num * 1000000) div greatest(_num + _den2, 1)"))
    def clamp(c: Column): Column =
      least(greatest(c, lit(1000L)), lit(999000L))
    def mstep(e: DataFrame): DataFrame = {
      val aggs = Seq(
        sum(expr("n * w")).as("_sw"),
        sum(expr("n * (1000000 - w)")).as("_swu"),
        sum(col("n")).as("_nn")) ++
        fields.flatMap { f => Seq(
          sum(expr(s"CASE WHEN $f THEN n * w ELSE 0 END")).as(s"_a_$f"),
          sum(expr(s"CASE WHEN $f THEN n * (1000000 - w) ELSE 0 END"))
            .as(s"_b_$f"))
        }
      e.agg(aggs.head, aggs.tail: _*).select(
        clamp(graft.llm.TextOps.floorDivDec(dec(col("_sw")),
          dec(col("_nn"))).cast("long")).as("p") +:
          fields.flatMap { f => Seq(
            clamp(graft.llm.TextOps.floorDivDec(
              dec(col(s"_a_$f")) * lit(1000000L),
              greatest(dec(col("_sw")), lit(1L).cast("decimal(38,0)")))
              .cast("long")).as(s"m_$f"),
            clamp(graft.llm.TextOps.floorDivDec(
              dec(col(s"_b_$f")) * lit(1000000L),
              greatest(dec(col("_swu")), lit(1L).cast("decimal(38,0)")))
              .cast("long")).as(s"u_$f"))
          }: _*)
    }
    var par = cands.sparkSession.range(1).select(
      lit(500000L).as("p") +: fields.flatMap(f =>
        Seq(lit(900000L).as(s"m_$f"), lit(100000L).as(s"u_$f"))): _*)
    for (_ <- 1 to rounds) par = mstep(estep(par))
    estep(par).select(fields.map(col) ++ Seq(
        col("n").as("n_pairs"), col("w").as("w_match_micro"),
        col("p").as("p_micro")) ++
        fields.flatMap(f => Seq(col(s"m_$f"), col(s"u_$f"))): _*)
      .orderBy(fields.map(col): _*)
  }
}
