package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-diagnostics and governed-release operators: the model-prep
  * audits (predictive-power binning) and the privacy-preserving stats
  * release a training-data platform publishes about its corpus.
  */
object FeatureOps {

  /** Mutual-information feature screening (X283; Shannon 1948, the
    * filter-method standard next to [[woeIv]]'s credit-scoring WOE) —
    * which word-presence features carry the most information about a
    * class label, the ranking that seeds a quality/lang classifier's
    * vocabulary before any training run. Unlike per-class keyness
    * (X276), MI scores a feature against the WHOLE label
    * distribution, and unlike chi-square it reads in nats with a
    * direct coding interpretation.
    *
    * I(X;Y)·N = Σ_{x∈{0,1},y} n_xy·[ln(n_xy·N) − ln(n_x·n_y)], an
    * exact integer in micro-nats (each ln taken on an integer-valued
    * double and micro-floored — the X276 ln-pair discipline; a zero
    * cell contributes zero). The ABSENCE cells (x = 0) are computed,
    * not skipped: a word missing from one class is informative, and
    * dropping the 0-row understates MI exactly where it matters
    * (the X237 complete-the-grid lesson).
    *
    * Scale: one distinct-(doc, word) tokenize pass to the (word ×
    * label) presence counts; the label marginals broadcast (|labels|
    * rows); the grid completes by a vocab × |labels| broadcast-join
    * fan-out — vocabulary-bounded, never corpus-bounded. Top-k is a
    * TakeOrdered. Output: (word, df, mi_n_micro), MI descending.
    */
  def miFeatures(df: DataFrame, idCol: String, textCol: String,
      label: Column, topK: Int = 25): DataFrame = {
    require(topK >= 1, s"topK ($topK) must be >= 1")
    def lmu(x: Column): Column =
      floor(log(x.cast("double")) * 1000000.0).cast("long")
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val base = df.select(col(idCol).as("_id"), label.as("_y"),
        explode(array_distinct(TextOps.words(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
    val n1y = base.groupBy("w", "_y").agg(count(lit(1)).as("n1y"))
    val yTot = df.select(label.as("_y")).groupBy("_y")
      .agg(count(lit(1)).as("ny"))
    val nTot = df.agg(count(lit(1)).as("n"))
    val dfw = n1y.groupBy("w").agg(sum("n1y").as("df"))
    val grid = dfw.crossJoin(broadcast(yTot))
      .join(n1y, Seq("w", "_y"), "left")
      .withColumn("n1y", coalesce(col("n1y"), lit(0L)))
      .crossJoin(broadcast(nTot))
    val t1 = when(col("n1y") > 0L,
      col("n1y") * (lmu(dec(col("n1y")) * dec(col("n")))
        - lmu(dec(col("df")) * dec(col("ny"))))).otherwise(0L)
    val n0y = col("ny") - col("n1y")
    val t0 = when(n0y > 0L,
      n0y * (lmu(dec(n0y) * dec(col("n")))
        - lmu(dec(col("n") - col("df")) * dec(col("ny"))))).otherwise(0L)
    grid.select(col("w"), col("df"), (t1 + t0).as("_t"))
      .groupBy("w", "df").agg(sum("_t").as("mi_n_micro"))
      .select(col("w").as("word"), col("df"), col("mi_n_micro"))
      .orderBy(col("mi_n_micro").desc, col("word"))
      .limit(topK)
  }

  /** Weight-of-evidence / information-value table — the classic
    * feature-screening audit (credit-scoring lineage): bin a numeric
    * feature into equi-depth deciles and report, per bin, how the
    * good/bad label mix deviates from the global mix. IV ≳ 0.3 ⇒
    * strong feature; ≈ 0 ⇒ carries nothing.
    *
    * Determinism: the feature is micro-quantized BEFORE percentiles, so
    * edges are interpolations of exact integers with the shared
    * (quantile_cont ≡ Spark percentile) formula; bin membership is
    * VALUE-based (1 + Σ [v > edge_i]) so equal values land in the same
    * bin regardless of partition order — an ntile/row-position spelling
    * would tie-break differently per engine and was rejected. WOE uses
    * add-half smoothing — ln of an exact rational of integer counts —
    * round6-pinned per bin; per-bin IV contributions are emitted
    * instead of a float total (the X142 chi-square rule: summing
    * doubles across rows is the reader's one fold, not the engine's).
    *
    * Shape: one percentile agg for the edge row (broadcast back — it is
    * |bins| numbers), one combine agg to |bins| rows. Two corpus passes
    * by necessity (global edges, then binning).
    *
    * Output: (bin, n, n_bad, bad_rate, woe, iv_contrib), bin ∈ 1..bins.
    */
  def woeIv(df: DataFrame, featureCol: String, badLabel: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins ($bins) must be >= 2")
    val base = df.filter(col(featureCol).isNotNull)
      .select(floor(col(featureCol) * 1000000 + 0.5).cast("long").as("_f"),
        when(badLabel, 1L).otherwise(0L).as("_bad"))
    val qs = (1 until bins).map(i => i.toDouble / bins)
    val edges = base.agg(
      expr(s"percentile(_f, array(${qs.mkString(",")}))").as("_edges"))
    val binned = base.crossJoin(broadcast(edges))
      .withColumn("_bin", lit(1) + aggregate(col("_edges"), lit(0),
        (acc, e) => acc + when(col("_f") > e, 1).otherwise(0)))
    val counts = binned.groupBy("_bin")
      .agg(count(lit(1)).as("n"), sum("_bad").as("n_bad"))
    val tot = counts.agg(sum("n").as("_tn"), sum("n_bad").as("_tb"))
    counts.crossJoin(broadcast(tot))
      .withColumn("_g", col("n") - col("n_bad"))
      .withColumn("_tg", col("_tn") - col("_tb"))
      .withColumn("_gs", (col("_g").cast("double") + 0.5)
        / (col("_tg").cast("double") + 0.5 * bins))
      .withColumn("_bs", (col("n_bad").cast("double") + 0.5)
        / (col("_tb").cast("double") + 0.5 * bins))
      .select(col("_bin").as("bin"), col("n"), col("n_bad"),
        TextOps.round6(col("n_bad").cast("double") / col("n").cast("double"))
          .as("bad_rate"),
        TextOps.round6(log(col("_gs") / col("_bs"))).as("woe"),
        TextOps.round6((col("_gs") - col("_bs")) * log(col("_gs") / col("_bs")))
          .as("iv_contrib"))
  }

  /** Quantile (rank) normalization: map each value to its mid-rank
    * fractional position r = (#below + ½·#equal)/n ∈ (0,1) — the
    * distribution-free feature transform (uniformizes any marginal,
    * ties share one rank) used before mixing features of wildly
    * different scales.
    *
    * Exactness: r is a rational of three integer counts; the only
    * double is the final division, round6-pinned. Mid-rank (not
    * min-rank) so the transform is symmetric: reversing the sort
    * reverses r around ½ exactly.
    *
    * Shape: counts come from the value HISTOGRAM — one combine agg to
    * |distinct micro-values| rows; micro-quantization bounds that by
    * the value DOMAIN, not the corpus (a 2-decimal metric has ≤ 10⁴
    * cells per unit range). The prefix-sum window runs single-partition
    * over that aggregate — the M4/X158 report-grade argument; at a
    * domain too wide for one partition the same prefix decomposes into
    * per-range sums + broadcast offsets. The corpus itself is touched
    * by one agg and one equi-join back on the micro key.
    *
    * Output: df's idCol, value_micro, qnorm (round6).
    */
  def quantileNormalize(df: DataFrame, idCol: String,
      valueCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(idCol),
        floor(col(valueCol) * 1000000 + 0.5).cast("long").as("value_micro"))
    val hist = base.groupBy("value_micro").agg(count(lit(1)).as("_c"))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy("value_micro")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val tot = hist.agg(sum("_c").as("_n"))
    val ranked = hist
      .withColumn("_below", coalesce(sum(col("_c")).over(wOrd), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("value_micro"),
        TextOps.round6((col("_below").cast("double")
          + lit(0.5) * col("_c").cast("double")) / col("_n").cast("double"))
          .as("qnorm"))
    base.join(ranked, "value_micro")
      .select(col(idCol), col("value_micro"), col("qnorm"))
  }

  /** Differentially-private noised count release (ε-DP Laplace
    * mechanism, Dwork et al. 2006): per-group counts plus
    * Laplace(1/ε) noise — the mechanism a platform uses to publish
    * corpus composition without revealing any single document's
    * membership. Sensitivity of a count is 1, so scale b = 1/ε.
    *
    * Deterministic-noise contract (what makes this oracle-checkable
    * AND operationally sane): the noise draw is the inverse-CDF
    * transform noise = −b·sign(u−½)·ln(1−2·|u−½|) of u =
    * (h+½)/2⁴⁸ with h the 48-bit md5 of salt|group — one draw PER
    * GROUP, fixed by the salt, so re-running the release never leaks a
    * fresh-noise average of the true count (the known repeated-query
    * attack on naive re-randomization; the salt IS the release epoch).
    *
    * Shape: one combine count agg; the noise expression is evaluated
    * on the |groups|-row aggregate. `n_true` is emitted for the audit/
    * oracle surface — a production release publishes only `released`.
    *
    * Output: (groupCols…, n_true, released round6).
    */
  def dpNoisedCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      salt: String): DataFrame = {
    require(epsilon > 0, s"epsilon ($epsilon) must be > 0")
    val b = 1.0 / epsilon
    val keyStr = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    val h = conv(substring(md5(concat(lit(s"$salt|"), keyStr)), 1, 12),
      16, 10).cast("long")
    val u = (h.cast("double") + 0.5) / 281474976710656.0
    val noise = -lit(b) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_true"))
      .withColumn("released",
        TextOps.round6(col("n_true").cast("double") + noise))
  }

  /** Mondrian split conformal prediction (Vovk 2005; Papadopoulos 2002;
    * per-group = "Mondrian" taxonomy) — the distribution-free interval
    * the calibration family (X196 Platt, X224 isotonic) still lacks:
    * Platt/isotonic recalibrate a SCORE; conformal wraps ANY point
    * predictor in an interval with a finite-sample marginal coverage
    * GUARANTEE (≥ 1−α, no distributional assumption), per group so the
    * guarantee is class-conditional, not averaged across groups.
    *
    * Construction, per group g: an md5-parity split (the hashBucket
    * discipline — membership is a pure function of the id) carves
    * calibration from test; the point predictor is the calibration
    * LOWER MEDIAN (an order statistic — no mean, so the whole pipeline
    * is integer); the conformal radius q̂ is the
    * ⌈(n_cal+1)(1−α)⌉-th smallest |v − pred| over calibration; the
    * audit reports achieved test coverage of pred ± q̂.
    *
    * Scale shape (the X218/X226 histogram argument): NOTHING is ever
    * sorted at corpus size. Both order statistics come from value
    * HISTOGRAMS — groupBy (group, cents-value) combine-aggs whose
    * cardinality is bounded by the metric's value DOMAIN, not its row
    * count — walked by a per-group cumulative window over metadata.
    * Three corpus passes total (cal value hist, cal residual hist, test
    * coverage), each reducing 100 TB to domain-sized cells before any
    * exchange. All arithmetic integer (cents in, ceil by `div`);
    * coverage is the single final round6.
    *
    * Output per group: (groupCol, n_cal, pred_cents, qhat_cents,
    * n_test, n_covered, coverage).
    */
  /** Exact ranking evaluation — ROC-AUC, average precision, and the
    * decile operating points — for a score column against a binary
    * label (X257). The readout the classifier family lacked: X76/X193
    * report the confusion at ONE threshold (zero); a gate-threshold
    * decision needs the whole curve, and AUC/AP are the two numbers a
    * curation team compares scorers by before picking the cutoff.
    *
    * No corpus sort: everything derives from the (score-bin → n_pos,
    * n_neg) HISTOGRAM. The caller quantizes scores to a BOUNDED bin
    * domain (a rate in micro-units div 1000 has ≤ 1001 bins — the X218
    * argument), so the windows below run over domain-sized metadata,
    * never corpus rows. AUC on binned scores with midrank tie-handling
    * IS the exact trapezoidal area of the binned ROC — and the binning
    * is the published scorer contract, not an approximation of it.
    *
    *  - AUC via the Mann–Whitney rank identity (AUC = U/(n₁n₀)),
    *    carried as exact DOUBLED integers (the X226 discipline):
    *    r1_x2 = Σ n₁(b)·(2·below(b)+t(b)+1), u1_x2 = r1_x2 − n₁(n₁+1),
    *    auc = u1_x2 / (2·n₁·n₀). Midranks = trapezoids across ties.
    *  - AP (step-wise, threshold-grouped — the sklearn definition) with
    *    per-threshold precision floored to integer MICRO before the
    *    Σ ΔTP·P fold, so the sum is exact and order-free (the X169
    *    quantize-before-sum rule): prec_micro(b) = ⌊TP≥b·10⁶/N≥b⌋,
    *    ap_micro = ⌊Σ n₁(b)·prec_micro(b) / n₁⌋.
    *  - Operating points: for j = 1..9, flag the top j-decile by score
    *    — threshold = the largest bin whose top-cumulative count covers
    *    ⌈j·n/10⌉ (ties may overshoot; deterministic) — and emit exact
    *    TPR/FPR rows.
    *
    * All products go through decimal(38,0) (n·10⁶ overflows int64 past
    * ~9·10¹² rows); positives-only floors make Spark decimal floor-div
    * and DuckDB `//` agree. Output: (measure, num, den, value) rows —
    * 'ap', 'auc', 'fpr_1'..'fpr_9', 'n_neg', 'n_pos', 'tpr_1'..'tpr_9'
    * — num/den the exact integers, value the round6 display ratio.
    */
  def rankEval(df: DataFrame, binCol: String, posCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val hist = df
      .select(col(binCol).as("bin"), when(posCol, 1L).otherwise(0L).as("p"))
      .groupBy("bin")
      .agg(sum("p").as("n1"), sum(lit(1L) - col("p")).as("n0"))
    val asc = w.orderBy("bin")
    val desc = w.orderBy(col("bin").desc)
    val h = hist
      .withColumn("t", col("n1") + col("n0"))
      .withColumn("below", coalesce(sum(col("t"))
        .over(asc.rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
      .withColumn("cum_tp",
        sum("n1").over(desc.rowsBetween(w.unboundedPreceding, 0)))
      .withColumn("cum_n",
        sum("t").over(desc.rowsBetween(w.unboundedPreceding, 0)))
      .withColumn("prec_micro", TextOps.floorDivDec(
        dec(col("cum_tp")) * lit(1000000), dec(col("cum_n"))))
    val tot = h.agg(
        sum("n1").as("np"), sum("n0").as("nn"),
        sum(dec(col("n1")) * dec(lit(2L) * col("below") + col("t") + 1L))
          .as("r1_x2"),
        sum(dec(col("n1")) * col("prec_micro")).as("ap_num"))
      .select(col("np"), col("nn"),
        (col("r1_x2") - dec(col("np")) * dec(col("np") + 1L)).as("u1_x2"),
        TextOps.floorDivDec(col("ap_num"), dec(col("np")))
          .cast("long").as("ap_micro"))
    val summary = tot.select(
        lit("auc").as("measure"), col("u1_x2").cast("long").as("num"),
        (lit(2L) * col("np") * col("nn")).as("den"),
        TextOps.round6(col("u1_x2").cast("double")
          / (lit(2.0) * col("np") * col("nn"))).as("value"))
      .unionAll(tot.select(lit("ap"), col("ap_micro"), lit(1000000L),
        TextOps.round6(col("ap_micro") / 1e6)))
      .unionAll(tot.select(lit("n_pos"), col("np"), lit(1L),
        TextOps.round6(col("np").cast("double"))))
      .unionAll(tot.select(lit("n_neg"), col("nn"), lit(1L),
        TextOps.round6(col("nn").cast("double"))))
    // decile operating points: the 9-row j spine × the bin histogram is
    // metadata×metadata; max_by picks the largest qualifying bin (bins
    // are distinct, so the argmax is total)
    val js = (1 to 9).map(j => s"($j)").mkString(", ")
    val spine = df.sparkSession.sql(s"SELECT * FROM VALUES $js AS t(j)")
    val pts = h.select("bin", "cum_tp", "cum_n")
      .crossJoin(broadcast(tot.select("np", "nn")))
      .join(broadcast(spine),
        col("cum_n") * 10 >= col("j") * (col("np") + col("nn")))
      .groupBy("j")
      .agg(max_by(struct(col("cum_tp"), col("cum_n")), col("bin")).as("s"),
        max("np").as("np"), max("nn").as("nn"))
    val tpr = pts.select(
      concat(lit("tpr_"), col("j")).as("measure"),
      col("s.cum_tp").as("num"), col("np").as("den"),
      TextOps.round6(col("s.cum_tp") / col("np").cast("double")).as("value"))
    val fpr = pts.select(
      concat(lit("fpr_"), col("j")).as("measure"),
      (col("s.cum_n") - col("s.cum_tp")).as("num"), col("nn").as("den"),
      TextOps.round6((col("s.cum_n") - col("s.cum_tp"))
        / col("nn").cast("double")).as("value"))
    summary.unionAll(tpr).unionAll(fpr).orderBy("measure")
  }

  def conformalInterval(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, alphaPct: Int, salt: String): DataFrame = {
    require(alphaPct > 0 && alphaPct < 100,
      s"alphaPct ($alphaPct) must be in (0, 100)")
    val w = org.apache.spark.sql.expressions.Window
    val ev = df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).as("g"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("cents"),
        (conv(substring(md5(concat(lit(s"$salt|"),
          col(idCol).cast("string"))), 1, 4), 16, 10)
          .cast("int") % 2 === 0).as("cal"))
    // pass 1: calibration value histogram → lower median per group
    val calHist = ev.filter(col("cal"))
      .groupBy("g", "cents").agg(count(lit(1)).as("n"))
    val nCal = calHist.groupBy("g").agg(sum("n").as("n_cal"))
    val byVal = w.partitionBy("g").orderBy("cents")
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val pred = calHist.withColumn("_cum", sum("n").over(byVal))
      .join(nCal, "g")
      .filter(col("_cum") >= expr("(n_cal + 1) div 2")) // lower median rank
      .groupBy("g", "n_cal").agg(min("cents").as("pred_cents"))
    // pass 2: calibration residual histogram → conformal radius q̂ =
    // the ⌈(n_cal+1)(100−alphaPct)/100⌉-th smallest |v − pred|
    val resHist = ev.filter(col("cal"))
      .join(broadcast(pred), "g")
      .select(col("g"), abs(col("cents") - col("pred_cents")).as("r"))
      .groupBy("g", "r").agg(count(lit(1)).as("n"))
    val byR = w.partitionBy("g").orderBy("r")
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val keep = 100 - alphaPct
    val qhat = resHist.withColumn("_cum", sum("n").over(byR))
      .join(broadcast(pred), "g")
      .filter(col("_cum") >=
        expr(s"((n_cal + 1) * $keep + 99) div 100")) // ceil((n+1)·keep/100)
      .groupBy("g").agg(min("r").as("qhat_cents"))
    // pass 3: achieved coverage on the held-out split
    ev.filter(!col("cal"))
      .join(broadcast(pred), "g")
      .join(broadcast(qhat), "g")
      .groupBy("g", "n_cal", "pred_cents", "qhat_cents")
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("cents") - col("pred_cents")) <= col("qhat_cents"),
          1L).otherwise(0L)).as("n_covered"))
      .select(col("g").as(groupCol), col("n_cal"), col("pred_cents"),
        col("qhat_cents"), col("n_test"), col("n_covered"),
        TextOps.round6(col("n_covered") / col("n_test").cast("double"))
          .as("coverage"))
  }
}
