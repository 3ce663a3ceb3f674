package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Annotation/rater-quality and attribution operators: the audits a
  * labeling or curation pipeline publishes about its own judges
  * (inter-rater agreement) and its inputs (credit attribution).
  * Extension surface beyond the reference (ref repo `etl_utils.py`
  * has no analytics; SURVEY §2.7).
  */
object EvalOps {

  private def dec(x: Column): Column = x.cast("decimal(38,0)")

  /** Exact Shapley attribution of vocabulary coverage to sources
    * (X279; Shapley 1953) — "how much of the corpus's distinct-word
    * coverage is each source RESPONSIBLE for", the fair-division
    * answer to data-mixture credit where raw per-source vocab counts
    * double-pay shared words and unique-word counts pay nothing for
    * redundancy insurance.
    *
    * The naive Shapley costs 2^|sources| coalition evaluations. For
    * the COVERAGE game it collapses to a closed form: v(S) =
    * |∪_{i∈S} W_i| = Σ_w 1[S ∩ M_w ≠ ∅] (M_w = sources containing w)
    * is a sum of indicator games, Shapley is linear, and the
    * indicator game of coalition T is symmetric in T's members and
    * dummy elsewhere, so each member gets exactly 1/|T| (efficiency +
    * symmetry + dummy force it). Hence
    *   φ_i = Σ_{w : i ∈ M_w} 1 / |M_w|
    * — ONE aggregation, no subset enumeration, and still the exact
    * game-theoretic value.
    *
    * Exact arithmetic: 1/|M_w| is carried as lcm(1..20)/|M_w| =
    * 232792560/|M_w|, an exact integer for ≤ 20 sources (ENFORCED —
    * a word shared by more than 20 sources raises at execution time
    * rather than silently flooring; see `cChecked` below),
    * so `shapley_scaled` is an exact integer sum whose corpus-wide
    * total is PROVABLY vocab·lcm (the efficiency axiom — pinned in
    * the spec); `shapley_micro` floors once at the end.
    *
    * Scale: distinct (source, word) pairs → a word-keyed combine-agg
    * for |M_w| → one equi-join back → a source-keyed combine-agg.
    * Every intermediate is vocabulary-bounded, never corpus-bounded.
    * Output per source: (source, n_words, n_unique, shapley_scaled,
    * shapley_micro).
    */
  def shapleyCoverage(df: DataFrame, unitCol: String, textCol: String)
      : DataFrame = {
    val lcm20 = 232792560L // lcm(1..20): exact 1/c for up to 20 sources
    val pairs = df.select(col(unitCol).as("u"),
        explode(TextOps.words(col(textCol))).as("w"))
      .filter(col("w") =!= "").distinct()
    val cnt = pairs.groupBy("w").agg(count(lit(1)).as("c"))
    // the <= 20 requirement is ENFORCED, not advisory: past 20 sources
    // lcm20/c would silently floor and break the efficiency axiom, so a
    // wider corpus fails loudly instead of summing to the wrong total
    val cChecked = when(col("c") <= 20L, col("c")).otherwise(raise_error(
      concat(lit("shapleyCoverage: a word is shared by "), col("c"),
        lit(" sources; the lcm(1..20) exact-1/|M_w| encoding requires"
          + " <= 20 distinct sources"))))
    pairs.join(cnt, "w")
      .groupBy("u").agg(
        count(lit(1)).as("n_words"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_unique"),
        sum(TextOps.floorDivDec(dec(lit(lcm20)), dec(cChecked))
          .cast("long")).as("shapley_scaled"))
      .select(col("u").as(unitCol), col("n_words"), col("n_unique"),
        col("shapley_scaled"),
        TextOps.floorDivDec(dec(col("shapley_scaled")) * lit(1000000L),
          dec(lit(lcm20))).cast("long").as("shapley_micro"))
      .orderBy(unitCol)
  }

  /** B-cubed clustering evaluation (X282; Bagga & Baldwin 1998, the
    * Amigó et al. 2009 survey's recommended extrinsic measure) — how
    * good is a PREDICTED dup-clustering against gold groups, scored
    * per ELEMENT so big clusters can't hide small-cluster mistakes
    * (the pathology of pair-counting Rand: one giant cluster
    * dominates the pair count). Per element e, precision = |C(e) ∩
    * G(e)|/|C(e)| and recall = |C(e) ∩ G(e)|/|G(e)|, averaged over
    * all N elements.
    *
    * The per-element sums collapse onto the (cluster × gold) CELLS:
    * every element of a cell shares its |C∩G| = n_cell, so
    *   B³P = (1/N) Σ_cells n_cell²/n_c,  B³R = (1/N) Σ_cells n_cell²/n_g.
    * Each cell term quantizes to ⌊n_cell²·10¹²/n_c⌋ BEFORE the sum
    * (the X61 order-free rule), the averages floor once more by
    * N·10⁶ back to micro, and F1 = ⌊2PR/(P+R)⌋ on the quantized
    * micro values (0 when P+R = 0). All divisions nonnegative —
    * [[TextOps.floorDivDec]] ≡ DuckDB `//`.
    *
    * Scale: three combine-aggs (cells, cluster sizes, gold sizes) +
    * two equi-joins on cluster keys + one scalar agg. Intermediates
    * are cluster-count-bounded. Callers map unclustered elements to
    * singleton ids first (the standard convention).
    */
  def bcubed(assign: DataFrame, predCol: String, goldCol: String)
      : DataFrame = {
    val cells = assign.groupBy(col(predCol).as("_c"), col(goldCol).as("_g"))
      .agg(count(lit(1)).as("n_cell"))
    val cSize = cells.groupBy("_c").agg(sum("n_cell").as("n_c"))
    val gSize = cells.groupBy("_g").agg(sum("n_cell").as("n_g"))
    val t = lit(1000000000000L)
    val terms = cells.join(cSize, "_c").join(gSize, "_g")
      .select(col("n_cell"),
        TextOps.floorDivDec(dec(col("n_cell")) * dec(col("n_cell")) * t,
          dec(col("n_c"))).cast("long").as("_pt"),
        TextOps.floorDivDec(dec(col("n_cell")) * dec(col("n_cell")) * t,
          dec(col("n_g"))).cast("long").as("_rt"),
        col("_c"), col("_g"))
    val m = lit(1000000L)
    terms.agg(sum("n_cell").as("n_items"),
        countDistinct("_c").as("n_clusters"),
        countDistinct("_g").as("n_gold"),
        sum("_pt").as("_ps"), sum("_rt").as("_rs"))
      .select(col("n_items"), col("n_clusters"), col("n_gold"),
        TextOps.floorDivDec(dec(col("_ps")), dec(col("n_items")) * m)
          .cast("long").as("bcubed_p_micro"),
        TextOps.floorDivDec(dec(col("_rs")), dec(col("n_items")) * m)
          .cast("long").as("bcubed_r_micro"))
      .withColumn("f1_micro",
        when(col("bcubed_p_micro") + col("bcubed_r_micro") === 0L, 0L)
          .otherwise(TextOps.floorDivDec(
            dec(col("bcubed_p_micro")) * dec(col("bcubed_r_micro"))
              * lit(2L),
            dec(col("bcubed_p_micro") + col("bcubed_r_micro")))
            .cast("long")))
  }

  /** Bradley–Terry strength ranking from pairwise outcomes (X280;
    * Bradley & Terry 1952, MM iteration per Hunter AoS 2004) — the
    * model behind preference-data ranking (and chess Elo's static
    * cousin): P(i beats j) = s_i/(s_i+s_j), fit by the minorize-
    * maximize update s_i ← W_i / Σ_j n_ij/(s_i+s_j), which Hunter
    * proves monotone in the likelihood. Head-to-head win RATES can't
    * rank transitively (A>B>C>A cycles); the BT fit is the principled
    * aggregate.
    *
    * Determinism: strengths live as micro-unit integers. Per round,
    * each opponent term quantizes to t_ij = ⌊n_ij·10¹²/(s_i+s_j)⌋
    * (= 10⁶ × the true term, floored), the update to
    * ⌊W_i·10¹²/Σt_ij⌋, and the mean-1 renormalization to
    * ⌊s_i·P·10⁶/Σs⌋ — three floors per round, identical in both
    * engines, clamped ≥ 1 so a winless player can't zero a later
    * denominator. Fixed `rounds` (the X56/X192 discipline) make the
    * whole fit replayable as unrolled CTEs.
    *
    * Scale: ONE corpus-pass combine-agg to the directed (winner,
    * loser, wins) table; every round thereafter runs on the
    * players²-bounded pair table (model-sized — two equi-joins + a
    * player-keyed agg per round), checkpointed per round to keep the
    * lineage flat. 100 TB cost is the first agg; the fit is free.
    * Output per player: (player, n_wins, n_games, strength_micro),
    * strongest first.
    */
  def bradleyTerry(matches: DataFrame, winnerCol: String, loserCol: String,
      rounds: Int = 15,
      materialize: DataFrame => DataFrame = _.localCheckpoint(eager = true))
      : DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val dirWins = matches
      .groupBy(col(winnerCol).as("i"), col(loserCol).as("j"))
      .agg(count(lit(1)).as("w"))
    // symmetric games table: one row per ORDERED (i, j) with that
    // direction's wins and the pair total n_ij = w_ij + w_ji
    val pairs = materialize(dirWins
      .select(col("i"), col("j"), col("w").as("wij"), lit(0L).as("wji"))
      .union(dirWins.select(col("j").as("i"), col("i").as("j"),
        lit(0L).as("wij"), col("w").as("wji")))
      .groupBy("i", "j")
      .agg(sum("wij").as("wij"), sum("wji").as("wji"))
      .select(col("i"), col("j"), col("wij"),
        (col("wij") + col("wji")).as("nij")))
    val players = materialize(pairs.groupBy("i").agg(
      sum("wij").as("n_wins"), sum("nij").as("n_games")))
    var s = materialize(players.select(col("i"),
      lit(1000000L).as("s")))
    (1 to rounds).foreach { _ =>
      val denom = pairs
        .join(s.select(col("i"), col("s").as("si")), "i")
        .join(s.select(col("i").as("j"), col("s").as("sj")), "j")
        .groupBy("i")
        .agg(sum(TextOps.floorDivDec(
          dec(col("nij")) * lit(1000000000000L),
          dec(col("si") + col("sj"))).cast("long")).as("d"))
      val raw = players.join(denom, "i")
        .select(col("i"), greatest(lit(1L), TextOps.floorDivDec(
          dec(col("n_wins")) * lit(1000000000000L), dec(col("d")))
          .cast("long")).as("s"))
      val tot = raw.agg(sum("s").as("t"), count(lit(1)).as("p"))
      s = materialize(raw.crossJoin(broadcast(tot))
        .select(col("i"), greatest(lit(1L), TextOps.floorDivDec(
          dec(col("s")) * dec(col("p")) * lit(1000000L), dec(col("t")))
          .cast("long")).as("s")))
    }
    players.join(s, "i")
      .select(col("i").as("player"), col("n_wins"), col("n_games"),
        col("s").as("strength_micro"))
      .orderBy(col("strength_micro").desc, col("player"))
  }

  /** Inter-rater agreement over R binary raters (X278; Cohen 1960,
    * Fleiss 1971) — the label-quality audit every human- or
    * model-annotated dataset needs before its labels are trusted:
    * raw percent agreement rewards raters for agreeing on the easy
    * majority class, kappa measures agreement ABOVE the chance level
    * implied by each rater's own marginals.
    *
    * Emits one row per unordered rater pair (Cohen's kappa: chance =
    * product of the two raters' marginals) plus one `fleiss` row over
    * all R raters (Fleiss' kappa: per-item pairwise agreement
    * r(r−1)+(R−r)(R−r−1) over R(R−1), chance from the pooled
    * positive rate).
    *
    * Exact arithmetic: every po/pe/kappa is a ratio of exact integer
    * sums —
    *   Cohen: po = (n11+n00)/N, pe = (a1·b1+a0·b0)/N²,
    *          kappa = (N·(n11+n00) − (a1b1+a0b0)) / (N² − (a1b1+a0b0));
    *   Fleiss: with S = Σᵢrᵢ, A = Σᵢ[rᵢ(rᵢ−1)+(R−rᵢ)(R−rᵢ−1)],
    *          P = S² + (NR−S)²,
    *          kappa = (A·(NR)² − NR(R−1)·P) / (NR(R−1)·((NR)²−P)) —
    * quantized once at the end: po/pe by [[TextOps.floorDivDec]]
    * (nonnegative), kappa by [[TextOps.truncDivDec]] (signed; DuckDB's
    * `//` truncates toward zero, pinned by experiment — (-7)//2 = -3).
    * Products route through decimal(38,0). Degenerate den = 0 (every
    * rater constant, pe = 1) reports kappa_micro = 0 by convention.
    *
    * Scale: ONE combine-agg pass over the corpus to R(R−1)/2 + 4
    * scalar sums (one row); the output fan-out explodes that single
    * row to |pairs|+1 rows. No shuffle beyond the global agg's
    * 1-row exchange; 100 TB cost is the scan.
    */
  def raterKappa(df: DataFrame, raters: Seq[(String, Column)]): DataFrame = {
    require(raters.size >= 2, s"need >= 2 raters, got ${raters.size}")
    val r = raters.size
    val base = df.select(raters.zipWithIndex.map { case ((_, c), i) =>
      when(c, 1L).otherwise(0L).as(s"_r$i")
    }: _*)
    val rt = base.select(raters.indices.map(i => col(s"_r$i")) :+
      raters.indices.map(i => col(s"_r$i")).reduce(_ + _).as("_rt"): _*)
    val pairs = for {
      i <- raters.indices; j <- raters.indices if i < j
    } yield (i, j)
    val aggs =
      raters.indices.map(i => sum(col(s"_r$i")).as(s"s$i")) ++
      pairs.flatMap { case (i, j) => Seq(
        sum(col(s"_r$i") * col(s"_r$j")).as(s"n11_${i}_$j"),
        sum((lit(1L) - col(s"_r$i")) * (lit(1L) - col(s"_r$j")))
          .as(s"n00_${i}_$j"))
      } ++ Seq(
        sum(col("_rt")).as("ss"),
        sum(col("_rt") * (col("_rt") - 1L)
          + (lit(r.toLong) - col("_rt"))
            * (lit(r.toLong) - col("_rt") - 1L)).as("aa"),
        count(lit(1)).as("n"))
    val g = rt.agg(aggs.head, aggs.tail: _*)
    val m = lit(1000000L)
    def kap(pair: String, poNum: Column, poDen: Column, peNum: Column,
        peDen: Column, kNum: Column, kDen: Column): Column = struct(
      lit(pair).as("pair"),
      TextOps.floorDivDec(dec(poNum) * m, dec(poDen)).cast("long")
        .as("po_micro"),
      TextOps.floorDivDec(dec(peNum) * m, dec(peDen)).cast("long")
        .as("pe_micro"),
      when(kDen === 0L, 0L).otherwise(
        TextOps.truncDivDec(dec(kNum) * m, dec(kDen)).cast("long"))
        .as("kappa_micro"))
    val cohens = pairs.map { case (i, j) =>
      val agree = col(s"n11_${i}_$j") + col(s"n00_${i}_$j")
      val a1 = col(s"s$i"); val b1 = col(s"s$j")
      val chance = dec(a1) * dec(b1) +
        dec(col("n") - a1) * dec(col("n") - b1)
      kap(s"${raters(i)._1}|${raters(j)._1}",
        agree, col("n"),
        chance, dec(col("n")) * dec(col("n")),
        dec(col("n")) * dec(agree) - chance,
        dec(col("n")) * dec(col("n")) - chance)
    }
    val nr = dec(col("n")) * lit(r.toLong)
    val nrr1 = dec(col("n")) * lit(r.toLong) * lit((r - 1).toLong)
    val p = dec(col("ss")) * dec(col("ss")) +
      (nr - dec(col("ss"))) * (nr - dec(col("ss")))
    val fleiss = kap("fleiss",
      col("aa"), nrr1,
      p, nr * nr,
      dec(col("aa")) * nr * nr - nrr1 * p,
      nrr1 * (nr * nr - p))
    g.select(col("n").as("n_items"), lit(r).as("n_raters"),
        explode(array(cohens :+ fleiss: _*)).as("k"))
      .select(col("k.pair").as("pair"), col("n_items"), col("n_raters"),
        col("k.po_micro").as("po_micro"), col("k.pe_micro").as("pe_micro"),
        col("k.kappa_micro").as("kappa_micro"))
      .orderBy("pair")
  }

  /** Krippendorff's alpha, nominal data WITH MISSING RATINGS
    * (Krippendorff, Content Analysis §12) — the agreement coefficient
    * [[raterKappa]] can't be: kappa needs every rater on every item,
    * but real annotation queues route each doc to a SUBSET of raters.
    * Alpha pairs whatever ratings each unit actually has.
    *
    * Coincidence-matrix closed form, exact integers throughout: each
    * unit u with m_u ≥ 2 ratings contributes its ordered disagreeing
    * pairs weighted 1/(m_u−1); scaling by L = lcm(1..R−1) (R = rater
    * count, so (m_u−1) | L) keeps the sum integer:
    *   Do_L = Σ_u (L div (m_u−1)) · (m_u² − Σ_c cnt_uc²),
    *   De_L = L · (n² − Σ_c n_c²),   n = Σ m_u, n_c = category margins,
    *   alpha = 1 − (n−1)·Do_L / De_L
    * — one signed exact-integer division rendered through round6.
    * Units with m_u < 2 drop (nothing to pair); De_L = 0 (every kept
    * rating one category, or n ≤ 1) reports alpha = 0 by the repo's
    * degenerate-denominator convention.
    *
    * Scale: ONE corpus pass (per-rater structs exploded, absent
    * ratings filtered) to the (unit × category) cells; everything
    * after is unit- or category-bounded combine aggs. Output: one row
    * (n_units, n_values, do_scaled, de_scaled, alpha).
    */
  def krippAlpha(df: DataFrame, unitCol: String,
      raters: Seq[(String, Column, Column)]): DataFrame = {
    require(raters.size >= 2, s"need >= 2 raters, got ${raters.size}")
    val lcm = (1 until raters.size).reduce { (a, b) =>
      a / BigInt(a).gcd(BigInt(b)).toInt * b
    }
    val ratings = df.select(col(unitCol).as("_u"),
        explode(array(raters.map { case (_, verdict, present) =>
          struct(present.as("p"), verdict.cast("string").as("c"))
        }: _*)).as("_r"))
      .filter(col("_r.p"))
      .select(col("_u"), col("_r.c").as("_c"))
    val cells = ratings.groupBy("_u", "_c")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds units AND margins
    val units = cells.groupBy("_u")
      .agg(sum("cnt").as("m"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .filter(col("m") >= 2)
      .localCheckpoint(true) // feeds the Do sum AND the semi-join
    val doRow = units.agg(
      coalesce(sum(expr(s"($lcm div (m - 1)) * (m * m - s2)")), lit(0L))
        .as("do_scaled"),
      coalesce(sum("m"), lit(0L)).as("n"), count(lit(1)).as("n_units"))
    val deRow = cells.join(units.select("_u"), Seq("_u"), "left_semi")
      .groupBy("_c").agg(sum("cnt").as("nc"))
      .agg(coalesce(sum(col("nc") * col("nc")), lit(0L)).as("snc2"))
    val de = lit(lcm.toLong) * (col("n") * col("n") - col("snc2"))
    doRow.crossJoin(broadcast(deRow)).select(
      col("n_units"), col("n").as("n_values"), col("do_scaled"),
      de.as("de_scaled"),
      when(de === 0L || col("n") <= 1L, lit(0.0))
        .otherwise(TextOps.round6(
          (de - (col("n") - 1) * col("do_scaled")).cast("double") /
            de.cast("double"))).as("alpha"))
  }

  /** Best-of-n expected-maximum curve (X330; the BoN/rejection-sampling
    * readout of RLHF evaluation — how much does the best of n i.i.d.
    * samples beat one sample): with scores ranked ascending
    * s_(1) ≤ … ≤ s_(N), the max of n draws WITH replacement lands on
    * rank i with probability (iⁿ − (i−1)ⁿ)/Nⁿ, so
    *   E[max of n] = Σᵢ s_(i)·(iⁿ − (i−1)ⁿ) / Nⁿ
    * — EXACT integer order statistics, no sampling, no floats. (The
    * without-replacement variant needs C(i−1, n−1)/C(N, n), whose
    * binomials outgrow any fixed-width integer on large panels; the
    * with-replacement form is the standard estimator and its weights
    * iⁿ − (i−1)ⁿ stay inside decimal(38,0) for panels up to ~10⁴ at
    * n = 8 — callers cap the panel, as any BoN evaluation does.)
    *
    * Ranking ties break on (score, id) — total order, engine-stable.
    * One panel-sized sort window, one aggregation per n; the curve is
    * monotone nondecreasing in n by construction (spec-pinned).
    */
  /** Rank-biased overlap at a truncation depth (X332; Webber, Moffat &
    * Zobel TOIS 2010) — the label-free comparison of two RANKINGS the
    * retrieval-metrics family lacked: recall@k asks "same set?", RBO
    * asks "same ORDER?", weighting agreement at depth d by
    * (1−p)·p^(d−1)/d so the head matters most (p = persistence).
    *
    * Input contract: one row per item in BOTH truncated lists, with
    * its two ranks (1-based, both ≤ depth); queries with no common
    * item produce no row — callers zero-fill from their panel. An
    * item enters the depth-d intersection at d = max(ra, rb), so the
    * agreement X_d is one explode(sequence(max, depth)) + combine
    * count away — never a rank×rank join.
    *
    * Exactness: p is a RATIONAL pNum/pDen and the (1−p)·p^(d−1)
    * weights fold ONCE in the JVM by exact BigInt arithmetic
    * ([[rboWeights]] — the float spelling hit the 1 − 0.9 ≠ 0.1
    * double trap and disagreed with its own oracle by 2 micro) into
    * a micro table shared verbatim with the oracle (the X296 UCB
    * discipline); each depth term floors once ((X_d·w_d) div d), and
    * the sum normalizes by Σw_d so identical rankings score exactly
    * 10⁶ (the d·w_d div d = w_d identity — spec-pinned).
    */
  def rboWeights(depth: Int, pNum: Long, pDen: Long): Seq[(Long, Long)] =
    (1 to depth).map { d =>
      (d.toLong, (BigInt(1000000) * BigInt(pDen - pNum)
        * BigInt(pNum).pow(d - 1) / BigInt(pDen).pow(d)).toLong)
    }

  def rbo(matched: DataFrame, qCol: String, raCol: String, rbCol: String,
      depth: Int, pNum: Long = 9, pDen: Long = 10): DataFrame = {
    require(depth >= 1 && pNum > 0 && pNum < pDen,
      s"bad depth=$depth p=$pNum/$pDen")
    val spark = matched.sparkSession
    import spark.implicits._
    val wd = rboWeights(depth, pNum, pDen)
    val wsum = wd.map(_._2).sum
    val wdf = wd.toDF("d", "wd")
    matched
      .select(col(qCol).as("q"),
        explode(sequence(greatest(col(raCol), col(rbCol)).cast("long"),
          lit(depth.toLong))).as("d"))
      .groupBy("q", "d").agg(count(lit(1)).as("x"))
      .join(broadcast(wdf), "d")
      .groupBy("q")
      .agg(sum(expr("(x * wd) div d")).as("_t"), max("x").as("n_common"))
      .select(col("q"), col("n_common"),
        expr(s"(_t * 1000000) div $wsum").as("rbo_micro"))
  }

  def bestOfN(scored: DataFrame, idCol: String, scoreCol: String,
      maxN: Int): DataFrame = {
    require(maxN >= 1, s"maxN ($maxN) must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val ranked = scored
      .select(col(idCol).as("_id"), col(scoreCol).as("s"))
      .withColumn("i",
        row_number().over(Window.orderBy("s", "_id")).cast("long"))
      .localCheckpoint(true) // one branch per n re-reads it
    val np = ranked.agg(count(lit(1)).as("np"))
    def pw(c: Column, n: Int): Column =
      (1 until n).foldLeft(dec(c))((a, _) => a * dec(c))
    (1 to maxN).map { n =>
      ranked.crossJoin(broadcast(np))
        .groupBy("np")
        .agg(sum(dec(col("s"))
          * (pw(col("i"), n) - pw(col("i") - 1, n))).as("_num"))
        .select(lit(n.toLong).as("n"), col("np").as("n_panel"),
          TextOps.floorDivDec(col("_num"), pw(col("np"), n))
            .cast("long").as("exp_max_micro"))
    }.reduce(_ unionByName _).orderBy("n")
  }

  /** Corpus-level ROUGE-1/2 + log-BLEU-2 generation-overlap evaluation
    * (X344; Lin 2004; Papineni et al. 2002) — the reference-based
    * generation eval the serving stack lacked next to the label-based
    * (rank_eval) and label-free (rbo) comparisons: given (candidate,
    * reference) text pairs, how much n-gram content do candidates
    * share with their references. MICRO-aggregated per group (sums of
    * clipped counts over sums of totals — the corpus-level form that
    * doesn't let empty pairs vote).
    *
    * Exact integer arithmetic end to end:
    *  - clipped overlap clip_n = Σ_g min(cnt_cand(g), cnt_ref(g));
    *  - rougeN_p/r = ⌊clip·10⁶ / tot⌋, f1 = ⌊2pr/(p+r)⌋ (0 on 0+0) —
    *    the two-floor order is part of the contract, replayed
    *    identically by the oracle;
    *  - log-BLEU-2 stays in the LOG domain (exp is not correctly
    *    rounded cross-engine; ln on integer-valued doubles is the
    *    pinned X272/X276 discipline): ⌊(lp1 + lp2) div 2⌋ + brevity,
    *    lp_n = lmu(clip_n) − lmu(candTot_n) ≤ 0, brevity =
    *    min(0, 10⁶ − ⌊refTot1·10⁶/candTot1⌋); any zero clip clamps to
    *    the documented −20·10⁶ floor (log of zero precision).
    *
    * Scale: two tokenize passes per side (1-grams, 2-grams) to
    * (pair, gram) counts — skew-free keys, map-side combine; the
    * clip join is (pair, gram) equi; everything after is
    * group-bounded. Output one row per group, ordered.
    */
  def rougeBleu(pairs: DataFrame, pairIdCol: String, groupCol: String,
      candCol: String, refCol: String): DataFrame = {
    def lmu(x: Column): Column =
      floor(log(x.cast("double")) * 1000000.0).cast("long")
    def grams(c: String, side: String, n: Int): DataFrame = pairs
      .select(col(pairIdCol).as("pid"),
        explode(TextOps.shinglesFromWords(TextOps.words(col(c)), n))
          .as("g"))
      .groupBy("pid", "g").agg(count(lit(1)).as(s"c_$side"))
    def level(n: Int): DataFrame = {
      val cg = grams(candCol, "c", n)
      val rg = grams(refCol, "r", n)
      val clip = cg.join(rg, Seq("pid", "g"))
        .groupBy("pid")
        .agg(sum(least(col("c_c"), col("c_r"))).as(s"clip$n"))
      val tots = cg.groupBy("pid").agg(sum("c_c").as(s"ct$n"))
        .join(rg.groupBy("pid").agg(sum("c_r").as(s"rt$n")),
          Seq("pid"), "full_outer")
      tots.join(clip, Seq("pid"), "left")
        .select(col("pid"), coalesce(col(s"clip$n"), lit(0L)).as(s"clip$n"),
          coalesce(col(s"ct$n"), lit(0L)).as(s"ct$n"),
          coalesce(col(s"rt$n"), lit(0L)).as(s"rt$n"))
    }
    val byPair = pairs.select(col(pairIdCol).as("pid"),
        col(groupCol).as("grp"))
      .join(level(1), Seq("pid"), "left")
      .join(level(2), Seq("pid"), "left")
    val g = byPair.groupBy("grp").agg(
      count(lit(1)).as("n_pairs"),
      coalesce(sum("clip1"), lit(0L)).as("k1"),
      coalesce(sum("ct1"), lit(0L)).as("c1"),
      coalesce(sum("rt1"), lit(0L)).as("r1"),
      coalesce(sum("clip2"), lit(0L)).as("k2"),
      coalesce(sum("ct2"), lit(0L)).as("c2"),
      coalesce(sum("rt2"), lit(0L)).as("r2"))
    // ⌊a·10⁶/b⌋ on nonnegative longs: group totals are ≤ ~10¹¹ grams,
    // so the ·10⁶ products fit long and plain integer div is exact
    g.withColumn("rouge1_p_micro",
        when(col("c1") > 0, expr("(k1 * 1000000) div c1")).otherwise(lit(0L)))
      .withColumn("rouge1_r_micro",
        when(col("r1") > 0, expr("(k1 * 1000000) div r1")).otherwise(lit(0L)))
      .withColumn("rouge2_p_micro",
        when(col("c2") > 0, expr("(k2 * 1000000) div c2")).otherwise(lit(0L)))
      .withColumn("rouge2_r_micro",
        when(col("r2") > 0, expr("(k2 * 1000000) div r2")).otherwise(lit(0L)))
      .withColumn("rouge1_f1_micro",
        when(col("rouge1_p_micro") + col("rouge1_r_micro") > 0,
          expr("(2 * rouge1_p_micro * rouge1_r_micro) div " +
            "(rouge1_p_micro + rouge1_r_micro)")).otherwise(lit(0L)))
      .withColumn("rouge2_f1_micro",
        when(col("rouge2_p_micro") + col("rouge2_r_micro") > 0,
          expr("(2 * rouge2_p_micro * rouge2_r_micro) div " +
            "(rouge2_p_micro + rouge2_r_micro)")).otherwise(lit(0L)))
      .withColumn("_lp",
        (lmu(col("k1")) - lmu(col("c1")))
          + (lmu(col("k2")) - lmu(col("c2"))))
      .withColumn("_bp",
        least(lit(0L), lit(1000000L)
          - expr("(r1 * 1000000) div greatest(c1, 1)")))
      .withColumn("log_bleu2_micro",
        when(col("k1") > 0 && col("k2") > 0 && col("c1") > 0
            && col("c2") > 0,
          expr("_lp div 2") + col("_bp"))
          .otherwise(lit(-20000000L)))
      .select(col("grp"), col("n_pairs"),
        col("rouge1_p_micro"), col("rouge1_r_micro"),
        col("rouge1_f1_micro"), col("rouge2_p_micro"),
        col("rouge2_r_micro"), col("rouge2_f1_micro"),
        col("log_bleu2_micro"))
      .orderBy("grp")
  }
}
