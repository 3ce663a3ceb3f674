package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{EvalOps, EventOps, FeatureOps, Multimodal, TextOps, VectorOps}

/** Stats slice of [[LlmSurface]] — hypothesis tests, A/B analysis, agreement, sketches, calibration.
  *
  * r14 mechanical split, ZERO behavior change: query lambdas and their
  * DuckDB oracle SQL only. Every shared helper, constant, and CTE
  * generator stays in [[LlmSurface]] (reached via the wildcard import
  * below, which inner-scope-shadows functions._ exactly like the
  * original enclosing-object scope did).
  */
private[queries] object LlmStatsQueries {

  import LlmSurface._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- per-source KL drift vs the corpus blend -------------------------
    // Which sources speak a different unigram language than the mix?
    // The companion diagnostic to llm_source_overlap / mixture_weights;
    // integer micro-nat terms, vocab join AQE-decided.
    "llm_kl_drift" -> ((s, dir) => {
      TextOps.sourceKlDrift(Tables(s, dir, "documents"), "source", "text")
        .orderBy("source")
    }),

    // ---- exact two-sample Kolmogorov–Smirnov (X333) ------------------------
    // THE canonical distribution-equality test, exact where the drift
    // family's W1/PSI/KL are distances: D = max|F1 − F2| between the
    // lexicographically-first source's quality distribution and the
    // rest, computed CROSS-MULTIPLIED (|cum1·n2 − cum2·n1|, pure
    // integers — no ratio ever floats), argmax location ties to the
    // smaller value. The α=0.05 decision is exact rational arithmetic:
    // λ ≥ 1.358 ⟺ D_num²·10⁶ ≥ 1844164·n1·n2·(n1+n2) (1358² =
    // 1844164 — the constant is exactly representable, no folding
    // error possible). Cumulation runs over the DISTINCT-value
    // histogram (value-domain sized, the p_emd_drift discipline),
    // never over rows; decimal(38,0) keeps the decision products
    // exact at any corpus size.
    "llm_ks_test" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("source"), TextOps.words(col("text")).as("_w"))
        .select(col("source"),
          floor(TextOps.qualityScore(col("_w"), stopwords) * 1000000.0)
            .cast("long").as("s"))
      val s0 = d.agg(min("source").as("s0"))
      graft.operators.KsTest.ks2(
        d.crossJoin(broadcast(s0))
          .groupBy("s")
          .agg(sum(when(col("source") === col("s0"), 1L).otherwise(0L))
            .as("c1"),
            sum(when(col("source") =!= col("s0"), 1L).otherwise(0L))
              .as("c2")))
    }),

    // ---- ranking evaluation: exact ROC-AUC / AP / decile points (X257) ---
    // The curve readout the one-threshold confusion counts (X76/X193)
    // can't give: does a CHEAP single-marker score ("the" per-mille)
    // rank the expensive 5-stopword teacher gate well enough to
    // replace it, and at which decile cutoff? Score bins are per-mille
    // rates — a BOUNDED ≤1001-value domain, so every window in
    // rankEval runs over the bin histogram (X218 argument). AUC via
    // the exact doubled-rank Mann–Whitney identity, AP with
    // per-threshold precision floored to micro before the fold.
    "llm_rank_eval" -> ((s, dir) => {
      val ws = TextOps.words(col("text"))
      val scored = Tables(s, dir, "documents")
        .select(size(ws).as("n"),
          size(filter(ws, w => w === "the")).as("cthe"),
          size(filter(ws, w => w.isin("the", "a", "of", "to", "and")))
            .as("cstop"))
        .filter(col("n") > 0)
        .select(expr("(cthe * 1000) DIV n").as("bin"),
          (col("cstop") * 1000 >= col("n") * 61).as("pos"))
      FeatureOps.rankEval(scored, "bin", col("pos"))
    }),

    // ---- DSIR importance weighting (Xie et al. 2023) ---------------------
    // Score docs by hashed-unigram log-likelihood ratio target-vs-raw;
    // target = the 'en' subset (stand-in for any trusted domain). Both
    // bucket models come from ONE corpus pass, the log-ratio table is
    // 256 rows regardless of vocabulary growth, and per-bucket ratios
    // quantize to integer micro-nats before the per-doc sum.
    "llm_importance" -> ((s, dir) => {
      TextOps.importanceWeights(Tables(s, dir, "documents"),
          "doc_id", "text", col("lang") === "en", 256, "dsir")
        .withColumnRenamed("doc", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- McNemar paired-classifier comparison (X338) -----------------------
    // "Is the trained model actually BETTER than the heuristic on the
    // same documents?" — accuracy deltas mislead when the two share
    // most errors; McNemar (1947) tests exactly the DISAGREEMENT
    // cells: b = heuristic right where NB is wrong, c = the reverse,
    // χ²₁ = (b−c)²/(b+c) against 3.8416 decided in exact rational
    // arithmetic ((b−c)²·10⁴ ≥ 38416·(b+c); 196² = 38416). Gold is
    // the REAL lang column; the two classifiers are the repo's own
    // marker heuristic and the trained trigram NB (same-corpus fit,
    // as llm_langid_trained documents). Completes the eval pair with
    // kappa: kappa asks "do they agree", McNemar asks "who is right".
    "llm_mcnemar" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val nb = TextOps.naiveBayesLangId(docs, "doc_id", "text", "lang")
        .select(col("doc").as("doc_id"), col("correct").as("b_ok"))
      val heur = docs
        .select(col("doc_id"), col("lang"),
          TextOps.words(col("text")).as("_w"))
        .select(col("doc_id"),
          (TextOps.languageIdFromWords(col("_w"), langMarkers)
            === col("lang")).as("a_ok"))
      heur.join(nb, "doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("a_ok") && col("b_ok"), 1L).otherwise(0L))
            .as("n_both"),
          sum(when(!col("a_ok") && !col("b_ok"), 1L).otherwise(0L))
            .as("n_neither"),
          sum(when(col("a_ok") && !col("b_ok"), 1L).otherwise(0L))
            .as("n_b"),
          sum(when(!col("a_ok") && col("b_ok"), 1L).otherwise(0L))
            .as("n_c"))
        .select(col("n"), col("n_both"), col("n_neither"), col("n_b"),
          col("n_c"),
          when(col("n_b") + col("n_c") > 0,
            expr("((n_b - n_c) * (n_b - n_c) * 1000000) div (n_b + n_c)"))
            .otherwise(lit(0L)).as("chi2_micro"),
          (col("n_b") + col("n_c") > 0 &&
            expr("(n_b - n_c) * (n_b - n_c) * 10000")
              >= expr("38416 * (n_b + n_c)")).as("reject_05"))
    }),

    // ---- McNemar on the BOUNDED hashed-feature NB (X393) -------------------
    // llm_mcnemar with the scale-safe hashed-trigram model in the NB
    // seat: does bounding the feature space to 2^20 cells change the
    // model-vs-heuristic verdict? Same exact rational chi-square-1
    // decision; the model side is Heaps'-law immune by construction,
    // so this is the pairing a 100x corpus actually runs.
    "llm_mcnemar_hashed" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val nb = TextOps.naiveBayesLangIdHashed(docs, "doc_id", "text", "lang")
        .select(col("doc").as("doc_id"), col("correct").as("b_ok"))
      val heur = docs
        .select(col("doc_id"), col("lang"),
          TextOps.words(col("text")).as("_w"))
        .select(col("doc_id"),
          (TextOps.languageIdFromWords(col("_w"), langMarkers)
            === col("lang")).as("a_ok"))
      heur.join(nb, "doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("a_ok") && col("b_ok"), 1L).otherwise(0L))
            .as("n_both"),
          sum(when(!col("a_ok") && !col("b_ok"), 1L).otherwise(0L))
            .as("n_neither"),
          sum(when(col("a_ok") && !col("b_ok"), 1L).otherwise(0L))
            .as("n_b"),
          sum(when(!col("a_ok") && col("b_ok"), 1L).otherwise(0L))
            .as("n_c"))
        .select(col("n"), col("n_both"), col("n_neither"), col("n_b"),
          col("n_c"),
          when(col("n_b") + col("n_c") > 0,
            expr("((n_b - n_c) * (n_b - n_c) * 1000000) div (n_b + n_c)"))
            .otherwise(lit(0L)).as("chi2_micro"),
          (col("n_b") + col("n_c") > 0 &&
            expr("(n_b - n_c) * (n_b - n_c) * 10000")
              >= expr("38416 * (n_b + n_c)")).as("reject_05"))
    }),

    // ---- Theil's uncertainty coefficient, both directions (X398) -----------
    // The ASYMMETRIC categorical association the symmetric chi-square
    // family can't give: U(X|Y) = (H(X) − H(X|Y))/H(X) — "how much of
    // the source distribution does knowing the language explain", and
    // the reverse (Theil 1970). One corpus combine-agg reduces 100 TB
    // to the |langs|×|sources| cell grid; every entropy term is the
    // X61 micro-nat quantization floor(c·ln(tot/c)·10⁶ + 0.5) on
    // integer counts, and the final ratio is one toward-zero
    // decimal(38,0) division — ppm-exact cross-engine.
    "llm_theil_u" -> ((s, dir) => {
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val cells = Tables(s, dir, "documents")
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // metadata grid, four consumers below
      def direction(xCol: String, yCol: String, name: String) = {
        val n = cells.agg(sum("c").as("n"))
        val cx = cells.groupBy(xCol).agg(sum("c").as("cx"))
        val cy = cells.groupBy(yCol).agg(sum("c").as("cy"))
        val hx = cx.crossJoin(broadcast(n))
          .select(floor(col("cx")
            * log(col("n").cast("double") / col("cx"))
            * 1000000.0 + 0.5).cast("long").as("t"))
          .agg(sum("t").as("shx"))
        val hxy = cells.join(cy, yCol)
          .select(floor(col("c")
            * log(col("cy").cast("double") / col("c"))
            * 1000000.0 + 0.5).cast("long").as("t"))
          .agg(sum("t").as("shc"))
        hx.crossJoin(hxy)
          .select(lit(name).as("direction"),
            col("shx").as("h_x_micro"), col("shc").as("h_cond_micro"),
            when(col("shx") > 0,
              graft.llm.TextOps.truncDivDec(
                (dec(col("shx")) - dec(col("shc"))) * lit(1000000L),
                dec(col("shx"))).cast("long"))
              .otherwise(lit(0L)).as("u_ppm"))
      }
      direction("source", "lang", "source|lang")
        .unionAll(direction("lang", "source", "lang|source"))
        .orderBy("direction")
    }),

    // ---- Wilson score intervals on per-source pass rates (X369) ------------
    // The proportion CI that behaves at the extremes where the Wald
    // interval collapses (Wilson 1927; Brown-Cai-DasGupta's
    // recommendation): per source, the share of docs passing the
    // Gopher word-count gate (>= 50 words) with its 95% interval.
    // Exact integer construction: z and z² are folded micro literals
    // (1959964, 3841459); the sqrt term is isqrtDec of a once-floored
    // integer; ONE toward-zero division per bound. A source whose
    // LOWER bound clears a policy floor is safe to keep at any n —
    // the small-source honesty plain rates can't give.
    "p_wilson_ci" -> ((s, dir) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val z2 = 3841459L // z²·10⁶ at 95%
      val d = Tables(s, dir, "documents")
        .select(col("source"),
          (size(TextOps.words(col("text"))) >= 50).as("pass"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("k"))
      d.select(col("source"), col("n"), col("k"),
          expr("(k * 1000000) div n").as("rate_micro"),
          TextOps.isqrtDec(dec(lit(z2)) *
            (TextOps.floorDivDec(dec(col("k")) * dec(col("n") - col("k"))
              * lit(1000000L), dec(col("n")))
              + dec(lit(z2 / 4)))).as("_sq"))
        .select(col("source"), col("n"), col("k"), col("rate_micro"),
          // clamped to [0, rate] / [rate, 10⁶]: the floored sqrt can
          // read an exact-boundary bound one micro inside the point
          // rate (k = n reads 999999), and a CI that excludes its own
          // point estimate is a grid artifact, not a statistic
          least(col("rate_micro"), greatest(lit(0L), TextOps.truncDivDec(
            (dec(lit(2L)) * dec(col("k")) * lit(1000000L) + lit(z2)
              - lit(2L) * col("_sq")) * lit(1000000L),
            dec(lit(2L)) * (dec(col("n")) * lit(1000000L) + lit(z2)))
            .cast("long"))).as("lo_micro"),
          greatest(col("rate_micro"), least(lit(1000000L),
            TextOps.truncDivDec(
              (dec(lit(2L)) * dec(col("k")) * lit(1000000L) + lit(z2)
                + lit(2L) * col("_sq")) * lit(1000000L),
              dec(lit(2L)) * (dec(col("n")) * lit(1000000L) + lit(z2)))
              .cast("long"))).as("hi_micro"))
        .orderBy("source")
    }),

    // ---- chi-square uniformity audit of the hash split (X367) -------------
    // Is the md5 bucket assignment actually uniform on THIS corpus?
    // The GOF check every deterministic-split pipeline owes its
    // consumers: X² = Σ_b (100·o_b − n)²/(100·n) over the zero-filled
    // 100-bucket spine (cross-multiplied — no fractional expected
    // counts), decided against the driver-folded χ²(0.95, df=99)
    // micro literal 123225221 (no CDF in either engine). A skewed
    // split here would mean leaked doc_id structure in the hash.
    "p_hash_uniformity" -> ((s, dir) => {
      val occ = Tables(s, dir, "documents")
        .select(TextOps.hashBucket(col("doc_id"), "split").as("b"))
        .groupBy("b").agg(count(lit(1)).as("o"))
      val spine = s.range(100).select(col("id").cast("int").as("b"))
        .join(occ, Seq("b"), "left")
        .select(col("b"), coalesce(col("o"), lit(0L)).as("o"))
      val n = spine.agg(sum("o").as("n"))
      spine.crossJoin(broadcast(n)) // 1-row scalar join
        .select(col("n"),
          ((lit(100L) * col("o") - col("n"))
            * (lit(100L) * col("o") - col("n"))).as("d2"))
        .groupBy("n").agg(sum("d2").as("sd2"))
        .select(col("n"),
          expr("(sd2 * 1000000) div (100 * n)").as("x2_micro"))
        .withColumn("reject_05", col("x2_micro") >= lit(123225221L))
    }),

    // ---- Good-Turing count-of-counts / missing mass (X311) ----------------
    // p0 = N1/N (how much probability belongs to never-seen words) and
    // the Turing-adjusted counts r* = (r+1)N_{r+1}/N_r per r <= 10 —
    // the de-biasing every rare count gets before feeding an LM. Raw
    // estimates; SGT's log-log smoothing is one OLS over this table.
    "llm_good_turing" -> ((s, dir) => {
      val wc = Tables(s, dir, "documents")
        .select(explode(TextOps.words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("c"))
      graft.operators.GoodTuring.countOfCounts(wc, "c", maxR = 10)
    }),

    // ---- Heaps'-law vocab growth + Chao1 / Good-Turing richness ----------
    // "How much more vocabulary does more data buy": beta from the
    // md5-nested subsets (X197 discipline: micro-quantized ln, exact
    // int64 OLS), Chao1 bias-corrected richness and the GT unseen
    // mass from the (word -> min level, count) table that serves
    // every level at once.
    "llm_vocab_growth" -> ((s, dir) => {
      TextOps.vocabGrowth(Tables(s, dir, "documents"), "doc_id", "text")
    }),

    // ---- Zipf rank-frequency fit -----------------------------------------
    // The rank-domain companion to llm_vocab_growth: how frequency
    // MASS distributes over the vocabulary (natural text s ≈ 1; the
    // synthetic soup's near-flat s is the honest readout). One
    // tokenize pass to the vocab table; rank + micro-ln OLS on vocab
    // rows only.
    "llm_zipf_fit" -> ((s, dir) => {
      TextOps.zipfFit(Tables(s, dir, "documents"), "text")
    }),

    // ---- Welch two-sample A/B lift report --------------------------------
    // Per-event-type Welch t and Satterthwaite df for variant parity
    // user_id % 2 — the continuous-metric counterpart of llm_chi_square
    // (counts there, means here). Exact micro-unit moments in ONE
    // combine agg; doubles only at the |types|-row tail, in an
    // operation order the oracle spells identically. The synthetic
    // variants are exchangeable, so t hovers near 0 — the report
    // PROVES no effect, which is the correct answer for a parity split.
    "llm_ab_welch" -> ((s, dir) => {
      EventOps.abWelch(events(s, dir), "user_id", "event_type", "value")
        .orderBy("event_type")
    }),

    // ---- distribution-free median CI (order statistics) ------------------
    // Valid under any tail: ranks (n ∓ 1.96√n)/2 from ONE IEEE sqrt
    // of an exact integer, order statistics by histogram rank walk.
    "p_median_ci" -> ((s, dir) => {
      EventOps.medianCi(events(s, dir), "event_type", "value")
    }),

    // ---- referential-integrity orphan audit over the TPC-H star ----------
    // Per FK edge: child rows, null FKs, orphans (anti-join against
    // the distinct parent keys) and the orphan rate — the DQ check a
    // warehouse runs before trusting any star join. All seven edges
    // in one unioned plan, no driver counts.
    "p_fk_orphans" -> ((s, dir) => {
      def edge(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String) = {
        val orphans = child.select(col(ck).as("k"))
          .filter(col("k").isNotNull)
          .join(parent.select(col(pk).as("k")).distinct(), Seq("k"),
            "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        child.agg(count(lit(1)).as("n_child"),
            sum(when(col(ck).isNull, 1L).otherwise(0L)).as("n_null_fk"))
          .crossJoin(orphans)
          .select(lit(name).as("fk_edge"), col("n_child"),
            col("n_null_fk"), col("n_orphans"),
            TextOps.round6(col("n_orphans")
              / (col("n_child") - col("n_null_fk")).cast("double"))
              .as("orphan_rate"))
      }
      val li = Tables(s, dir, "lineitem"); val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer"); val n = Tables(s, dir, "nation")
      val su = Tables(s, dir, "supplier"); val p = Tables(s, dir, "part")
      val r = Tables(s, dir, "region")
      Seq(
        edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem.l_suppkey->supplier", li, "l_suppkey", su,
          "s_suppkey"),
        edge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
        edge("customer.c_nationkey->nation", c, "c_nationkey", n,
          "n_nationkey"),
        edge("supplier.s_nationkey->nation", su, "s_nationkey", n,
          "n_nationkey"),
        edge("nation.n_regionkey->region", n, "n_regionkey", r,
          "r_regionkey"))
        .reduce(_ unionByName _)
        .orderBy("fk_edge")
    }),

    // ---- Chao1 vocabulary richness (X340) ----------------------------------
    // The species-count complement to Good–Turing's missing MASS
    // (X311): how many distinct words does each source's vocabulary
    // still hide? Chao1 (1984): S_est = S_obs + f1²/(2f2), with the
    // bias-corrected f1(f1−1)/2 fallback when no doubletons exist —
    // the "is this source's vocabulary saturated" readout a crawl
    // scheduler reads. Exact integers: one floored division per
    // source; coverage = S_obs·10⁶ div S_est. Two combine aggs
    // (word counts → frequency-of-frequency), both skew-free.
    "llm_chao_richness" -> ((s, dir) => {
      val wc = Tables(s, dir, "documents")
        .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      wc.groupBy("source")
        .agg(count(lit(1)).as("s_obs"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
        .withColumn("s_est",
          when(col("f2") > 0,
            col("s_obs") + expr("(f1 * f1) div (2 * f2)"))
            .otherwise(col("s_obs") + expr("(f1 * (f1 - 1)) div 2")))
        .withColumn("coverage_micro",
          expr("(s_obs * 1000000) div greatest(s_est, 1)"))
        .orderBy("source")
    }),

    // ---- tie-aware Spearman rank correlation (X337) -----------------------
    // "Does quality rise with length" is a MONOTONE question
    // (operators/Spearman.scala): Pearson under-reads curvature, the
    // rank correlation nails it. Doubled tied ranks keep everything
    // integer; the sign-carried rho² is an EXACT rational (no sqrt
    // anywhere), rho_micro the familiar isqrt-denominated scale.
    "p_spearman" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(TextOps.words(col("text")).as("_w"))
        .select(size(col("_w")).cast("long").as("len"),
          floor(TextOps.qualityScore(col("_w"), stopwords) * 1000000.0)
            .cast("long").as("q"))
      graft.operators.Spearman.spearman(d, "len", "q")
    }),

    // ---- tie-aware Kendall tau-b per return flag (X345) -------------------
    // The PAIRWISE-order association lens (operators/KendallTau.scala)
    // next to Spearman's rank moments: tau is the probability-scale
    // "how often do two random line items agree in (quantity, price)
    // order". S accumulates from the JOINT value histogram (50
    // quantities x ~21 price buckets), so the pair sum is cells², not
    // rows² — the row count never enters the join.
    "p_kendall_tau" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") / 5000.0).cast("long").as("pb"))
      graft.operators.KendallTau.tauB(li, "flag", "qty", "pb")
        .withColumnRenamed("g", "flag")
    }),

    // ---- tie-corrected Kruskal-Wallis across event types (X346) -----------
    // The k-SAMPLE rank test (operators/KruskalWallis.scala): do the
    // five event types draw their values from one distribution?
    // Doubled tied ranks from the value histogram keep every moment
    // integer; the alpha = 0.05 decision compares against the shared
    // micro-floored chi-square(df = k-1) literal — no CDF evaluated in
    // either engine.
    "p_kruskal_wallis" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("event_type").as("t"),
          floor(col("value") * 1000.0).cast("long").as("v"))
      graft.operators.KruskalWallis.kw(ev, "t", "v")
    }),

    // ---- two-sample Cramer-von Mises, click vs view values (X347) ---------
    // The INTEGRATED-gap companion to llm_ks_test's max gap
    // (operators/CvmTest.scala, same paired-histogram input): many
    // small persistent CDF gaps move T where KS's single max barely
    // reads them. Pure integers until one final floored micro
    // division; rejection is an exact cross-multiplied compare
    // against the asymptotic 5% point 0.46136.
    "p_cvm_drift" -> ((s, dir) => {
      val d = events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type").as("t"),
          floor(col("value") * 1000.0).cast("long").as("s"))
      graft.operators.CvmTest.cvm2(
        d.groupBy("s")
          .agg(sum(when(col("t") === "click", 1L).otherwise(0L)).as("c1"),
            sum(when(col("t") === "view", 1L).otherwise(0L)).as("c2")))
    }),

    // ---- Cochran-Armitage error-rate trend across hour buckets (X356) -----
    // The BINARY-outcome trend next to p_jonckheere's continuous one
    // (operators/CochranArmitage.scala): does the error RATE rise
    // through the day? One df spent on the monotone contrast; the z²
    // is a pure-integer cross-multiplication against chi-square(1).
    "p_cochran_armitage" -> ((s, dir) => {
      val d = events(s, dir)
        .select(expr("hour(ts) div 4").as("g"),
          (col("event_type") === "error").as("err"))
      graft.operators.CochranArmitage.trend(d, "g", "err")
    }),

    // ---- Friedman repeated-measures rank test (X353) ----------------------
    // The within-BLOCK rank test (operators/Friedman.scala) next to
    // Kruskal-Wallis's pooled ranks: do the five event types keep the
    // same daily-revenue ORDER day after day? Ranking within each day
    // cancels day-level traffic waves that would drown the pooled
    // test. Complete blocks only (dropped count reported), doubled
    // tied ranks, term-floored micro grid, shared chi-square literal.
    "p_friedman" -> ((s, dir) => {
      val cells = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_type").as("t"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .groupBy("day", "t").agg(sum("cents").as("v"))
      graft.operators.Friedman.test(cells, "day", "t", "v")
    }),

    // ---- group-sequential A/B monitoring (O'Brien-Fleming) ---------------
    // The peeking-correct daily readout: 5 scheduled looks at 6-day
    // spacing, crossing decided by EXACT integer cross-multiplication
    // (no CDF, no sqrt); the planted error effect must cross early,
    // null metrics never. Displayed z² derives from the same exact
    // integers.
    "llm_ab_sequential" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("value",
        when(col("user_id") % 2 === 1 && col("event_type") === "error",
          col("value") + 25.0).otherwise(col("value")))
      EventOps.obfSequential(ev, "user_id", "event_type", "ts", "value",
        looks = 5, lookDays = 6)
    }),

    // ---- PSI score-drift monitor (reference-frozen deciles) --------------
    // The model-monitoring drift alarm: deciles frozen from the first
    // half of the period, PSI of the second half against them, all
    // integer ppm with one micro-floored ln per bin. A +25 shift is
    // planted on late-period error values — error must alarm, the
    // rest read their honest stability.
    "p_psi_drift" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("value",
        when(col("event_type") === "error"
            && to_date(col("ts")) > to_date(lit("2024-01-15")),
          col("value") + 25.0).otherwise(col("value")))
      EventOps.psiDrift(ev, "event_type", "ts", "value",
        splitDate = "2024-01-15", bins = 10)
    }),

    // ---- Horvitz-Thompson estimate from the Neyman design (X277) ---------
    // The survey-sampling loop CLOSED: X268's allocation at budget
    // 200 (so sampling is real, not a census), an md5-ranked
    // deterministic draw per stratum, and the HT token-total estimate
    // reported AGAINST the truth per stratum and overall — the audit
    // a sampling pipeline runs before trusting its extrapolations.
    "llm_ht_estimate" -> ((s, dir) => {
      TextOps.htTokenEstimate(Tables(s, dir, "documents"), "source",
        "doc_id", "text", budget = 200, salt = "ht")
    }),

    // ---- inter-rater agreement over the quality gates (X278) -------------
    // Three deterministic binary "raters" (length, stopword-rate,
    // type-token-ratio gates) judged per doc; Cohen's kappa per pair +
    // Fleiss over all three says how much the gates agree BEYOND the
    // chance level their own marginals imply — the audit that
    // separates "three gates, one signal" from genuinely independent
    // quality judges. All ratios exact-integer, quantized once.
    "llm_rater_kappa" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .withColumn("_w", TextOps.words(col("text")))
      EvalOps.raterKappa(d, Seq(
        "len" -> (col("n_chars") >= 250),
        "stop" -> (size(filter(col("_w"),
          w => w.isin("the", "a", "of", "to", "in"))) * 10
          <= size(col("_w"))),
        "ttr" -> (size(array_distinct(col("_w"))) * 5
          >= size(col("_w")) * 2)))
    }),

    // ---- Krippendorff's alpha with missing ratings (X310) ----------------
    // The agreement coefficient kappa can't be: each synthetic rater
    // abstains on a deterministic doc_id stratum (real annotation
    // queues route docs to rater subsets), units with < 2 ratings
    // drop, and alpha pairs whatever each unit actually has —
    // lcm-scaled exact integers, one signed division through round6.
    "llm_kripp_alpha" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .withColumn("_w", TextOps.words(col("text")))
      EvalOps.krippAlpha(d, "doc_id", Seq(
        ("len", col("n_chars") >= 250, col("doc_id") % 5 =!= 0),
        ("stop", size(filter(col("_w"),
          w => w.isin("the", "a", "of", "to", "in"))) * 10
          <= size(col("_w")), col("doc_id") % 7 =!= 0),
        ("ttr", size(array_distinct(col("_w"))) * 5
          >= size(col("_w")) * 2, col("doc_id") % 3 =!= 0)))
    }),

    // ---- Shapley attribution of vocab coverage to sources (X279) ---------
    // Exact game-theoretic mixture credit WITHOUT 2^20 coalition
    // evaluations: the coverage game's Shapley value collapses to
    // sum over a source's words of 1/(number of sources sharing the
    // word), carried as exact lcm(1..20)-scaled integers. The
    // per-source rows sum to vocab*lcm by the efficiency axiom.
    "llm_shapley_coverage" -> ((s, dir) =>
      EvalOps.shapleyCoverage(Tables(s, dir, "documents"), "source",
        "text")),

    // ---- full analytic-rank window family (X302) -------------------------
    // The four SQL rank analytics the surface had not yet exercised —
    // rank/dense_rank (ties), percent_rank, cume_dist, ntile(4), and
    // partition-wide nth_value(2) — over customers per nation by
    // balance. Deterministic BECAUSE the window order is total
    // (cents desc, custkey): ntile and nth_value are engine-ambiguous
    // only under ties, which a total order removes (the p_rfm lesson,
    // inverted). percent_rank/cume_dist are single exact-int divisions
    // -> identical IEEE doubles, round6-pinned.
    "p_window_ranks" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("nation").orderBy(col("bal_cents").desc, col("c_custkey"))
      val wAll = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables(s, dir, "customer")
        .select(col("c_nationkey").as("nation"), col("c_custkey"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("prank", TextOps.round6(percent_rank().over(w)))
        .withColumn("cdist", TextOps.round6(cume_dist().over(w)))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("second_bal",
          nth_value(col("bal_cents"), 2).over(wAll))
        .orderBy("nation", "rnk", "c_custkey")
    }),

    // ---- Bradley-Terry source ranking from pairwise outcomes (X280) ------
    // Head-to-head win rates can cycle (A>B>C>A); the BT fit is the
    // principled transitive aggregate. Matches come from a
    // deterministic md5-bucketed round-robin: docs pair with their
    // md5-order neighbor within a bucket, longer text wins (doc_id
    // breaks ties), same-source games are discarded. 15 MM rounds,
    // three integer floors per round, replayed by the oracle.
    "llm_bradley_terry" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("_h", conv(substring(md5(concat(lit("bt|"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"))
        .withColumn("_b", pmod(col("_h"), lit(16L)))
      val w = Window.partitionBy("_b").orderBy(col("_h"), col("doc_id"))
      val r = d.withColumn("_rn", row_number().over(w))
        .withColumn("_oid", lead("doc_id", 1).over(w))
        .withColumn("_osrc", lead("source", 1).over(w))
        .withColumn("_olen", lead("n_chars", 1).over(w))
      val aWins = col("n_chars") > col("_olen") ||
        (col("n_chars") === col("_olen") && col("doc_id") < col("_oid"))
      val m = r.filter(col("_rn") % 2 === 1 && col("_oid").isNotNull
          && col("source") =!= col("_osrc"))
        .select(
          when(aWins, col("source")).otherwise(col("_osrc")).as("winner"),
          when(aWins, col("_osrc")).otherwise(col("source")).as("loser"))
      EvalOps.bradleyTerry(m, "winner", "loser", rounds = 15)
    }),

    // ---- MAD robust scale + robust-z outlier census (X275) ---------------
    // The 50%-breakdown scale for the heavy-tail regime where
    // sigma-based rules are circular: median and MAD via histogram
    // rank walks, the 3*1.4826 threshold folded to the integer
    // cross-multiplication |c-med|*10^4 > 44478*MAD — no float
    // boundary anywhere.
    "llm_mad_outliers" -> ((s, dir) => {
      EventOps.madOutliers(events(s, dir), "event_type", "value")
    }),

    // ---- Cochran-Mantel-Haenszel stratified test + MH odds ratio (X273) --
    // The estimate the Simpson audit (llm_simpson_audit) says to
    // compute instead of the pooled table: per-dow 2x2 conversion
    // tables, each stratum's E/V/OR terms floored once to micro, one
    // exact division each for the CMH chi-square and the pooled odds
    // ratio; verdict against the constant-folded chi2_1(0.95).
    "llm_ab_cmh" -> ((s, dir) => {
      EventOps.cmhStratified(events(s, dir), "user_id", "ts",
        col("event_type") === "purchase")
    }),

    // ---- Wald SPRT daily trajectory, three hypothesis pairs (X269) -------
    // Fully-sequential purchase-rate monitoring: every ln constant
    // folded to integer micro ON THE DRIVER and shared verbatim with
    // the oracle. Bracketing hypotheses (0.19/0.21) wander forever —
    // the honest "truth is between them" readout; far-below (0.10/
    // 0.12) accepts H1 immediately; far-above (0.30/0.32) accepts H0.
    "llm_ab_sprt" -> ((s, dir) => {
      EventOps.sprtTrajectory(events(s, dir), "ts",
        col("event_type") === "purchase", sprtScenarios)
    }),

    // ---- Neyman sampling allocation with exact apportionment (X268) ------
    // "1000 audit slots across 20 sources": n_h ∝ N_h·σ_h (σ of token
    // count, micro-floored integer sqrt) vs the proportional baseline,
    // both turned into integers by largest-remainder apportionment —
    // Σ alloc = 1000 EXACTLY, and the Neyman-vs-proportional gap
    // shows where variance concentrates.
    "llm_neyman_alloc" -> ((s, dir) => {
      TextOps.neymanAllocation(Tables(s, dir, "documents"), "source",
        size(TextOps.words(col("text"))), budget = 1000)
    }),

    // ---- quantile treatment effects: per-decile arm contrast (X267) ------
    // WHERE in the distribution the arms differ, not just whether the
    // mean moved: v_q(arm1) - v_q(arm0) at each decile, every decile
    // an order statistic walked from the cents histogram (10*cum >=
    // q*n integer clearing). On the parity split the profile hovers
    // near 0 — the correct null readout.
    "llm_ab_qte" -> ((s, dir) => {
      EventOps.quantileTreatmentEffects(events(s, dir), "user_id",
        "event_type", "value")
    }),

    // ---- robust A/B location panel: trimmed + winsorized means (X266) ----
    // Per (metric, arm): mean, 10%-trimmed mean, winsorized mean —
    // all exact from histogram order-statistic walks (no corpus
    // sort), the capped-metric practice between the whale-owned mean
    // and the magnitude-blind median. Three-way disagreement = the
    // contrast is a tail story.
    "llm_ab_robust" -> ((s, dir) => {
      EventOps.robustAbMeans(events(s, dir), "user_id", "event_type",
        "value")
    }),

    // ---- exact Wasserstein-1 value drift, pre vs post split (X264) -------
    // The magnitude-sensitive drift number the PSI/KL overlap family
    // can't give: W1 = integral |F1 - F2| summed EXACTLY over the
    // cents histogram (cross-multiplied CDFs in decimal, one division
    // at the end). Same planted late-period error shift as
    // p_psi_drift (+25.0): W1 must read ~= 25 currency units on
    // 'error' — the distance IS the shift size — while stable metrics
    // sit near 0.
    "p_emd_drift" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("value",
        when(col("event_type") === "error"
            && to_date(col("ts")) > to_date(lit("2024-01-15")),
          col("value") + 25.0).otherwise(col("value")))
      EventOps.emdDrift(ev, "event_type", "value", "ts",
        splitDate = "2024-01-16")
    }),

    // ---- Hill tail-index estimator (heavy-tail diagnostic) ---------------
    // α ≤ 2 means infinite variance and the moment-based tests are
    // lying; top-(k+1) order statistics from the value histogram
    // (no corpus sort), ln micro-floored per distinct value, exact
    // tie handling across the k-th boundary.
    "llm_tail_index" -> ((s, dir) => {
      EventOps.hillTailIndex(events(s, dir), "event_type", "value", k = 100)
    }),

    // ---- experiment power analysis (MDE / required n per arm) ------------
    // CDF-free by constant folding: z constants enter as the exact
    // ratio 784/100, so n/arm = ceil(2·784·σ²/(100·δ²)) is pure
    // integer arithmetic over micro-unit moments. One combine-agg to
    // |metrics| rows.
    "llm_power_analysis" -> ((s, dir) => {
      EventOps.powerAnalysis(events(s, dir), "event_type", "value",
        mdePct = 5)
    }),

    // ---- Simpson's-paradox audit over the A/B panel ----------------------
    // The aggregation-reversal detector: per metric, the pooled arm
    // contrast vs every day-of-week stratum's contrast, all as exact
    // division-free cross products. Reversal fires only on the strict
    // textbook pattern (pooled one way, every informative stratum the
    // other).
    "llm_simpson_audit" -> ((s, dir) => {
      EventOps.simpsonAudit(events(s, dir), "user_id", "event_type",
        (dayofweek(to_date(col("ts"))) + 1).cast("int"), "value")
    }),

    // ---- permutation-test panel + Benjamini–Hochberg FDR -----------------
    // The multiple-testing closure of the A/B family: all 5 metrics
    // tested at once with EXACT rational permutation p-values (no
    // t/normal CDF — transcendentals are not bit-stable cross-engine)
    // and the BH step-up as a pure-integer comparison. One corpus pass
    // fans each row to the observed + 63 md5 user-relabelings; a
    // planted +25 shift on arm-1 error events makes one true effect.
    "llm_ab_fdr" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("value",
        when(col("user_id") % 2 === 1 && col("event_type") === "error",
          col("value") + 25.0).otherwise(col("value")))
      EventOps.permutationFdr(ev, "user_id", "event_type", "value",
        perms = 63)
    }),

    // ---- Mondrian split conformal prediction intervals -------------------
    // Distribution-free per-type intervals with a finite-sample
    // coverage guarantee: md5-parity calibration split, lower-median
    // point predictor, q̂ = ⌈(n+1)·0.9⌉-th smallest |v−pred|, achieved
    // test coverage reported. Both order statistics walk value-DOMAIN
    // histograms — nothing corpus-sized is ever sorted.
    "llm_conformal" -> ((s, dir) => {
      graft.llm.FeatureOps.conformalInterval(events(s, dir), "event_type",
        "event_id", "value", alphaPct = 10, salt = "conf")
        .orderBy("event_type")
    }),

    // ---- difference-in-differences over the user panel -------------------
    // The rollout estimator when assignment is NOT randomized: the
    // treated arm's pre/post change minus control's, netting out any
    // pre-existing gap (parallel trends). 2x2 cell moments in exact
    // decimals; one sqrt for the independent-samples SE.
    "llm_ab_did" -> ((s, dir) => {
      EventOps.abDiffInDiff(events(s, dir), "user_id", "ts", "value",
        "2024-01-16")
    }),

    // ---- delete-one-bucket jackknife for the click/view ratio ------------
    // The ratio-metric SE done right (users, not events, are the
    // randomization unit): 32 hash buckets, pseudo-ratios floored to
    // micro, exact integer SE^2, jackknifed z for the arm difference.
    "llm_ratio_jackknife" -> ((s, dir) => {
      EventOps.ratioJackknife(events(s, dir), "user_id", "event_type",
        numType = "click", denType = "view", buckets = 32)
    }),

    // ---- CUPED variance reduction (Deng et al. WSDM'13) ------------------
    // Each user's experiment-half metric adjusted by their own
    // pre-period metric with the pooled theta; var_raw vs var_adj is
    // the sensitivity the platform buys. All adjusted values are pure
    // int64 arithmetic after a single floored theta/xbar — the oracle
    // replays the second moments bit-for-bit.
    "llm_ab_cuped" -> ((s, dir) => {
      EventOps.abCuped(events(s, dir), "user_id", "ts", "value",
        "2024-01-16")
    }),

    // ---- Poisson-bootstrap CI for the per-type mean value ----------------
    // One-pass bootstrap (Chamandy et al. 2012): 32 deterministic
    // Poisson(1) replicate weights per row from md5 against integer
    // ⌊cdf·2⁴⁸⌋ thresholds — the weight never touches a float. The ×32
    // explode collapses in map-side combine (shuffle carries |types|·32
    // rows); the CI is a percentile over 32 round6-pinned replicate
    // means.
    "llm_bootstrap_ci" -> ((s, dir) => {
      EventOps.poissonBootstrapCi(events(s, dir), "event_id", "event_type",
        "value", reps = 32, salt = "boot-v1").orderBy("event_type")
    }),

    // ---- grid-bucketed proximity join (spatial LSH analog) ---------------
    // All embedding pairs within L2 distance 40 milli-units in the
    // first-two-dims plane, via the cell trick: equi-join home cells
    // against a 3×3 neighbor explode — n² never materializes, the
    // id<id_b cut dedupes the double generation, and the distance test
    // is exact integer dist². Oracle is the BRUTE-FORCE all-pairs
    // filter, proving the grid candidates lossless.
    // ---- exact Gini decision stump on the embedding feature (X366) --------
    // The CART primitive found bit-exactly from histograms
    // (operators/GiniStump.scala, the LightGBM histogram-trick
    // kernel): which threshold on quantized dim-0 best separates the
    // labels. The purity-mass scale is shared with the parent so
    // `purifies` is an honest exact comparison.
    "llm_stump_split" -> ((s, dir) => {
      val d = Tables(s, dir, "embeddings").select(
        floor(element_at(col("embedding"), 1).cast("double") * 1000.0)
          .cast("long").as("x"),
        col("label").cast("long").as("y"))
      graft.operators.GiniStump.bestSplit(d, "x", "y")
    }),

    // ---- WOE / information-value feature screening -----------------------
    // Weight-of-evidence deciles of a PLANTED signal: error events'
    // value is shifted +20 (both engines), so top bins enrich in the
    // bad label and the IV contributions show a real feature. Bin
    // membership is VALUE-based (ties share a bin — an ntile spelling
    // would tie-break per engine); WOE is ln of add-half-smoothed exact
    // count ratios, round6 per bin; per-bin IV is emitted, the reader
    // folds (the chi-square rule).
    "llm_woe_iv" -> ((s, dir) => {
      val ev = events(s, dir).filter(col("value").isNotNull)
        .withColumn("feature",
          when(col("event_type") === "error", col("value") + 20.0)
            .otherwise(col("value")))
      graft.llm.FeatureOps.woeIv(ev, "feature",
        col("event_type") === "error", bins = 10)
        .orderBy("bin")
    }),

    // ---- ε-differentially-private noised count release -------------------
    // Laplace(1/ε) counts per (lang, source) with DETERMINISTIC
    // inverse-CDF noise from md5(salt|group): one draw per group fixed
    // by the release-epoch salt, so re-running never averages fresh
    // noise over the true count (the repeated-query attack on naive
    // re-randomization). n_true is the audit surface; production
    // publishes `released` only.
    "llm_dp_release" -> ((s, dir) => {
      graft.llm.FeatureOps.dpNoisedCounts(Tables(s, dir, "documents"),
        Seq("lang", "source"), epsilon = 1.0, salt = "dp-epoch-1")
        .orderBy("lang", "source")
    }),

    // ---- quantile (rank) normalization -----------------------------------
    // Mid-rank fractional position from the micro-value histogram:
    // counts are exact integers, the prefix window runs over the
    // |distinct-values| aggregate (domain-bounded, not corpus-bounded),
    // and the corpus is touched by one agg + one equi-join back.
    "llm_quantile_norm" -> ((s, dir) => {
      graft.llm.FeatureOps.quantileNormalize(events(s, dir), "event_id",
        "value").orderBy("event_id")
    }),

    // ---- vocabulary JSD drift between corpus halves ----------------------
    // Per-term Jensen-Shannon contributions in integer NANO-units (the
    // bigram-LM pinning discipline at a finer grain — contributions sit
    // at 1e-4..1e-7); a planted "newslang" token on part of the odd
    // half exercises the absent-from-A zero guard with a real drift
    // term. The reader folds the scalar (the chi-square rule).
    "llm_vocab_jsd" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").withColumn("text2",
        when(col("doc_id") % 10 === 1, concat(col("text"), lit(" newslang")))
          .otherwise(col("text")))
      TextOps.vocabJsd(
        d.filter(col("doc_id") % 2 === 0).select(col("text2").as("text")),
        d.filter(col("doc_id") % 2 === 1).select(col("text2").as("text")),
        "text")
        .orderBy("term")
    }),

    // ---- chi-square contingency cells (corpus-composition audit) ---------
    // Independence test between lang and source: per-cell observed
    // count, expected count under independence (row·col/total), and
    // chi-square contribution — the "is my corpus mix confounded"
    // audit. ZERO cells are included via the marginal scaffold (the
    // dense-grid pattern: the cross join is |langs|×|sources|,
    // metadata-sized). Per-cell output deliberately — summing the
    // statistic would order doubles across partitions; the cells are
    // exact-count-derived and round6-pinned, the reader sums 100 rows.
    "llm_chi_square" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select("lang", "source")
      val cells = d.groupBy("lang", "source").agg(count(lit(1)).as("n_xy"))
      val rowm = d.groupBy("lang").agg(count(lit(1)).as("n_x"))
      val colm = d.groupBy("source").agg(count(lit(1)).as("n_y"))
      val tot = d.agg(count(lit(1)).as("n"))
      val e = col("n_x").cast("double") * col("n_y") / col("n")
      val dev = col("n_xy").cast("double") - e
      rowm.crossJoin(broadcast(colm)).crossJoin(broadcast(tot))
        .join(cells, Seq("lang", "source"), "left")
        .withColumn("n_xy", coalesce(col("n_xy"), lit(0L)))
        .select(col("lang"), col("source"), col("n_xy"),
          TextOps.round6(e).as("expected"),
          TextOps.round6(dev * dev / e).as("contribution"))
        .orderBy("lang", "source")
    }),

    // ---- rank normalization via histogram CDF (no global sort) -----------
    // Percentile-transform every doc's quality score WITHOUT percent_rank
    // (whose window is one global sort — the single-partition collapse
    // the token-budget op already rejects). Milli-quality histogram
    // (≤1001 rows) → CDF over the BOUNDED histogram → broadcast join
    // back. Midrank convention ((below + 0.5·at)/n) so ties share a
    // value and the transform is engine-order-independent.
    "llm_rank_normalize" -> ((s, dir) => {
      val win = org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("_w"))
        .select(col("doc_id"),
          floor(TextOps.qualityScore(col("_w"), stopwords) * 1000)
            .cast("long").as("q_mq"))
      val hist = d.groupBy("q_mq").agg(count(lit(1)).as("_n"))
      val below = win.orderBy(col("q_mq"))
        .rowsBetween(win.unboundedPreceding, -1)
      val cdf = hist.withColumn("_below",
        coalesce(sum("_n").over(below), lit(0L)).cast("long"))
      val tot = hist.agg(sum("_n").cast("long").as("_tn"))
      d.join(broadcast(cdf), "q_mq")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("q_mq"),
          TextOps.round6((col("_below") + lit(0.5) * col("_n"))
            / col("_tn").cast("double")).as("rank_pct"))
        .orderBy("doc_id")
    }),

    // ---- per-dimension outlier clipping (σ-winsorization report) ---------
    // Bounds evaluated in exact integer space (n·q vs S ± nσ·√(nQ−S²))
    // so boundary rows land identically in both engines — interpolated
    // percentiles are rejected for last-ulp cross-engine wobble.
    "llm_outlier_clip" -> ((s, dir) => {
      VectorOps.outlierClip(Tables(s, dir, "embeddings"), "embedding",
        nSigma = 2.0)
        .orderBy("dim")
    }),

    // ---- incremental aggregate maintenance (mergeable monoid state) ------
    // state(base) merged with state(delta) must equal state(full) — the
    // oracle recomputes from the full corpus, so the hash match IS the
    // proof of the monoid identity cross-engine. Nightly cost becomes
    // O(|delta|) instead of O(|corpus|).
    "llm_incr_agg" -> ((s, dir) => {
      import graft.operators.IncrementalAgg._
      val docs = Tables(s, dir, "documents")
      val base = docs.filter(col("doc_id") % 4 =!= 0)
      val delta = docs.filter(col("doc_id") % 4 === 0)
      withDerived(mergeStates(Seq(
        state(base, "source", "doc_id", "n_chars"),
        state(delta, "source", "doc_id", "n_chars"))))
        .orderBy("key")
    }),

    // ---- group-aware k-fold cross-validation (X198) ----------------------
    // The variance-estimation companion to llm_leakage_split: folds key
    // on the near-dup GROUP representative (no paraphrase straddles a
    // train-complement/eval boundary), and the k leave-one-fold-out
    // unigram LMs cost ONE corpus pass via the complement trick
    // (model_f = column_total − counts_f on the k×256 table).
    "llm_cv_folds" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = TextOps.simHashNearDup(docs, "doc_id", "text",
        maxHamming = 3, chunks = 4)
      val labels = graft.operators.ConnectedComponents
        .alternatingStars(pairs, "doc_a", "doc_b")
        .withColumnRenamed("node", "doc_id")
      val withRep = docs.join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), col("text"),
          coalesce(col("label"), col("doc_id")).as("group_rep"))
      TextOps.cvFoldsLm(withRep, "doc_id", "text", "group_rep",
        k = 5, buckets = 256, foldSalt = "cvf")
    }),

    // ---- data scaling-law estimation (X197) ------------------------------
    // Held-out unigram-LM cross-entropy at nested 1/8..1× training
    // subsets + log-log OLS slope — the data-scaling exponent
    // (Hestness'17/Kaplan'20 shape) a curation team reads before
    // buying more data. One tokenize pass: subsets share a cumulated
    // (level, bucket) count table; ln only ever touches the 4×256-row
    // model; OLS moments are exact int64.
    "llm_scaling_law" -> ((s, dir) => {
      TextOps.scalingLawFit(Tables(s, dir, "documents"), "doc_id", "text",
        buckets = 256, lvlSalt = "lvl", hoSalt = "ho")
    }),

    // ---- classifier score calibration + reliability/ECE (X196) -----------
    // The post-training step llm_classifier_train doesn't cover: raw
    // margins → probabilities via a 2-parameter integer hard-sigmoid
    // Platt fit (8 GD rounds, damped-Newton steps, region-masked
    // gradients), then the reliability diagram and before/after ECE.
    // Scores are the SAME (feat/wgt, 1024-bucket) table llm_classifier
    // ships; the teacher label is the same stopword rule
    // llm_classifier_train distills. Oracle replays all 8 rounds.
    "llm_calibration" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val feats = TextOps.hashedFeatures(docs, "doc_id", "text", 1024, "feat")
      val z = feats.join(TextOps.hashModelWeights(s, 1024, "wgt"), "b")
        .groupBy("doc")
        .agg(floor(sum(col("c") * col("wt")).cast("double") / sum("c"))
          .cast("long").as("z"))
      val ws = TextOps.words(col("text"))
      val y = docs.select(col("doc_id").as("doc"),
        when(size(filter(ws, w => w.isin("the", "a", "of", "to", "and")))
          * 1000 >= lit(61) * size(ws), 1L).otherwise(0L).as("y"))
      TextOps.calibrateScores(z.join(y, "doc"), rounds = 8,
        lrDivA = 5L, lrDivB = 250L, clipA = 100000L, clipB = 2000L)
    }),

    // ---- isotonic calibration via the minimax identity (X224) ------------
    // Same logits and labels as llm_calibration, the non-parametric
    // calibrator instead of Platt: iso_i = max_{j<=i} min_{k>=i}
    // mean(j..k) replaces the sequential PAVA stack with metadata
    // joins; micro-quantized interval means cannot break monotonicity
    // (the identity is monotone for any matrix), only move ties.
    "llm_isotonic" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val feats = TextOps.hashedFeatures(docs, "doc_id", "text", 1024, "feat")
      val z = feats.join(TextOps.hashModelWeights(s, 1024, "wgt"), "b")
        .groupBy("doc")
        .agg(floor(sum(col("c") * col("wt")).cast("double") / sum("c"))
          .cast("long").as("z"))
      val ws = TextOps.words(col("text"))
      val y = docs.select(col("doc_id").as("doc"),
        when(size(filter(ws, w => w.isin("the", "a", "of", "to", "and")))
          * 1000 >= lit(61) * size(ws), 1L).otherwise(0L).as("y"))
      TextOps.isotonicCalibrate(z.join(y, "doc"), bins = 16)
    }),

    // ---- IPF raking of mixture weights to joint marginals (X195) ---------
    // Deming–Stephan iterative proportional fitting over the
    // (source × lang) token contingency table: 5 rounds of alternating
    // marginal scaling toward UNIFORM source AND lang token shares —
    // the joint constraint the one-shot X70 temperature weights can't
    // express. Corpus touched ONCE (the cell-table agg); the iteration
    // runs on the |S|×|L| table in exact integer micro-units (bigint
    // `div`, never float — intermediates exceed 2^53). Oracle replays
    // all 5 rounds as unrolled MATERIALIZED CTEs.
    "llm_ipf_raking" -> ((s, dir) => {
      TextOps.ipfRaking(Tables(s, dir, "documents"), "source", "lang",
        "text", rounds = 5)
    }),

    // ---- self-join size forecast from key statistics (X205) --------------
    // The planner/AQE number behind every salting and cluster-sizing
    // decision: predict |events ⋈ events ON user_id| = Σ f_u² from
    // SKETCH-sized statistics — exact counts for the top-16 heavy keys
    // plus a (row count, NDV) pair for the residual under the uniformity
    // assumption (the System-R estimator with a heavy-hitter patch; the
    // X143 skew profile DESCRIBES the skew, this turns it into the
    // forecast). Statistics cost one combine-agg pass; the forecast is
    // arithmetic on 17 numbers. The exact Σ f_u² is computed from the
    // same frequency table (never by materializing the join), so the
    // err_ppm row audits the estimator honestly at any scale. All
    // integer (div), bit-stable cross-engine.
    "p_join_forecast" -> ((s, dir) => {
      val f = Tables(s, dir, "events").groupBy("user_id")
        .agg(count(lit(1)).as("f")).localCheckpoint(true)
      val heavy = f.orderBy(col("f").desc, col("user_id")).limit(16)
        .localCheckpoint(true)
      val hs = heavy.agg(sum(col("f") * col("f")).as("hv"),
        sum("f").as("hn"), count(lit(1)).as("hd"))
      val tot = f.agg(sum(col("f") * col("f")).as("exact"),
        sum("f").as("n"), count(lit(1)).as("d"))
      val summary = tot.crossJoin(hs)
        .withColumn("est", col("hv") +
          expr("case when d - hd > 0 then ((n - hn) * (n - hn)) div (d - hd) else 0 end"))
        .select(array(
          struct(lit("exact").as("part"), lit(-1L).as("key"),
            col("exact").as("value")),
          struct(lit("estimate").as("part"), lit(-1L).as("key"),
            col("est").as("value")),
          struct(lit("err_ppm").as("part"), lit(-1L).as("key"),
            expr("abs(est - exact) * 1000000 div exact").as("value")))
          .as("rows"))
        .select(explode(col("rows")).as("r"))
        .select(col("r.part"), col("r.key"), col("r.value"))
      heavy.select(lit("heavy_key").as("part"), col("user_id").as("key"),
          col("f").as("value"))
        .unionByName(summary)
        .orderBy("part", "key")
    }),

    // ---- sort-key / RLE encoding advisor (X209) --------------------------
    // Prices candidate single-key layouts for the lineitem rewrite:
    // exact RLE run counts for each (sort key, column) pair WITHOUT a
    // global data sort (the Σ ndv_k − boundary-merges decomposition —
    // one groupBy pass per key, lag window over the |K|-row metadata
    // only). The K=C diagonal self-checks runs = ndv. Complements X110
    // z-order (multi-column) with the single-key alternatives.
    "p_sortkey_advisor" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      graft.operators.EncodingAdvisor.rleAdvisor(li,
        keys = Seq(
          "l_returnflag" -> col("l_returnflag"),
          "ship_month" -> month(col("l_shipdate")),
          "l_suppkey" -> col("l_suppkey")),
        targets = Seq(
          "l_returnflag" -> col("l_returnflag"),
          "l_linestatus" -> col("l_linestatus"),
          "l_quantity" -> col("l_quantity"),
          "l_suppkey" -> col("l_suppkey")))
    }),

    // ---- multi-source truth discovery by trust-weighted voting (X321) -----
    // Data fusion (Yin et al. TruthFinder; Dong et al. — see
    // operators/TruthVote.scala): three synthetic crawls claim each
    // customer's nation, each corrupted on its own deterministic
    // stratum (id%7 / id%5 / id%3 — so crawl_c is the least reliable).
    // Round 1: unweighted majority per entity (ties to the smaller
    // value). Round 2: source trust = claims matching the round-1
    // consensus, votes reweighted by trust, consensus re-drawn.
    // Output: one row per source — claim count, consensus agreement
    // before/after the reweight, and accuracy against the held truth
    // (match_r1 IS the trust weight, so it is not repeated).
    "llm_truth_vote" -> ((s, dir) => {
      val base = Tables(s, dir, "customer")
        .select(col("c_custkey").as("entity"), col("c_nationkey").as("tru"))
        .localCheckpoint(true) // three claim projections + the report
      def src(name: String, m: Int) = base.select(col("entity"),
        lit(name).as("source"),
        when(col("entity") % m === 0, (col("tru") + 1) % 25)
          .otherwise(col("tru")).as("val"))
      graft.operators.TruthVote.report(
        src("crawl_a", 7).unionByName(src("crawl_b", 5))
          .unionByName(src("crawl_c", 3)),
        base)
    }),

    // ---- Cliff's delta effect size between the A/B arms (X372) -----------
    // The ordinal MAGNITUDE readout (operators/CliffsDelta.scala)
    // next to llm_ab_mannwhitney's decision: same user_id%2 arms,
    // same cent histogram — δ = P(x₁>x₀) − P(x₁<x₀) with the Romano
    // magnitude bands, pure integer cross-multiplication throughout.
    "llm_ab_cliffs_delta" -> ((s, dir) => {
      val d = events(s, dir)
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select((col("user_id") % 2).cast("int").as("arm"),
          floor(col("value") * 100 + 0.5).cast("long").as("v"))
      graft.operators.CliffsDelta.delta(d, "arm", "v")
    }),

    // ---- Fleiss' kappa across three rule-raters (X373) --------------------
    // The multi-rater agreement audit (operators/FleissKappa.scala):
    // three deterministic labeling heuristics — length, stopword
    // ratio, lexical diversity — each grade every doc into quality
    // tier {0,1,2}; kappa reads how much of their agreement survives
    // the marginal prevalences. The panel is constant by construction
    // (n = 3 rows per doc), which the operator ENFORCES — exactly the
    // campaign-level QA readout a labeling pipeline runs nightly.
    "llm_fleiss_kappa" -> ((s, dir) => {
      val f = Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("n"),
          size(array_distinct(col("w"))).cast("long").as("nd"),
          size(filter(col("w"), x => x.isin(stopwords: _*)))
            .cast("long").as("ns"))
        .localCheckpoint(true) // feeds all three rater projections
      val r1 = f.select(col("doc_id"),
        when(col("n") < 40, 0).when(col("n") < 70, 1).otherwise(2)
          .as("cat"))
      val r2 = f.select(col("doc_id"),
        when(col("ns") * 25 < col("n"), 0)
          .when(col("ns") * 25 < col("n") * 2, 1).otherwise(2).as("cat"))
      val r3 = f.select(col("doc_id"),
        when(col("nd") * 5 < col("n") * 2, 0)
          .when(col("nd") * 20 < col("n") * 11, 1).otherwise(2)
          .as("cat"))
      graft.operators.FleissKappa.kappa(
        r1.unionByName(r2).unionByName(r3), "doc_id", "cat")
    }),

    // ---- HyperLogLog shingle-cardinality audit per lang (X374) ------------
    // The FIXED-SIZE cardinality sketch (operators/Hll.scala) next to
    // llm_kmv_set_ops' bottom-k: 1024 registers per language over the
    // 3-shingle stream (3k-9k distinct per lang — ABOVE the 2.5m
    // small-range knee, so the raw estimator is in its valid regime;
    // the 31-word soup vocabulary is not), raw HLL estimate vs the
    // exact distinct count with the error in basis points. At 100 TB
    // the exact branch is dropped and only the 1 KiB-per-group
    // register fold remains (register-wise max — mergeable across
    // shards).
    "llm_hll_audit" -> ((s, dir) => {
      val w = Tables(s, dir, "documents")
        .select(col("lang"), TextOps.words(col("text")).as("_w"))
        .select(col("lang"),
          explode(TextOps.shinglesFromWords(col("_w"), 3)).as("sh"))
        .localCheckpoint(true) // feeds the sketch AND the exact audit
      val hashed = w.select(col("lang"), expr(
        "cast(conv(substring(md5(concat('hll|', sh)), 1, 15), 16, 10)"
          + " as bigint)").as("h"))
      val est = graft.operators.Hll.estimate(hashed, "lang", "h")
      val exact = w.groupBy("lang")
        .agg(countDistinct(col("sh")).as("n_exact"))
      exact.join(est.withColumnRenamed("g", "lang"), "lang")
        .select(col("lang"), col("n_exact"), col("est"),
          col("v_empty"), col("n_registers_hit"),
          graft.llm.TextOps.floorDivDec(
            abs(col("est") - col("n_exact")).cast("decimal(38,0)")
              * lit(10000L),
            col("n_exact").cast("decimal(38,0)")).cast("long")
            .as("err_bp"))
        .orderBy("lang")
    }),

    // ---- Cochran's Q repeated-measures binary test (X377) ----------------
    // Did the k=5 behaviour types differ in weekly adoption? Subjects
    // are (user, ISO week) cells, treatments the event types, reading
    // x = "showed that behaviour that week". Q cleared to one exact
    // rational, decided against the shared chi-square micro literals
    // (df = 4 here) by cross-multiplication; all-zero/all-k subjects
    // are algebraically inert so no filtering is needed.
    "p_cochran_q" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(concat(col("user_id"), lit("|"),
            date_format(date_trunc("week", col("ts")), "yyyy-MM-dd"))
            .as("subject"),
          col("event_type"))
      graft.operators.CochranQ.q(ev, "subject", "event_type")
    }),

    // ---- AMS F2 sketch + exactness audit per lang (X378) -----------------
    // The ±1-projection second-moment sketch next to KMV/CMS/HLL: 56
    // signed counters per language estimate the word-frequency
    // self-join size Σf² (the quantity that prices every dedup/join
    // pass), folded median-of-means. Sketch state is 56 longs per
    // group — plain sums, mergeable across shards — and the signs are
    // the MinHash multiply-shift family on the shared md5 hash, so
    // even the ESTIMATE hash-matches cross-engine. The exact branch
    // is the audit and drops at scale.
    "llm_f2_sketch" -> ((s, dir) => {
      val wc = Tables(s, dir, "documents")
        .select(col("lang"), explode(TextOps.words(col("text"))).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      graft.operators.AmsF2.estimate(wc, "lang", "w", "c")
        .withColumnRenamed("g", "lang").orderBy("lang")
    }),

    // ---- Brier decomposition of a rule forecaster (X379) -----------------
    // Murphy's reliability / resolution / uncertainty split of the
    // stopword-ratio "is this English" forecaster — the diagnosis the
    // Platt/isotonic calibrators (llm_calibration/llm_isotonic)
    // optimize against. Per-bin exact rationals floored once each
    // (the chi-square per-cell rule); corpus touched once.
    "llm_brier_decomp" -> ((s, dir) => {
      val ws = TextOps.words(col("text"))
      val d = Tables(s, dir, "documents")
        .select(size(ws).cast("long").as("n"),
          size(filter(ws, x => x.isin("the", "a", "of", "to", "in")))
            .cast("long").as("ns"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        .select(least(lit(99L),
          expr("(300 * ns) div greatest(n, 1)") + 1).as("f_pct"),
          col("y"))
      graft.operators.BrierDecomp.decompose(d, "f_pct", "y")
    }),

    // ---- Mood's median test (X382) ----------------------------------------
    // "Is any event type's value distribution SHIFTED?" — the k-sample
    // sign test on the pooled median: robust triage before the finer
    // rank machinery (Kruskal-Wallis) because single-cell corruption
    // cannot move a median-side count. All-integer 2xk chi-square,
    // decided against the shared chi95 literal table.
    "p_mood_median" -> ((s, dir) => {
      graft.operators.MoodMedian.test(
        events(s, dir).select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents")),
        "event_type", "cents")
    }),

    // ---- Brown-Forsythe spread-homogeneity test (X383) ---------------------
    // The variance counterpart of p_mood_median: one-way ANOVA on
    // |value - group median| — "did a source's DISPERSION change" is
    // the drift mode mean monitors miss. Median-centered (robust) and
    // integer-exact (deviations from an integer median are integers);
    // (k-1)W decided against chi-square(k-1) — the documented large-N
    // approximation, no runtime CDF.
    "p_brown_forsythe" -> ((s, dir) => {
      graft.operators.BrownForsythe.test(
        events(s, dir).select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents")),
        "event_type", "cents")
    }),

    // ---- trimmed + winsorized means (X384) ---------------------------------
    // The robust location pair a metrics pipeline reports when raw
    // means are hostage to tail spikes: trim drops the extreme 10%
    // per side, winsorize clamps them to the cut boundaries. Exact
    // integers from the value histogram - partial cells contribute by
    // rank-interval overlap arithmetic, never row enumeration.
    "p_trimmed_mean" -> ((s, dir) => {
      graft.operators.TrimmedStats.means(
        events(s, dir).select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents")),
        "event_type", "cents")
    }),


    // ---- McNemar-Bowker symmetry test (X385) -------------------------------
    // WHERE does the trained lang-ID systematically relabel the
    // heuristic? The k-label generalization of llm_mcnemar: per label
    // pair (i<j), is traffic i->j balanced by j->i? All-integer pair
    // terms, df = disagreeing pairs (empty pairs drop), decided
    // against the chi95 table extended to df 10 by the documented
    // offline bisection.
    "llm_mcnemar_bowker" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // NOTE on cost: this query's bench row reads ~3× its siblings
      // (llm_mcnemar / llm_langid_trained) at sf1 NOT because of a
      // worse plan — the predictions here are GROUP KEYS, so the full
      // NB pipeline must evaluate, while the siblings' bench .count()
      // lets Catalyst prune their prediction columns to a cheaper
      // plan. ~95 s at sf1 is the true cost of the trigram NB on the
      // Heaps'-law vocabulary (the contracted llm_mcnemar family,
      // guarded in naiveBayesLangId). Verified single-consumer: no
      // checkpoint (measured neutral, 97.3 vs 95.8 s).
      val nb = TextOps.naiveBayesLangId(docs, "doc_id", "text", "lang")
        .select(col("doc").as("doc_id"), col("pred_lang").as("b"))
      // split ONCE behind a projection boundary — inlining words(text)
      // into the argmax re-evaluates the split per score expression
      // (the bindOnce/CSE gotcha; measured 3.3× on this query at sf1)
      val heur = docs
        .select(col("doc_id"), TextOps.words(col("text")).as("_w"))
        .select(col("doc_id"),
          TextOps.languageIdFromWords(col("_w"), langMarkers).as("a"))
      graft.operators.McNemarBowker.test(heur.join(nb, "doc_id"), "a", "b")
    }),


    // ---- V-optimal histogram (X388) ----------------------------------------
    // The classic synopsis structure (Jagadish et al. VLDB'98): B=4
    // variance-minimizing buckets over the daily value series by
    // exact DP - dp_b(i) = min_j dp_{b-1}(j) + SSE(j+1..i), SSE from
    // prefix sums with per-term micro floors (Q*1e6 - P^2*1e6 div n,
    // nonnegative by Cauchy-Schwarz even after the floor). The DP,
    // argmin backtrack, and bucket labeling all run as joins on the
    // calendar-sized cell table - metadata, the compaction-plan rule;
    // ties break to the smaller boundary via struct-min in Spark and
    // (cost, j) row_number in the oracle.
    "p_vopt_histogram" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
      val cw = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cells = daily
        .withColumn("i", row_number().over(Window.orderBy("day"))
          .cast("long"))
        .withColumn("p", sum(col("x")).over(cw))
        .withColumn("q", sum(dec(col("x")) * dec(col("x"))).over(cw))
        .localCheckpoint(true) // cost pairs + labels + the C lookup
      val zero = Seq((0L, 0L, 0L)).toDF("i", "p", "qz")
        .select(col("i"), col("p"), dec(col("qz")).as("q"))
      val pref = cells.select(col("i"), col("p"), dec(col("q")).as("q"))
        .unionAll(zero)
      val cost = pref.as("a").join(pref.as("b"), col("a.i") < col("b.i"))
        .select(col("a.i").as("j"), col("b.i").as("i"),
          ((dec(col("b.q")) - dec(col("a.q"))) * lit(1000000L)
            - graft.llm.TextOps.floorDivDec(
              dec(col("b.p") - col("a.p")) * dec(col("b.p") - col("a.p"))
                * lit(1000000L),
              dec(col("b.i") - col("a.i")))).as("c6"))
        .localCheckpoint(true) // 3 dp rounds + the bucket-SSE lookup
      val dp1 = cost.filter(col("j") === 0)
        .select(col("i"), col("c6").as("c"), lit(0L).as("arg"))
      def step(prev: DataFrame): DataFrame = prev
        .select(col("i").as("j"), col("c").as("pc"))
        .join(cost, Seq("j"))
        .groupBy("i")
        .agg(min(struct((col("pc") + col("c6")).as("tc"),
          col("j").as("jj"))).as("m"))
        .select(col("i"), col("m.tc").as("c"), col("m.jj").as("arg"))
      val dp2 = step(dp1); val dp3 = step(dp2); val dp4 = step(dp3)
      val cmax = cells.agg(max("i").as("cc"))
      val b4 = dp4.join(cmax, col("i") === col("cc"))
        .select(col("arg").as("j4"), col("cc"))
      val b3 = dp3.join(b4, dp3("i") === col("j4"))
        .select(col("arg").as("j3"), col("j4"), col("cc"))
      val b2 = dp2.join(b3, dp2("i") === col("j3"))
        .select(col("arg").as("j2"), col("j3"), col("j4"), col("cc"))
      val buckets = b2.select(explode(array(
          struct(lit(1L).as("bucket"), lit(1L).as("lo"),
            col("j2").as("hi")),
          struct(lit(2L).as("bucket"), (col("j2") + 1).as("lo"),
            col("j3").as("hi")),
          struct(lit(3L).as("bucket"), (col("j3") + 1).as("lo"),
            col("j4").as("hi")),
          struct(lit(4L).as("bucket"), (col("j4") + 1).as("lo"),
            col("cc").as("hi")))).as("bk"))
        .select(col("bk.bucket").as("bucket"), col("bk.lo").as("lo"),
          col("bk.hi").as("hi"))
      buckets
        .join(cost, col("j") === col("lo") - 1 && col("i") === col("hi"))
        .join(cells.select(col("i").as("li"), col("day").as("sd")),
          col("li") === col("lo"))
        .join(cells.select(col("i").as("hi2"), col("day").as("ed")),
          col("hi2") === col("hi"))
        .select(col("bucket"),
          date_format(col("sd"), "yyyy-MM-dd").as("start_day"),
          date_format(col("ed"), "yyyy-MM-dd").as("end_day"),
          (col("hi") - col("lo") + 1).as("n_days"),
          col("c6").cast("long").as("sse_micro"))
        .orderBy("bucket")
    }),


    // ---- capture-recapture population estimate (X390) ----------------------
    // Lincoln-Petersen with the Chapman bias correction: estimate the
    // distinct-user population from two INDEPENDENT 10% hash captures
    // - the estimator a dedup stack uses when counting the true
    // cluster population is cheaper to sample than to enumerate. The
    // audit row carries the exact truth next to the estimate (this
    // corpus is small enough to enumerate), so the error is measured,
    // not assumed. All-integer: Chapman = (n1+1)(n2+1) div (m+1) - 1.
    "p_capture_recapture" -> ((s, dir) => {
      val users = events(s, dir).select(col("user_id")).distinct()
        .localCheckpoint(true) // two capture filters + the truth count
      def cap(salt: String) = users.filter(
        conv(substring(md5(concat(lit(salt + "|"),
          col("user_id").cast("string"))), 1, 4), 16, 10)
          .cast("long") % 10 === 0)
      val c1 = cap("cap1"); val c2 = cap("cap2")
      val m = c1.join(c2, Seq("user_id"), "left_semi")
      users.agg(count(lit(1)).as("n_pop"))
        .crossJoin(c1.agg(count(lit(1)).as("n1")))
        .crossJoin(c2.agg(count(lit(1)).as("n2")))
        .crossJoin(m.agg(count(lit(1)).as("m")))
        .select(col("n_pop"), col("n1"), col("n2"), col("m"),
          (expr("((n1 + 1) * (n2 + 1)) div (m + 1)") - 1)
            .as("chapman_est"),
          expr("(abs(((n1 + 1) * (n2 + 1)) div (m + 1) - 1 - n_pop)"
            + " * 1000000) div n_pop").as("err_micro"))
    }),


    // ---- Bartels' rank test of randomness (X391) ---------------------------
    // Von Neumann's ratio on RANKS (Bartels JASA 1982): is the daily
    // value series random against serial correlation - the trend/
    // oscillation triage before any forecasting model is trusted.
    // Ranks tie-break by day, making them a PERMUTATION (documented
    // policy; daily cent sums are effectively tie-free), so
    // D = (n^3-n)/12 is closed-form and the whole decision is exact
    // integer cross-multiplication: RVN = 12*NM/(n^3-n), and
    // (12NM - 2(n^3-n))^2 * 1e6 * 5n(n+1)(n-1)^2 >=
    // 3841458 * 4(n-2)(5n^2-2n-9) * (n^3-n)^2 - no runtime CDF, the
    // folded-z discipline. One row out.
    "p_bartels_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
      val ranked = daily
        .withColumn("r", row_number()
          .over(Window.orderBy(col("x"), col("day"))).cast("long"))
      val nm = ranked
        .withColumn("rn", lead(col("r"), 1)
          .over(Window.orderBy(col("day"))))
        .agg(count(lit(1)).as("n"),
          sum(when(col("rn").isNotNull,
            (col("r") - col("rn")) * (col("r") - col("rn")))
            .otherwise(lit(0L))).as("nm"))
      nm.select(col("n"), col("nm"),
          (dec(col("n")) * dec(col("n")) * dec(col("n")) - dec(col("n")))
            .as("n3n"))
        .select(col("n"), col("nm"),
          graft.llm.TextOps.floorDivDec(
            dec(col("nm")) * lit(12L) * lit(1000000L), col("n3n"))
            .cast("long").as("rvn_micro"),
          (dec(col("nm")) * lit(12L) - lit(2L) * col("n3n")).as("dev"),
          col("n3n"))
        .select(col("n"), col("nm"), col("rvn_micro"),
          (col("dev") * col("dev") * lit(1000000L) * lit(5L) * dec(col("n"))
            * dec(col("n") + 1) * dec(col("n") - 1) * dec(col("n") - 1)
            >= dec(lit(3841458L)) * lit(4L) * dec(col("n") - 2)
              * (lit(5L) * dec(col("n")) * dec(col("n"))
                - lit(2L) * dec(col("n")) - lit(9L))
              * col("n3n") * col("n3n")).as("reject_05"))
    }),

  )

  val oracleSql: Map[String, String] = Map(

    "llm_kl_drift" -> s"""
      WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      sw AS (SELECT source, w, count(*) AS csw FROM tok GROUP BY source, w),
      cw AS (SELECT w, CAST(sum(csw) AS BIGINT) AS cwt FROM sw GROUP BY w),
      ns AS (
        SELECT source, CAST(sum(csw) AS BIGINT) AS nst,
               count(*) AS n_types
        FROM sw GROUP BY source),
      nc AS (SELECT CAST(sum(cwt) AS BIGINT) AS nct FROM cw),
      terms AS (
        SELECT s.source, s.csw,
               CAST(floor(ln(s.csw * nc.nct / CAST(ns.nst * c.cwt AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT) AS li
        FROM sw s JOIN cw c USING (w) JOIN ns USING (source), nc),
      agg AS (
        SELECT source, CAST(sum(csw * li) AS BIGINT) AS kl_micronats
        FROM terms GROUP BY source)
      SELECT a.source, ns.nst AS n_tokens, ns.n_types, a.kl_micronats,
             ${round6sql("a.kl_micronats / (ns.nst * 1000000.0)")} AS kl
      FROM agg a JOIN ns USING (source)
      ORDER BY a.source
    """,

    "llm_ks_test" -> s"""
      WITH d AS (
        SELECT source,
               CAST(floor(($qualitySqlCol) * 1000000.0) AS BIGINT) AS s
        FROM (SELECT source, string_split(text, ' ') AS ws
              FROM documents)),
      s0 AS (SELECT min(source) AS s0 FROM d),
      c AS (
        SELECT s,
               sum(CASE WHEN source = s0 THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN source <> s0 THEN 1 ELSE 0 END) AS c2
        FROM d, s0 GROUP BY s),
      cum AS (
        SELECT s, sum(c1) OVER (ORDER BY s) AS f1,
               sum(c2) OVER (ORDER BY s) AS f2
        FROM c),
      n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM c),
      diff AS (
        SELECT s, abs(f1 * n2 - f2 * n1) AS dd FROM cum, n),
      best AS (
        SELECT s AS at_value, dd AS d_num FROM diff
        ORDER BY dd DESC, s LIMIT 1)
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             CAST(d_num AS BIGINT) AS d_num, at_value,
             CAST((d_num * 1000000) // (n1 * n2) AS BIGINT) AS ks_micro,
             (CAST(d_num AS HUGEINT) * d_num * 1000000
                >= CAST(1844164 AS HUGEINT) * n1 * n2 * (n1 + n2))
               AS reject_05
      FROM best, n
    """,

    // Replays the bin histogram, the doubled-rank AUC identity, the
    // micro-floored AP fold, and the decile threshold walk. `//` is
    // DuckDB's toward-zero integer division (all operands positive
    // here, so it agrees with Spark's decimal floor-div).
    "llm_rank_eval" -> s"""
      WITH sc AS (
        SELECT (len(list_filter(string_split(text, ' '), w -> w = 'the'))
                 * 1000) // len(string_split(text, ' ')) AS bin,
               CASE WHEN len(list_filter(string_split(text, ' '),
                      w -> w IN ('the', 'a', 'of', 'to', 'and'))) * 1000
                    >= 61 * len(string_split(text, ' '))
                    THEN 1 ELSE 0 END AS p
        FROM documents
        WHERE len(string_split(text, ' ')) > 0),
      hist AS (
        SELECT bin, sum(p) AS n1, sum(1 - p) AS n0 FROM sc GROUP BY 1),
      h AS (
        SELECT bin, n1, n0, n1 + n0 AS t,
               coalesce(sum(n1 + n0) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS below,
               sum(n1) OVER (ORDER BY bin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
               sum(n1 + n0) OVER (ORDER BY bin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
        FROM hist),
      h2 AS (
        SELECT h.*, (CAST(cum_tp AS HUGEINT) * 1000000) // cum_n
                 AS prec_micro
        FROM h),
      tot AS (
        SELECT CAST(sum(n1) AS BIGINT) AS np, CAST(sum(n0) AS BIGINT) AS nn,
               sum(CAST(n1 AS HUGEINT) * (2 * below + t + 1)) AS r1_x2,
               sum(CAST(n1 AS HUGEINT) * prec_micro) AS ap_num
        FROM h2),
      tot2 AS (
        SELECT np, nn, r1_x2 - CAST(np AS HUGEINT) * (np + 1) AS u1_x2,
               CAST(ap_num // np AS BIGINT) AS ap_micro
        FROM tot),
      pts AS (
        SELECT j, max(bin) AS bj
        FROM h2, tot2, (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) v(j)
        WHERE cum_n * 10 >= j * (np + nn) GROUP BY j),
      ptv AS (
        SELECT p.j, CAST(h2.cum_tp AS BIGINT) AS cum_tp,
               CAST(h2.cum_n AS BIGINT) AS cum_n, t.np, t.nn
        FROM pts p JOIN h2 ON h2.bin = p.bj CROSS JOIN tot2 t)
      SELECT * FROM (
        SELECT 'auc' AS measure, CAST(u1_x2 AS BIGINT) AS num,
               2 * np * nn AS den,
               ${round6sql("CAST(u1_x2 AS DOUBLE) / (2.0 * np * nn)")}
                 AS value
        FROM tot2
        UNION ALL
        SELECT 'ap', ap_micro, 1000000,
               ${round6sql("ap_micro / 1e6")} FROM tot2
        UNION ALL
        SELECT 'n_pos', np, 1, CAST(np AS DOUBLE) FROM tot2
        UNION ALL
        SELECT 'n_neg', nn, 1, CAST(nn AS DOUBLE) FROM tot2
        UNION ALL
        SELECT 'tpr_' || j, cum_tp, np,
               ${round6sql("cum_tp / CAST(np AS DOUBLE)")} FROM ptv
        UNION ALL
        SELECT 'fpr_' || j, cum_n - cum_tp, nn,
               ${round6sql("(cum_n - cum_tp) / CAST(nn AS DOUBLE)")} FROM ptv)
      ORDER BY measure
    """,

    "llm_importance" -> s"""
      WITH w AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
      f AS (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5('dsir|' || w), 1, 4) AS INT) % 256 AS b
        FROM w),
      fc AS (
        SELECT doc_id, b, count(*) AS c,
               max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t
        FROM f GROUP BY doc_id, b),
      bk AS (
        SELECT b, CAST(sum(c) AS BIGINT) AS cr,
               CAST(sum(CASE WHEN t = 1 THEN c ELSE 0 END) AS BIGINT) AS ct
        FROM fc GROUP BY b),
      tot AS (
        SELECT CAST(sum(cr) + 256 AS BIGINT) AS nr,
               CAST(sum(ct) + 256 AS BIGINT) AS nt
        FROM bk),
      lr AS (
        SELECT b,
               CAST(floor(ln((ct + 1) * nr / CAST((cr + 1) * nt AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT) AS lr
        FROM bk, tot),
      sc AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(c * lr) AS BIGINT) AS logw_micronats
        FROM fc JOIN lr USING (b) GROUP BY doc_id)
      SELECT doc_id, n_tokens, logw_micronats,
             ${round6sql("logw_micronats / (n_tokens * 1000000.0)")} AS avg_logw,
             (logw_micronats > 0) AS selected
      FROM sc ORDER BY doc_id
    """,

    // Composes the shared NB chain with the heuristic scorer's SQL:
    // b = heuristic right & NB wrong, c = the reverse; exact rational
    // chi-square-1 decision (196^2 = 38416).
    "llm_mcnemar" -> s"""
      WITH $nbLangCtes,
      nb AS (
        SELECT doc_id, (lang_true = cand) AS b_ok
        FROM r WHERE rn = 1),
      hs AS (
        SELECT doc_id, ($langArgmax = lang) AS a_ok FROM (
          SELECT doc_id, lang, ws, $langScoreCols
          FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
                FROM documents)) scored),
      j AS (SELECT a_ok, b_ok FROM hs JOIN nb USING (doc_id)),
      agg AS (
        SELECT count(*) AS n,
               sum(CASE WHEN a_ok AND b_ok THEN 1 ELSE 0 END) AS n_both,
               sum(CASE WHEN NOT a_ok AND NOT b_ok THEN 1 ELSE 0 END)
                 AS n_neither,
               sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS nb_,
               sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS nc_
        FROM j)
      SELECT CAST(n AS BIGINT) AS n, CAST(n_both AS BIGINT) AS n_both,
             CAST(n_neither AS BIGINT) AS n_neither,
             CAST(nb_ AS BIGINT) AS n_b, CAST(nc_ AS BIGINT) AS n_c,
             CAST(CASE WHEN nb_ + nc_ > 0
                       THEN ((nb_ - nc_) * (nb_ - nc_) * 1000000)
                            // (nb_ + nc_)
                       ELSE 0 END AS BIGINT) AS chi2_micro,
             (nb_ + nc_ > 0 AND
              (nb_ - nc_) * (nb_ - nc_) * 10000 >= 38416 * (nb_ + nc_))
               AS reject_05
      FROM agg
    """,

    "llm_mcnemar_hashed" -> s"""
      WITH $nbLangHashedCtes,
      nb AS (
        SELECT doc_id, (lang_true = cand) AS b_ok
        FROM r WHERE rn = 1),
      hs AS (
        SELECT doc_id, ($langArgmax = lang) AS a_ok FROM (
          SELECT doc_id, lang, ws, $langScoreCols
          FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
                FROM documents)) scored),
      j AS (SELECT a_ok, b_ok FROM hs JOIN nb USING (doc_id)),
      agg AS (
        SELECT count(*) AS n,
               sum(CASE WHEN a_ok AND b_ok THEN 1 ELSE 0 END) AS n_both,
               sum(CASE WHEN NOT a_ok AND NOT b_ok THEN 1 ELSE 0 END)
                 AS n_neither,
               sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS nb_,
               sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS nc_
        FROM j)
      SELECT CAST(n AS BIGINT) AS n, CAST(n_both AS BIGINT) AS n_both,
             CAST(n_neither AS BIGINT) AS n_neither,
             CAST(nb_ AS BIGINT) AS n_b, CAST(nc_ AS BIGINT) AS n_c,
             CAST(CASE WHEN nb_ + nc_ > 0
                       THEN ((nb_ - nc_) * (nb_ - nc_) * 1000000)
                            // (nb_ + nc_)
                       ELSE 0 END AS BIGINT) AS chi2_micro,
             (nb_ + nc_ > 0 AND
              (nb_ - nc_) * (nb_ - nc_) * 10000 >= 38416 * (nb_ + nc_))
               AS reject_05
      FROM agg
    """,

    "llm_theil_u" -> """
      WITH cells AS MATERIALIZED (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2),
      nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
      sx1 AS (SELECT source, CAST(sum(c) AS BIGINT) AS cx
              FROM cells GROUP BY 1),
      hx1 AS (SELECT CAST(sum(CAST(floor(cx * ln(CAST(nn.n AS DOUBLE) / cx)
                * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS shx
              FROM sx1, nn),
      cy1 AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cy
              FROM cells GROUP BY 1),
      hc1 AS (SELECT CAST(sum(CAST(floor(c * ln(CAST(cy AS DOUBLE) / c)
                * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS shc
              FROM cells JOIN cy1 USING (lang)),
      sx2 AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cx
              FROM cells GROUP BY 1),
      hx2 AS (SELECT CAST(sum(CAST(floor(cx * ln(CAST(nn.n AS DOUBLE) / cx)
                * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS shx
              FROM sx2, nn),
      cy2 AS (SELECT source, CAST(sum(c) AS BIGINT) AS cy
              FROM cells GROUP BY 1),
      hc2 AS (SELECT CAST(sum(CAST(floor(c * ln(CAST(cy AS DOUBLE) / c)
                * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS shc
              FROM cells JOIN cy2 USING (source))
      SELECT * FROM (
        SELECT 'source|lang' AS direction, hx1.shx AS h_x_micro,
               hc1.shc AS h_cond_micro,
               CASE WHEN hx1.shx > 0
                    THEN CAST((CAST(hx1.shx AS HUGEINT) - hc1.shc)
                              * 1000000 // hx1.shx AS BIGINT)
                    ELSE 0 END AS u_ppm
        FROM hx1, hc1
        UNION ALL
        SELECT 'lang|source' AS direction, hx2.shx AS h_x_micro,
               hc2.shc AS h_cond_micro,
               CASE WHEN hx2.shx > 0
                    THEN CAST((CAST(hx2.shx AS HUGEINT) - hc2.shc)
                              * 1000000 // hx2.shx AS BIGINT)
                    ELSE 0 END AS u_ppm
        FROM hx2, hc2)
      ORDER BY direction
    """,

    "p_wilson_ci" -> """
      WITH d AS (
        SELECT source, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CASE WHEN len(string_split(text, ' ')) >= 50
                    THEN 1 ELSE 0 END) AS HUGEINT) AS k
        FROM documents GROUP BY 1),
      t AS (
        SELECT source, n, k,
               3841459 * ((k * (n - k) * 1000000) // n + 960364) AS tt
        FROM d),
      s0 AS (SELECT t.*, CAST(floor(sqrt(CAST(tt AS DOUBLE)))
               AS HUGEINT) AS r0 FROM t),
      s1 AS (SELECT s0.*, CASE WHEN (r0 + 1) * (r0 + 1) <= tt
                               THEN r0 + 1 ELSE r0 END AS r1 FROM s0),
      s2 AS (SELECT s1.*, CASE WHEN r1 * r1 > tt THEN r1 - 1
                               ELSE r1 END AS sq FROM s1)
      SELECT source, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             CAST((k * 1000000) // n AS BIGINT) AS rate_micro,
             CAST(least((k * 1000000) // n, greatest(0,
               ((2 * k * 1000000 + 3841459 - 2 * sq) * 1000000)
                 // (2 * (n * 1000000 + 3841459)))) AS BIGINT) AS lo_micro,
             CAST(greatest((k * 1000000) // n, least(1000000,
               ((2 * k * 1000000 + 3841459 + 2 * sq) * 1000000)
                 // (2 * (n * 1000000 + 3841459)))) AS BIGINT) AS hi_micro
      FROM s2 ORDER BY source
    """,

    "p_hash_uniformity" -> """
      WITH occ AS (
        SELECT CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                 1, 4) AS INT) % 100 AS b,
               count(*) AS o
        FROM documents GROUP BY 1),
      spine AS (
        SELECT s.b, coalesce(occ.o, 0) AS o
        FROM (SELECT unnest(range(100)) AS b) s
        LEFT JOIN occ ON occ.b = s.b),
      n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM spine),
      x AS (
        SELECT n, sum((100 * o - n) * (100 * o - n)) AS sd2
        FROM spine, n GROUP BY n)
      SELECT n, CAST((sd2 * 1000000) // (100 * n) AS BIGINT) AS x2_micro,
             (sd2 * 1000000) // (100 * n) >= 123225221 AS reject_05
      FROM x
    """,

    "llm_good_turing" -> """
      WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
      nr AS (SELECT c AS r, count(*) AS n FROM wc GROUP BY c),
      tot AS (SELECT coalesce(sum(c), 0) AS nn FROM wc),
      seen1 AS (SELECT coalesce((SELECT n FROM nr WHERE r = 1), 0) AS n1)
      SELECT s.r, coalesce(a.n, 0) AS n_r, coalesce(b.n, 0) AS n_next,
             CASE WHEN coalesce(a.n, 0) > 0
                  THEN CAST(((s.r + 1) * coalesce(b.n, 0) * 1000000)
                         // a.n AS BIGINT)
                  ELSE 0 END AS r_star_micro,
             CASE WHEN tt.nn > 0
                  THEN CAST((x.n1 * 1000000) // tt.nn AS BIGINT)
                  ELSE 0 END AS p0_micro
      FROM range(1, 11) s(r)
      LEFT JOIN nr a ON a.r = s.r
      LEFT JOIN nr b ON b.r = s.r + 1, tot tt, seen1 x
      ORDER BY s.r
    """,

    "llm_vocab_growth" -> """
      WITH toks AS (
        SELECT CAST('0x' || substr(md5('vg|' || CAST(doc_id AS VARCHAR)),
                 1, 4) AS INT) % 16 AS lvl,
               unnest(string_split(text, ' ')) AS w
        FROM documents),
      th AS (SELECT lvl, CAST(count(*) AS BIGINT) AS nt
             FROM toks GROUP BY 1),
      wm AS MATERIALIZED (
        SELECT w, min(lvl) AS ml, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY 1),
      vh AS (SELECT ml, CAST(count(*) AS BIGINT) AS nv FROM wm GROUP BY 1),
      ls(lv) AS (VALUES (1), (2), (4), (8), (16)),
      pts AS MATERIALIZED (
        SELECT n.lv, n.n_tokens, v.vocab
        FROM (SELECT lv, CAST(sum(nt) AS BIGINT) AS n_tokens
              FROM ls JOIN th ON th.lvl < ls.lv GROUP BY 1) n
        JOIN (SELECT lv, CAST(sum(nv) AS BIGINT) AS vocab
              FROM ls JOIN vh ON vh.ml < ls.lv GROUP BY 1) v USING (lv)),
      rich AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS v, CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM wm),
      fit0 AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM (SELECT CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000.0
                       + 0.5) AS BIGINT) AS x,
                     CAST(floor(ln(CAST(vocab AS DOUBLE)) * 1000000.0
                       + 0.5) AS BIGINT) AS y
              FROM pts)),
      fit AS (
        SELECT beta_micro,
               CAST(floor((CAST(sy AS DOUBLE)
                 - CAST(beta_micro AS DOUBLE) / 1000000.0
                   * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) + 0.5)
                 AS BIGINT) AS logk_micro
        FROM (SELECT CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                       * 1000000.0
                       / CAST(n * sxx - sx * sx AS DOUBLE) + 0.5)
                       AS BIGINT) AS beta_micro, n, sx, sy
              FROM fit0))
      SELECT part, k, sym, n FROM (
        SELECT 'level' AS part, CAST(lv AS BIGINT) AS k,
               'n_tokens' AS sym, n_tokens AS n FROM pts
        UNION ALL SELECT 'level', CAST(lv AS BIGINT), 'vocab', vocab
          FROM pts
        UNION ALL SELECT 'richness', NULL, 'vocab', v FROM rich
        UNION ALL SELECT 'richness', NULL, 'n_tokens', n FROM rich
        UNION ALL SELECT 'richness', NULL, 'f1', f1 FROM rich
        UNION ALL SELECT 'richness', NULL, 'f2', f2 FROM rich
        UNION ALL SELECT 'richness', NULL, 'chao1',
          v + (f1 * (f1 - 1)) // (2 * (f2 + 1)) FROM rich
        UNION ALL SELECT 'richness', NULL, 'gt_unseen_ppm',
          (f1 * 1000000) // n FROM rich
        UNION ALL SELECT 'fit', NULL, 'beta_micro', beta_micro FROM fit
        UNION ALL SELECT 'fit', NULL, 'logk_micro', logk_micro FROM fit)
      ORDER BY part, k, sym
    """,

    // Zipf replay: same (count DESC, word) rank order, micro-ln points,
    // exact integer moments; negated slope published as s_micro.
    "llm_zipf_fit" -> """
      WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      wc AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
      ranked AS MATERIALIZED (
        SELECT w, c,
               CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rank
        FROM wc),
      pts AS (
        SELECT CAST(floor(ln(rank) * 1000000 + 0.5) AS BIGINT) AS x,
               CAST(floor(ln(c) * 1000000 + 0.5) AS BIGINT) AS y
        FROM ranked),
      mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM pts),
      fit AS (
        SELECT CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0
                 / CAST(n * sxx - sx * sx AS DOUBLE) + 0.5) AS BIGINT)
                 AS beta,
               n, sx, sy
        FROM mom),
      fit2 AS MATERIALIZED (
        SELECT beta,
               CAST(floor((CAST(sy AS DOUBLE)
                 - CAST(beta AS DOUBLE) / 1000000.0 * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS logk
        FROM fit)
      SELECT 'rank' AS part, rank AS k, w AS sym, c AS n FROM ranked
      UNION ALL
      SELECT 'fit', NULL, 'logk_micro', logk FROM fit2
      UNION ALL
      SELECT 'fit', NULL, 's_micro', -beta FROM fit2
      ORDER BY part, k, sym
    """,

    "llm_ab_welch" -> s"""
      WITH ev AS (
        SELECT event_type, user_id % 2 AS v,
               CAST(floor(value * 1000000 + 0.5) AS HUGEINT) AS val
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL),
      m AS (
        SELECT event_type,
               CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na,
               CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
               sum(CASE WHEN v = 0 THEN val ELSE 0 END) AS sa,
               sum(CASE WHEN v = 1 THEN val ELSE 0 END) AS sb,
               sum(CASE WHEN v = 0 THEN val * val ELSE 0 END) AS ssa,
               sum(CASE WHEN v = 1 THEN val * val ELSE 0 END) AS ssb
        FROM ev GROUP BY event_type),
      d AS (
        SELECT event_type, na, nb,
               CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 1e6 AS ma,
               CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 1e6 AS mb,
               CAST(na * ssa - sa * sa AS DOUBLE)
                 / CAST(na * (na - 1) AS DOUBLE) / 1e12
                 / CAST(na AS DOUBLE) AS sea,
               CAST(nb * ssb - sb * sb AS DOUBLE)
                 / CAST(nb * (nb - 1) AS DOUBLE) / 1e12
                 / CAST(nb AS DOUBLE) AS seb
        FROM m WHERE na > 1 AND nb > 1)
      SELECT event_type,
             CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             ${round6sql("ma")} AS mean_a, ${round6sql("mb")} AS mean_b,
             ${round6sql("(mb - ma) / ma")} AS lift,
             ${round6sql("(mb - ma) / sqrt(sea + seb)")} AS t_stat,
             ${round6sql(
               "(sea + seb) * (sea + seb) / (sea * sea / (CAST(na AS DOUBLE) - 1.0)" +
               " + seb * seb / (CAST(nb AS DOUBLE) - 1.0))")} AS df
      FROM d
      ORDER BY event_type
    """,

    // Median-CI replay: identical IEEE sqrt ranks, histogram walks.
    "p_median_ci" -> """
      WITH hist AS MATERIALIZED (
        SELECT event_type AS m,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT m, CAST(sum(n) AS BIGINT) AS nt FROM hist GROUP BY 1),
      ranks AS MATERIALIZED (
        SELECT m, nt, (nt + 1) // 2 AS med_rank,
               greatest(1, CAST(floor((CAST(nt AS DOUBLE)
                 - 1.96 * sqrt(CAST(nt AS DOUBLE))) / 2.0) AS BIGINT))
                 AS lo_rank,
               least(nt, CAST(ceil((CAST(nt AS DOUBLE)
                 + 1.96 * sqrt(CAST(nt AS DOUBLE))) / 2.0) AS BIGINT) + 1)
                 AS hi_rank
        FROM tot),
      cum AS MATERIALIZED (
        SELECT m, cents,
               sum(n) OVER (PARTITION BY m ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM hist)
      SELECT r.m AS metric, r.nt AS n_obs, r.lo_rank, r.hi_rank,
             (SELECT min(cents) FROM cum
              WHERE cum.m = r.m AND cum.c >= r.med_rank) AS median_cents,
             (SELECT min(cents) FROM cum
              WHERE cum.m = r.m AND cum.c >= r.lo_rank) AS lo_cents,
             (SELECT min(cents) FROM cum
              WHERE cum.m = r.m AND cum.c >= r.hi_rank) AS hi_cents
      FROM ranks r
      ORDER BY metric
    """,

    // FK-orphan replay: per edge, one anti-join count + null tally.
    "p_fk_orphans" -> {
      val edges = Seq(
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
          "region", "r_regionkey"))
      edges.map { case (nm, ct, ck, pt, pk) => s"""
      SELECT '$nm' AS fk_edge,
             (SELECT CAST(count(*) AS BIGINT) FROM $ct) AS n_child,
             (SELECT CAST(count(*) AS BIGINT) FROM $ct WHERE $ck IS NULL)
               AS n_null_fk,
             (SELECT CAST(count(*) AS BIGINT) FROM $ct
              WHERE $ck IS NOT NULL
                AND $ck NOT IN (SELECT $pk FROM $pt WHERE $pk IS NOT NULL))
               AS n_orphans,
             ${round6sql(
        s"(SELECT count(*) FROM $ct WHERE $ck IS NOT NULL AND $ck NOT IN " +
        s"(SELECT $pk FROM $pt WHERE $pk IS NOT NULL)) " +
        s"/ CAST((SELECT count(*) FROM $ct) - " +
        s"(SELECT count(*) FROM $ct WHERE $ck IS NULL) AS DOUBLE)")}
               AS orphan_rate""" }
        .mkString("", "\n      UNION ALL", "\n      ORDER BY fk_edge")
    },

    "llm_chao_richness" -> """
      WITH wc AS (
        SELECT source, w, count(*) AS c FROM (
          SELECT source, unnest(string_split(text, ' ')) AS w
          FROM documents)
        GROUP BY 1, 2),
      ff AS (
        SELECT source, count(*) AS s_obs,
               sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
               sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
        FROM wc GROUP BY 1),
      est AS (
        SELECT source, s_obs, f1, f2,
               CASE WHEN f2 > 0 THEN s_obs + (f1 * f1) // (2 * f2)
                    ELSE s_obs + (f1 * (f1 - 1)) // 2 END AS s_est
        FROM ff)
      SELECT source, CAST(s_obs AS BIGINT) AS s_obs,
             CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
             CAST(s_est AS BIGINT) AS s_est,
             CAST((s_obs * 1000000) // greatest(s_est, 1) AS BIGINT)
               AS coverage_micro
      FROM est ORDER BY source
    """,

    "p_spearman" -> s"""
      WITH d AS (
        SELECT CAST(len(ws) AS BIGINT) AS x,
               CAST(floor(($qualitySqlCol) * 1000000.0) AS BIGINT) AS y
        FROM (SELECT string_split(text, ' ') AS ws FROM documents)),
      rx AS (
        SELECT v, 2 * (cum - cnt) + cnt + 1 AS rx FROM (
          SELECT v, cnt, sum(cnt) OVER (ORDER BY v) AS cum FROM (
            SELECT x AS v, count(*) AS cnt FROM d GROUP BY 1))),
      ry AS (
        SELECT v, 2 * (cum - cnt) + cnt + 1 AS ry FROM (
          SELECT v, cnt, sum(cnt) OVER (ORDER BY v) AS cum FROM (
            SELECT y AS v, count(*) AS cnt FROM d GROUP BY 1))),
      r AS MATERIALIZED (
        SELECT rx.rx, ry.ry
        FROM d JOIN rx ON rx.v = d.x JOIN ry ON ry.v = d.y),
      m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(rx AS HUGEINT)) AS sx,
               sum(CAST(ry AS HUGEINT)) AS sy,
               sum(CAST(rx AS HUGEINT) * rx) AS sxx,
               sum(CAST(ry AS HUGEINT) * ry) AS syy,
               sum(CAST(rx AS HUGEINT) * ry) AS sxy
        FROM r),
      t AS (
        SELECT n, n * sxy - sx * sy AS num,
               n * sxx - sx * sx AS a, n * syy - sy * sy AS b
        FROM m),
      q0 AS (
        SELECT t.*,
               CAST(floor(sqrt(CAST(a AS DOUBLE))) AS HUGEINT) AS sa,
               CAST(floor(sqrt(CAST(b AS DOUBLE))) AS HUGEINT) AS sb
        FROM t),
      q1 AS (
        SELECT q0.*,
               CASE WHEN (sa + 1) * (sa + 1) <= a THEN sa + 1
                    ELSE sa END AS sa1,
               CASE WHEN (sb + 1) * (sb + 1) <= b THEN sb + 1
                    ELSE sb END AS sb1
        FROM q0),
      q2 AS (
        SELECT q1.*,
               CASE WHEN sa1 * sa1 > a THEN sa1 - 1 ELSE sa1 END AS sa2,
               CASE WHEN sb1 * sb1 > b THEN sb1 - 1 ELSE sb1 END AS sb2
        FROM q1),
      q3 AS (
        SELECT q2.*,
               CASE WHEN a > 0 AND b > 0
                    THEN greatest(least(
                           (num * 1000000) // greatest(sa2 * sb2, 1),
                           1000000), -1000000)
                    ELSE 0 END AS rhov
        FROM q2)
      SELECT CAST(n AS BIGINT) AS n,
             CAST(CASE WHEN a > 0 AND b > 0
                       THEN (CASE WHEN num >= 0 THEN 1 ELSE -1 END)
                            * (CASE WHEN a <= 10000000000000000
                                     AND b <= 10000000000000000
                                    THEN (num * num * 1000000) // (a * b)
                                    ELSE (rhov * rhov) // 1000000 END)
                       ELSE 0 END AS BIGINT) AS rho2_signed_micro,
             CAST(rhov AS BIGINT) AS rho_micro
      FROM q3
    """,

    "p_kendall_tau" -> """
      WITH d AS (
        SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS y
        FROM lineitem),
      cells AS MATERIALIZED (
        SELECT flag, x, y, count(*) AS c FROM d GROUP BY 1, 2, 3),
      s AS (
        SELECT a.flag,
               sum(CAST(a.c AS HUGEINT) * b.c *
                   CASE WHEN b.y > a.y THEN 1
                        WHEN b.y < a.y THEN -1 ELSE 0 END) AS s2
        FROM cells a JOIN cells b ON a.flag = b.flag AND a.x < b.x
        GROUP BY 1),
      tx AS (
        SELECT flag, sum(CAST(cx AS HUGEINT) * (cx - 1)) AS tx FROM (
          SELECT flag, x, sum(c) AS cx FROM cells GROUP BY 1, 2)
        GROUP BY 1),
      ty AS (
        SELECT flag, sum(CAST(cy AS HUGEINT) * (cy - 1)) AS ty FROM (
          SELECT flag, y, sum(c) AS cy FROM cells GROUP BY 1, 2)
        GROUP BY 1),
      tot AS (SELECT flag, sum(c) AS n FROM cells GROUP BY 1),
      j AS (
        SELECT tot.flag, tot.n, coalesce(s.s2, 0) AS s2,
               CAST(tot.n AS HUGEINT) * (tot.n - 1) - tx.tx AS p,
               CAST(tot.n AS HUGEINT) * (tot.n - 1) - ty.ty AS q
        FROM tot LEFT JOIN s ON s.flag = tot.flag
        JOIN tx ON tx.flag = tot.flag JOIN ty ON ty.flag = tot.flag),
      q0 AS (
        SELECT j.*,
               CAST(floor(sqrt(CAST(p * q AS DOUBLE))) AS HUGEINT) AS r0
        FROM j),
      q1 AS (
        SELECT q0.*, CASE WHEN (r0 + 1) * (r0 + 1) <= p * q THEN r0 + 1
                          ELSE r0 END AS r1 FROM q0),
      q2 AS (
        SELECT q1.*, CASE WHEN r1 * r1 > p * q THEN r1 - 1
                          ELSE r1 END AS rt FROM q1)
      SELECT flag, CAST(n AS BIGINT) AS n, CAST(s2 AS BIGINT) AS s_stat,
             CAST(CASE WHEN p > 0 AND q > 0
                       THEN (CASE WHEN s2 >= 0 THEN 1 ELSE -1 END)
                            * ((4 * s2 * s2 * 1000000) // (p * q))
                       ELSE 0 END AS BIGINT) AS tau2_signed_micro,
             CAST(CASE WHEN p > 0 AND q > 0
                       THEN least(greatest(
                              (2 * s2 * 1000000) // greatest(rt, 1),
                              -1000000), 1000000)
                       ELSE 0 END AS BIGINT) AS tau_micro
      FROM q2 ORDER BY flag
    """,

    "p_kruskal_wallis" -> """
      WITH d AS (
        SELECT event_type AS g, CAST(floor(value * 1000.0) AS BIGINT) AS v
        FROM events),
      cells AS MATERIALIZED (
        SELECT g, v, count(*) AS c FROM d GROUP BY 1, 2),
      vh AS (
        SELECT v, 2 * (cum - cv) + cv + 1 AS r2, cv FROM (
          SELECT v, cv, sum(cv) OVER (ORDER BY v) AS cum FROM (
            SELECT v, sum(c) AS cv FROM cells GROUP BY 1))),
      grp AS (
        SELECT g, sum(c) AS ng,
               sum(CAST(c AS HUGEINT) * r2) AS s2
        FROM cells JOIN vh USING (v) GROUP BY g),
      ties AS (
        SELECT coalesce(sum(CAST(cv AS HUGEINT) * cv * cv - cv), 0) AS t
        FROM vh),
      tot AS (SELECT sum(ng) AS n, count(*) AS k FROM grp),
      terms AS (
        SELECT n, k, t,
               sum((3 * CAST(s2 AS HUGEINT) * s2 * 1000000)
                   // (CAST(ng AS HUGEINT) * n * (n + 1))) AS hsum
        FROM grp, tot, ties GROUP BY 1, 2, 3),
      h AS (
        SELECT n, k,
               hsum - 3 * CAST(n + 1 AS HUGEINT) * 1000000 AS h_dec,
               CAST(n AS HUGEINT) * n * n - n AS n3n, t
        FROM terms)
      SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             CAST(h_dec AS BIGINT) AS h_micro,
             CAST(CASE WHEN n3n > t
                       THEN (h_dec * n3n) // (n3n - t)
                       ELSE 0 END AS BIGINT) AS h_adj_micro,
             (CASE WHEN n3n > t THEN (h_dec * n3n) // (n3n - t)
                   ELSE 0 END)
               >= (CASE k - 1 WHEN 1 THEN 3841458 WHEN 2 THEN 5991464
                   WHEN 3 THEN 7814727 WHEN 4 THEN 9487729
                   WHEN 5 THEN 11070497 WHEN 6 THEN 12591587 END)
               AS reject_05
      FROM h
    """,

    "p_cvm_drift" -> """
      WITH d AS (
        SELECT event_type AS t, CAST(floor(value * 1000.0) AS BIGINT) AS s
        FROM events WHERE event_type IN ('click', 'view')),
      c AS (
        SELECT s,
               sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END) AS c2
        FROM d GROUP BY s),
      cum AS (
        SELECT s, c1, c2, sum(c1) OVER (ORDER BY s) AS f1,
               sum(c2) OVER (ORDER BY s) AS f2
        FROM c),
      n AS (SELECT coalesce(sum(c1), 0) AS n1,
                   coalesce(sum(c2), 0) AS n2 FROM c),
      tn AS (
        SELECT n1, n2,
               sum(CAST(c1 + c2 AS HUGEINT)
                   * (CAST(f1 AS HUGEINT) * n2 - CAST(f2 AS HUGEINT) * n1)
                   * (CAST(f1 AS HUGEINT) * n2 - CAST(f2 AS HUGEINT) * n1))
                 AS tnum
        FROM cum, n GROUP BY 1, 2)
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             CAST(CASE WHEN n1 > 0 AND n2 > 0
                       THEN (tnum * 1000000)
                            // (CAST(n1 + n2 AS HUGEINT) * (n1 + n2)
                                * n1 * n2)
                       ELSE 0 END AS BIGINT) AS t_micro,
             (n1 > 0 AND n2 > 0
              AND tnum * 100000 >= CAST(46136 AS HUGEINT)
                  * (n1 + n2) * (n1 + n2) * n1 * n2) AS reject_05
      FROM tn
    """,

    "p_cochran_armitage" -> """
      WITH d AS (
        SELECT hour(ts) // 4 AS g,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
        FROM events),
      cells AS (
        SELECT g, count(*) AS ng, sum(y) AS rg FROM d GROUP BY 1),
      m AS (
        SELECT CAST(sum(ng) AS HUGEINT) AS n,
               CAST(sum(rg) AS HUGEINT) AS r,
               count(*) AS k,
               sum(CAST(g AS HUGEINT) * rg) AS t,
               sum(CAST(g AS HUGEINT) * ng) AS s1,
               sum(CAST(g AS HUGEINT) * g * ng) AS s2
        FROM cells),
      f AS (
        SELECT n, r, k, n * t - r * s1 AS num,
               r * (n - r) * (n * s2 - s1 * s1) AS den
        FROM m)
      SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
             CAST(k AS BIGINT) AS k,
             CAST(CASE WHEN den > 0
                  THEN (num * num * (n - 1) * 1000000) // den
                  ELSE 0 END AS BIGINT) AS z2_micro,
             num > 0 AS rising,
             (den > 0 AND num * num * (n - 1) * 1000000
                >= CAST(3841458 AS HUGEINT) * den) AS reject_05
      FROM f
    """,

    "p_friedman" -> """
      WITH cells AS MATERIALIZED (
        SELECT CAST(ts AS DATE) AS b, event_type AS j,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2),
      ka AS (SELECT count(DISTINCT j) AS k FROM cells),
      bc AS (SELECT b, count(*) AS bk FROM cells GROUP BY 1),
      comp AS MATERIALIZED (
        SELECT c.b, c.j, c.v
        FROM cells c JOIN bc ON bc.b = c.b, ka
        WHERE bc.bk = ka.k),
      nd AS (
        SELECT count(*) AS n_dropped FROM bc, ka WHERE bc.bk <> ka.k),
      rk AS (
        SELECT c.b, c.j,
               2 * sum(CASE WHEN c2.v < c.v THEN 1 ELSE 0 END)
               + sum(CASE WHEN c2.v = c.v THEN 1 ELSE 0 END) + 1 AS r2
        FROM comp c JOIN comp c2 ON c2.b = c.b
        GROUP BY c.b, c.j, c.v),
      sj AS (SELECT j, CAST(sum(r2) AS HUGEINT) AS s2 FROM rk GROUP BY 1),
      nb AS (SELECT count(DISTINCT b) AS n FROM comp),
      tt AS (
        SELECT coalesce(sum(CAST(t AS HUGEINT) * t * t - t), 0) AS tt
        FROM (SELECT b, v, count(*) AS t FROM comp GROUP BY 1, 2)),
      terms AS (
        SELECT n, k, tt, n_dropped,
               sum((3 * s2 * s2 * 1000000)
                   // (CAST(n AS HUGEINT) * k * (k + 1))) AS qsum
        FROM sj, nb, ka, tt, nd GROUP BY 1, 2, 3, 4),
      h AS (
        SELECT n, k, n_dropped, tt,
               qsum - 3 * CAST(n AS HUGEINT) * (k + 1) * 1000000 AS q_dec,
               CAST(n AS HUGEINT) * k * (k * k - 1) AS nkk
        FROM terms)
      SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
             CAST(n_dropped AS BIGINT) AS n_dropped,
             CAST(q_dec AS BIGINT) AS q_micro,
             CAST(CASE WHEN nkk > tt THEN (q_dec * nkk) // (nkk - tt)
                  ELSE 0 END AS BIGINT) AS q_adj_micro,
             (CASE WHEN nkk > tt THEN (q_dec * nkk) // (nkk - tt)
                   ELSE 0 END)
               >= (CASE k - 1 WHEN 1 THEN 3841458 WHEN 2 THEN 5991464
                   WHEN 3 THEN 7814727 WHEN 4 THEN 9487729
                   WHEN 5 THEN 11070497 WHEN 6 THEN 12591587 END)
               AS reject_05
      FROM h
    """,

    // OBF sequential replay: cumulative look cells, exact HUGEINT
    // cross-multiplied crossings, round6 z² from the same integers.
    "llm_ab_sequential" -> s"""
      WITH ev AS (
        SELECT event_type AS m, CAST(ts AS DATE) AS day, user_id % 2 AS arm,
               CAST(floor((value + CASE WHEN user_id % 2 = 1
                     AND event_type = 'error' THEN 25.0 ELSE 0 END)
                 * 100 + 0.5) AS HUGEINT) AS v
        FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      d0 AS (SELECT min(day) AS d0 FROM ev),
      lk AS (
        SELECT CAST(x AS BIGINT) AS look,
               (SELECT d0 FROM d0) + CAST(x * 6 - 1 AS INTEGER) AS cutoff
        FROM range(1, 6) t(x)),
      cells AS MATERIALIZED (
        SELECT m, day, arm, CAST(count(*) AS HUGEINT) AS n,
               sum(v) AS s, sum(v * v) AS q
        FROM ev GROUP BY 1, 2, 3),
      agg AS MATERIALIZED (
        SELECT c.m, l.look,
               sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS na,
               sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS nb,
               sum(CASE WHEN arm = 0 THEN s ELSE 0 END) AS sa,
               sum(CASE WHEN arm = 1 THEN s ELSE 0 END) AS sb,
               sum(CASE WHEN arm = 0 THEN q ELSE 0 END) AS qa,
               sum(CASE WHEN arm = 1 THEN q ELSE 0 END) AS qb
        FROM lk l JOIN cells c ON c.day <= l.cutoff
        GROUP BY 1, 2),
      sc AS MATERIALIZED (
        SELECT m, look, na, nb,
               (sb * na - sa * nb) * (sb * na - sa * nb) AS num,
               (na * qa - sa * sa) * nb + (nb * qb - sb * sb) * na AS brak
        FROM agg),
      sc2 AS MATERIALIZED (
        SELECT m, look, CAST(na + nb AS BIGINT) AS n_total,
               ${round6sql(
        "CAST(num * (na + nb - 2) AS DOUBLE)" +
        " / CAST((na + nb) * brak AS DOUBLE)")} AS z2,
               ${round6sql("13005.0 / (look * 625.0)")} AS boundary_z2,
               num * (na + nb - 2) * 625 * look
                 >= 13005 * (na + nb) * brak AS "cross"
        FROM sc)
      SELECT m AS metric, look, n_total, z2, boundary_z2, "cross",
             min(CASE WHEN "cross" THEN look END)
               OVER (PARTITION BY m) AS first_cross_look
      FROM sc2
      ORDER BY metric, look
    """,

    // PSI replay: reference-frozen decile boundaries by rank walk,
    // add-one ppm proportions, one micro-floored ln per bin.
    "p_psi_drift" -> """
      WITH ev AS (
        SELECT event_type AS m,
               CAST(ts AS DATE) <= DATE '2024-01-15' AS ref,
               CAST(floor((value + CASE WHEN event_type = 'error'
                     AND CAST(ts AS DATE) > DATE '2024-01-15'
                   THEN 25.0 ELSE 0 END) * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL),
      rh AS MATERIALIZED (
        SELECT m, cents, CAST(count(*) AS BIGINT) AS n
        FROM ev WHERE ref GROUP BY 1, 2),
      nr AS MATERIALIZED (
        SELECT m, CAST(sum(n) AS BIGINT) AS nr FROM rh GROUP BY 1),
      cum AS (
        SELECT m, cents,
               sum(n) OVER (PARTITION BY m ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM rh),
      bounds AS MATERIALIZED (
        SELECT c2.m, j.j, min(c2.cents) AS b
        FROM cum c2 JOIN nr USING (m)
        CROSS JOIN (SELECT CAST(x AS BIGINT) AS j FROM range(1, 10) t(x)) j
        WHERE c2.c >= (j.j * nr.nr + 9) // 10
        GROUP BY 1, 2),
      hist AS MATERIALIZED (
        SELECT m, ref, cents, CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY 1, 2, 3),
      cellbin AS (
        SELECT h.m, h.ref, h.cents, h.n,
               coalesce(sum(CASE WHEN b.b <= h.cents THEN 1 ELSE 0 END), 0)
                 AS bin
        FROM hist h LEFT JOIN bounds b ON b.m = h.m
        GROUP BY h.m, h.ref, h.cents, h.n),
      binned AS MATERIALIZED (
        SELECT m, bin, ref, CAST(sum(n) AS BIGINT) AS cnt
        FROM cellbin GROUP BY 1, 2, 3),
      tot AS MATERIALIZED (
        SELECT m, ref, CAST(sum(cnt) AS BIGINT) AS tot
        FROM binned GROUP BY 1, 2),
      spine AS (
        SELECT nr.m, CAST(x AS BIGINT) AS bin
        FROM nr CROSS JOIN range(0, 10) t(x)),
      cells AS (
        SELECT s.m, s.bin,
               coalesce(br.cnt, 0) AS cr, coalesce(bc.cnt, 0) AS cc,
               tr.tot AS ntr, tc.tot AS ntc
        FROM spine s
        JOIN tot tr ON tr.m = s.m AND tr.ref
        JOIN tot tc ON tc.m = s.m AND NOT tc.ref
        LEFT JOIN binned br ON br.m = s.m AND br.bin = s.bin AND br.ref
        LEFT JOIN binned bc ON bc.m = s.m AND bc.bin = s.bin
          AND NOT bc.ref),
      c2 AS (
        SELECT m, bin,
               ((cr + 1) * 1000000) // (ntr + 10) AS pr_ppm,
               ((cc + 1) * 1000000) // (ntc + 10) AS pc_ppm,
               CAST(floor(ln(CAST((cc + 1) * (ntr + 10) AS DOUBLE)
                 / CAST((cr + 1) * (ntc + 10) AS DOUBLE))
                 * 1000000 + 0.5) AS BIGINT) AS lnr
        FROM cells),
      c3 AS MATERIALIZED (
        SELECT m, bin, CAST(pr_ppm AS BIGINT) AS pr_ppm,
               CAST(pc_ppm AS BIGINT) AS pc_ppm,
               CAST(((pc_ppm - pr_ppm) * lnr) // 1000000 AS BIGINT)
                 AS psi_micro
        FROM c2)
      SELECT c3.m AS metric, c3.bin, coalesce(b.b, -1) AS lo_cents,
             pr_ppm, pc_ppm, psi_micro
      FROM c3 LEFT JOIN bounds b ON b.m = c3.m AND b.j = c3.bin
      UNION ALL
      SELECT m, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             CAST(sum(psi_micro) AS BIGINT)
      FROM c3 GROUP BY m
      ORDER BY metric, bin
    """,

    // Replays the SAME Neyman design at budget 200 (the shared CTE
    // generator), the md5-ranked draw, and both exact divisions.
    "llm_ht_estimate" -> s"""
      WITH ${neymanAllocCtes(200)},
      ranked AS (
        SELECT source AS h, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
               row_number() OVER (PARTITION BY source
                 ORDER BY md5('ht|' || CAST(doc_id AS VARCHAR)), doc_id)
                 AS rn
        FROM documents),
      samp AS (
        SELECT r.h, CAST(count(*) AS BIGINT) AS n_drawn,
               CAST(sum(r.toks) AS HUGEINT) AS s_samp
        FROM ranked r JOIN an ON an.h = r.h
        WHERE r.rn <= an.alloc_neyman
        GROUP BY 1),
      truth AS (
        SELECT source AS h, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                 AS true_tokens
        FROM documents GROUP BY 1),
      per AS (
        SELECT t.h, t.n_docs, s.n_drawn, t.true_tokens,
               CAST((CAST(t.n_docs AS HUGEINT) * s.s_samp * 1000000)
                 // s.n_drawn AS BIGINT) AS est
        FROM truth t JOIN samp s ON s.h = t.h),
      allr AS (
        SELECT '__ALL__' AS h, CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(n_drawn) AS BIGINT) AS n_drawn,
               CAST(sum(true_tokens) AS BIGINT) AS true_tokens,
               CAST(sum(est) AS BIGINT) AS est
        FROM per),
      u AS (
        SELECT CAST(h AS VARCHAR) AS h, n_docs, n_drawn, true_tokens, est
        FROM per
        UNION ALL
        SELECT * FROM allr)
      SELECT h AS source, n_docs, n_drawn, true_tokens,
             est AS est_tokens_micro,
             CAST((CAST(est AS HUGEINT)
               - CAST(true_tokens AS HUGEINT) * 1000000) * 1000000
               // (CAST(true_tokens AS HUGEINT) * 1000000) AS BIGINT)
               AS err_ppm
      FROM u ORDER BY source
    """,

    "llm_rater_kappa" -> """
      WITH base AS (
        SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS r0,
               CASE WHEN 10 * len(list_filter(ws,
                      x -> x IN ('the', 'a', 'of', 'to', 'in')))
                    <= len(ws) THEN 1 ELSE 0 END AS r1,
               CASE WHEN 5 * len(list_distinct(ws)) >= 2 * len(ws)
                    THEN 1 ELSE 0 END AS r2
        FROM (SELECT n_chars, string_split(text, ' ') AS ws
              FROM documents)),
      agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(r0) AS HUGEINT) AS s0,
               CAST(sum(r1) AS HUGEINT) AS s1,
               CAST(sum(r2) AS HUGEINT) AS s2,
               CAST(sum(r0*r1) AS HUGEINT) AS n11_01,
               CAST(sum((1-r0)*(1-r1)) AS HUGEINT) AS n00_01,
               CAST(sum(r0*r2) AS HUGEINT) AS n11_02,
               CAST(sum((1-r0)*(1-r2)) AS HUGEINT) AS n00_02,
               CAST(sum(r1*r2) AS HUGEINT) AS n11_12,
               CAST(sum((1-r1)*(1-r2)) AS HUGEINT) AS n00_12,
               CAST(sum(r0+r1+r2) AS HUGEINT) AS ss,
               CAST(sum((r0+r1+r2)*(r0+r1+r2-1)
                 + (3-r0-r1-r2)*(2-r0-r1-r2)) AS HUGEINT) AS aa
        FROM base),
      pr AS (
        SELECT 'len|stop' AS pair, n, n11_01 + n00_01 AS agree,
               s0 AS a1, s1 AS b1 FROM agg
        UNION ALL SELECT 'len|ttr', n, n11_02 + n00_02, s0, s2 FROM agg
        UNION ALL SELECT 'stop|ttr', n, n11_12 + n00_12, s1, s2 FROM agg),
      cohen AS (
        SELECT pair, n, agree, a1, b1,
               a1*b1 + (n-a1)*(n-b1) AS chance FROM pr),
      co AS (
        SELECT pair, n,
               (agree * 1000000) // n AS po_micro,
               (chance * 1000000) // (n*n) AS pe_micro,
               CASE WHEN n*n - chance = 0 THEN 0
                    ELSE ((n*agree - chance) * 1000000) // (n*n - chance)
               END AS kappa_micro
        FROM cohen),
      fl AS (
        SELECT 'fleiss' AS pair, n,
               (aa * 1000000) // (n*6) AS po_micro,
               ((ss*ss + (n*3-ss)*(n*3-ss)) * 1000000) // (n*n*9)
                 AS pe_micro,
               CASE WHEN (n*6) * (n*n*9 - (ss*ss + (n*3-ss)*(n*3-ss))) = 0
                    THEN 0
                    ELSE ((aa*n*n*9 - (n*6)*(ss*ss + (n*3-ss)*(n*3-ss)))
                          * 1000000)
                         // ((n*6) * (n*n*9 - (ss*ss + (n*3-ss)*(n*3-ss))))
               END AS kappa_micro
        FROM agg)
      SELECT pair, CAST(n AS BIGINT) AS n_items, 3 AS n_raters,
             CAST(po_micro AS BIGINT) AS po_micro,
             CAST(pe_micro AS BIGINT) AS pe_micro,
             CAST(kappa_micro AS BIGINT) AS kappa_micro
      FROM (SELECT * FROM co UNION ALL SELECT * FROM fl)
      ORDER BY pair
    """,

    // Replays the three gates, the one-pass pair/pooled sums, and the
    // exact-integer kappa ratios (// matches Spark truncDivDec on the
    // one signed division; po/pe numerators are nonnegative).
    // lcm(1..2) = 2 scaling; the three rater predicates replicate the
    // kappa oracle's, each gated by its abstention stratum.
    "llm_kripp_alpha" -> """
      WITH base AS (
        SELECT doc_id,
               CASE WHEN n_chars >= 250 THEN 'true' ELSE 'false' END AS v0,
               CASE WHEN 10 * len(list_filter(ws,
                      x -> x IN ('the', 'a', 'of', 'to', 'in')))
                    <= len(ws) THEN 'true' ELSE 'false' END AS v1,
               CASE WHEN 5 * len(list_distinct(ws)) >= 2 * len(ws)
                    THEN 'true' ELSE 'false' END AS v2
        FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
              FROM documents)),
      ratings AS (
        SELECT doc_id AS u, v0 AS c FROM base WHERE doc_id % 5 <> 0
        UNION ALL
        SELECT doc_id, v1 FROM base WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id, v2 FROM base WHERE doc_id % 3 <> 0),
      cells AS (SELECT u, c, count(*) AS cnt FROM ratings GROUP BY 1, 2),
      units AS (
        SELECT u, sum(cnt) AS m, sum(cnt * cnt) AS s2
        FROM cells GROUP BY u
        HAVING sum(cnt) >= 2),
      dor AS (
        SELECT coalesce(sum((2 // (m - 1)) * (m * m - s2)), 0)
                 AS do_scaled,
               coalesce(sum(m), 0) AS n, count(*) AS n_units
        FROM units),
      der AS (
        SELECT coalesce(sum(nc * nc), 0) AS snc2 FROM (
          SELECT c, sum(cnt) AS nc
          FROM cells JOIN units USING (u)
          GROUP BY c)),
      fin AS (
        SELECT n_units, n, do_scaled,
               2 * (n * n - snc2) AS de_scaled
        FROM dor, der)
      SELECT CAST(n_units AS BIGINT) AS n_units,
             CAST(n AS BIGINT) AS n_values,
             CAST(do_scaled AS BIGINT) AS do_scaled,
             CAST(de_scaled AS BIGINT) AS de_scaled,
             CASE WHEN de_scaled = 0 OR n <= 1 THEN 0.0
                  ELSE floor(CAST(de_scaled - (n - 1) * do_scaled
                         AS DOUBLE) / CAST(de_scaled AS DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0 END AS alpha
      FROM fin
    """,

    // Replays the closed form: distinct (source, word) pairs, the
    // per-word sharing count, and the exact lcm-scaled 1/c sum.
    "llm_shapley_coverage" -> """
      WITH pairs AS (
        SELECT DISTINCT source AS u, w
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w <> ''),
      cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c
              FROM pairs GROUP BY 1)
      SELECT u AS source,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique,
             CAST(sum(232792560 // c) AS BIGINT) AS shapley_scaled,
             CAST((CAST(sum(232792560 // c) AS HUGEINT) * 1000000)
               // 232792560 AS BIGINT) AS shapley_micro
      FROM pairs JOIN cnt USING (w)
      GROUP BY 1 ORDER BY 1
    """,

    // Same total window order, same round6 pinning of the two exact
    // ratio analytics; nth_value over the full-partition frame.
    "p_window_ranks" -> """
      WITH c AS (
        SELECT c_nationkey AS nation, c_custkey,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        FROM customer)
      SELECT nation, c_custkey, bal_cents,
             CAST(rank() OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0
               AS prank,
             floor(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0
               AS cdist,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             nth_value(bal_cents, 2) OVER (PARTITION BY nation
               ORDER BY bal_cents DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_bal
      FROM c
      WINDOW w AS (PARTITION BY nation ORDER BY bal_cents DESC, c_custkey)
      ORDER BY nation, rnk, c_custkey
    """,

    // Replays the md5-bucketed match schedule and all 15 MM rounds as
    // unrolled MATERIALIZED CTEs (s$r is referenced twice per round —
    // inlining would double the plan per round, the X192 lesson).
    "llm_bradley_terry" -> {
      val rounds = (1 to 15).map { r =>
        val p = r - 1
        s"""      dn$r AS (
        SELECT pr.i,
               CAST(sum((pr.nij * 1000000000000) // (si.s + sj.s))
                 AS BIGINT) AS dd
        FROM pairs pr JOIN s$p si ON si.i = pr.i
                      JOIN s$p sj ON sj.i = pr.j
        GROUP BY 1),
      raw$r AS (
        SELECT pl.i,
               greatest(1, (pl.n_wins * 1000000000000) // dn$r.dd) AS s
        FROM pl JOIN dn$r ON dn$r.i = pl.i),
      s$r AS MATERIALIZED (
        SELECT i, CAST(greatest(1, (s * t.p * 1000000) // t.t)
          AS BIGINT) AS s
        FROM raw$r CROSS JOIN (
          SELECT CAST(sum(s) AS BIGINT) AS t,
                 CAST(count(*) AS BIGINT) AS p FROM raw$r) t)"""
      }.mkString(",\n")
      s"""
      WITH d AS (
        SELECT doc_id, source, n_chars,
               CAST('0x' || substr(md5('bt|' || CAST(doc_id AS VARCHAR)),
                 1, 8) AS BIGINT) AS h
        FROM documents),
      r AS (
        SELECT doc_id, source, n_chars, h,
               row_number() OVER win AS rn,
               lead(doc_id) OVER win AS oid,
               lead(source) OVER win AS osrc,
               lead(n_chars) OVER win AS olen
        FROM d WINDOW win AS (PARTITION BY h % 16 ORDER BY h, doc_id)),
      m AS MATERIALIZED (
        SELECT CASE WHEN n_chars > olen
                      OR (n_chars = olen AND doc_id < oid)
                    THEN source ELSE osrc END AS winner,
               CASE WHEN n_chars > olen
                      OR (n_chars = olen AND doc_id < oid)
                    THEN osrc ELSE source END AS loser
        FROM r
        WHERE rn % 2 = 1 AND oid IS NOT NULL AND source <> osrc),
      dw AS MATERIALIZED (
        SELECT winner AS i, loser AS j, CAST(count(*) AS BIGINT) AS w
        FROM m GROUP BY 1, 2),
      pairs AS MATERIALIZED (
        SELECT i, j, CAST(sum(wij) AS BIGINT) AS wij,
               CAST(sum(wij) + sum(wji) AS BIGINT) AS nij
        FROM (SELECT i, j, w AS wij, 0 AS wji FROM dw
              UNION ALL SELECT j, i, 0, w FROM dw)
        GROUP BY 1, 2),
      pl AS MATERIALIZED (
        SELECT i, CAST(sum(wij) AS BIGINT) AS n_wins,
               CAST(sum(nij) AS BIGINT) AS n_games
        FROM pairs GROUP BY 1),
      s0 AS MATERIALIZED (
        SELECT i, CAST(1000000 AS BIGINT) AS s FROM pl),
$rounds
      SELECT pl.i AS player, pl.n_wins, pl.n_games,
             s15.s AS strength_micro
      FROM pl JOIN s15 ON s15.i = pl.i
      ORDER BY strength_micro DESC, player
    """
    },

    // Replays both histogram rank walks and the constant-folded
    // integer outlier clearing.
    "llm_mad_outliers" -> s"""
      WITH base AS (
        SELECT event_type AS m,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL),
      h1 AS (
        SELECT m, c AS v, count(*) AS cnt FROM base GROUP BY 1, 2),
      med AS (
        SELECT m, n, min(v) AS median_cents FROM (
          SELECT m, v, sum(cnt) OVER (PARTITION BY m ORDER BY v) AS cum,
                 sum(cnt) OVER (PARTITION BY m) AS n
          FROM h1)
        WHERE cum >= (n + 1) // 2 GROUP BY 1, 2),
      resid AS (
        SELECT b.m, abs(b.c - med.median_cents) AS r
        FROM base b JOIN med ON med.m = b.m),
      h2 AS (
        SELECT m, r AS v, count(*) AS cnt FROM resid GROUP BY 1, 2),
      mad AS (
        SELECT m, min(v) AS mad_cents FROM (
          SELECT m, v, sum(cnt) OVER (PARTITION BY m ORDER BY v) AS cum,
                 sum(cnt) OVER (PARTITION BY m) AS n
          FROM h2)
        WHERE cum >= (n + 1) // 2 GROUP BY 1)
      SELECT b.m AS event_type, CAST(med.n AS BIGINT) AS n,
             med.median_cents, mad.mad_cents,
             CAST(sum(CASE WHEN abs(b.c - med.median_cents) * 10000
               > 44478 * mad.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
             ${round6sql(
               "sum(CASE WHEN abs(b.c - med.median_cents) * 10000" +
               " > 44478 * mad.mad_cents THEN 1 ELSE 0 END) * 1000000" +
               " / CAST(med.n AS DOUBLE)")} AS outlier_ppm
      FROM base b
      JOIN med ON med.m = b.m
      JOIN mad ON mad.m = b.m
      GROUP BY b.m, med.n, med.median_cents, mad.mad_cents
      ORDER BY event_type
    """,

    // Replays the per-stratum 2x2 tables (b/d derived as n1-a/n0-c so
    // a null event_type lands identically in both engines), the
    // once-floored micro terms, and both exact divisions.
    "llm_ab_cmh" -> s"""
      WITH cells0 AS (
        SELECT dayofweek(ts) + 1 AS stratum,
               CAST(sum(CASE WHEN user_id % 2 = 1
                 AND event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS BIGINT) AS a,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n1,
               CAST(sum(CASE WHEN user_id % 2 = 0
                 AND event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS BIGINT) AS c,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n0
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      cells AS (
        SELECT stratum, a, n1 - a AS b, c, n0 - c AS d, n1 + n0 AS n
        FROM cells0 WHERE n1 + n0 > 1),
      terms AS (
        SELECT stratum, a, b, c, d,
               (CAST(a + b AS HUGEINT) * (a + c) * 1000000) // n AS e_mu,
               (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
                 * 1000000) // (CAST(n AS HUGEINT) * n * (n - 1)) AS v_mu,
               (CAST(a AS HUGEINT) * d * 1000000) // n AS orn_mu,
               (CAST(b AS HUGEINT) * c * 1000000) // n AS ord_mu
        FROM cells),
      sums AS (
        SELECT CAST(sum(a) AS HUGEINT) AS sa, sum(e_mu) AS se,
               sum(v_mu) AS sv, sum(orn_mu) AS sorn, sum(ord_mu) AS sord
        FROM terms)
      SELECT * FROM (
        SELECT CAST(stratum AS VARCHAR) AS stratum, a, b, c, d,
               CAST(e_mu AS BIGINT) AS e_mu, CAST(v_mu AS BIGINT) AS v_mu,
               CAST(NULL AS BIGINT) AS chi2_micro,
               CAST(NULL AS DOUBLE) AS or_mh,
               CAST(NULL AS BOOLEAN) AS reject
        FROM terms
        UNION ALL
        SELECT '__CMH__', NULL, NULL, NULL, NULL, NULL, NULL,
               CAST(((sa * 1000000 - se) * (sa * 1000000 - se))
                 // sv AS BIGINT),
               CASE WHEN sord > 0 THEN
                 ${round6sql(
                   "CAST(sorn AS DOUBLE) / CAST(sord AS DOUBLE)")}
               END,
               ((sa * 1000000 - se) * (sa * 1000000 - se))
                 // sv >= 3841459
        FROM sums)
      ORDER BY stratum
    """,

    // The SAME JVM-folded ln constants as the Spark plan, interpolated
    // as integer literals — the engines cannot disagree on a
    // transcendental they never evaluate.
    "llm_ab_sprt" -> {
      val a = EventOps.sprtUpperMicro(0.05, 0.05)
      val b = EventOps.sprtLowerMicro(0.05, 0.05)
      val parts = sprtScenarios.map { case (nm, p0, p1) =>
        val (l1, l0) = EventOps.sprtIncrementsMicro(p0, p1)
        val llr = s"k_cum * ($l1) + (n_cum - k_cum) * ($l0)"
        s"""SELECT '$nm' AS scenario, day,
           CAST(n_cum AS BIGINT) AS n_cum, CAST(k_cum AS BIGINT) AS k_cum,
           CAST($llr AS BIGINT) AS llr_micro,
           CASE WHEN $llr >= $a THEN 'accept_h1'
                WHEN $llr <= $b THEN 'accept_h0'
                ELSE 'continue' END AS verdict
        FROM cum"""
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS BIGINT) AS k
        FROM events GROUP BY 1),
      cum AS (
        SELECT day, sum(n) OVER (ORDER BY day) AS n_cum,
               sum(k) OVER (ORDER BY day) AS k_cum
        FROM daily)
      SELECT * FROM (
        $parts)
      ORDER BY scenario, day
    """
    },

    "llm_neyman_alloc" -> s"""
      WITH ${neymanAllocCtes(1000)}
      SELECT sig.h AS source, sig.n AS n_docs, sig.sigma_micro,
             CAST(ap.alloc_prop AS BIGINT) AS alloc_prop,
             CAST(an.alloc_neyman AS BIGINT) AS alloc_neyman
      FROM sig JOIN ap ON ap.h = sig.h JOIN an ON an.h = sig.h
      ORDER BY source
    """,

    // Replays the per-(metric, arm) histogram and the nine decile
    // rank walks per arm.
    "llm_ab_qte" -> """
      WITH base AS (
        SELECT event_type AS m, user_id % 2 AS arm,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL),
      hist AS (
        SELECT m, arm, c, CAST(count(*) AS BIGINT) AS cnt
        FROM base GROUP BY 1, 2, 3),
      h AS (
        SELECT m, arm, c,
               sum(cnt) OVER (PARTITION BY m, arm ORDER BY c) AS cum
        FROM hist),
      tot AS (
        SELECT m, arm, CAST(sum(cnt) AS BIGINT) AS n
        FROM hist GROUP BY 1, 2),
      dec9 AS (
        SELECT h.m, h.arm, v.q, min(h.c) AS v
        FROM h JOIN tot t USING (m, arm),
             (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) v(q)
        WHERE h.cum * 10 >= v.q * t.n
        GROUP BY 1, 2, 3)
      SELECT a0.m AS event_type, a0.q, a0.v AS v0_cents, a1.v AS v1_cents,
             a1.v - a0.v AS qte_cents
      FROM (SELECT * FROM dec9 WHERE arm = 0) a0
      JOIN (SELECT * FROM dec9 WHERE arm = 1) a1
        ON a1.m = a0.m AND a1.q = a0.q
      ORDER BY event_type, a0.q
    """,

    // Replays the per-(metric, arm) histogram, the four arg_min rank
    // lookups, and the exact boundary-cell multiplicity arithmetic.
    "llm_ab_robust" -> """
      WITH base AS (
        SELECT event_type AS m, user_id % 2 AS arm,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL),
      hist AS (
        SELECT m, arm, c, CAST(count(*) AS BIGINT) AS cnt
        FROM base GROUP BY 1, 2, 3),
      h AS (
        SELECT m, arm, c, cnt,
               sum(cnt) OVER (PARTITION BY m, arm ORDER BY c) AS cum,
               sum(cnt * c) OVER (PARTITION BY m, arm ORDER BY c) AS cumv
        FROM hist),
      tot AS (
        SELECT m, arm, CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum(cnt * c) AS HUGEINT) AS s,
               CAST(sum(cnt) AS BIGINT) // 10 AS k
        FROM hist GROUP BY 1, 2),
      rk AS (
        SELECT h.m, h.arm, arg_min(h.c, h.c) AS c,
               arg_min(h.cum, h.c) AS cum, arg_min(h.cnt, h.c) AS cnt,
               arg_min(h.cumv, h.c) AS cumv
        FROM h JOIN tot t USING (m, arm)
        WHERE t.k >= 1 AND h.cum >= t.k GROUP BY 1, 2),
      rk1 AS (
        SELECT h.m, h.arm, arg_min(h.c, h.c) AS c
        FROM h JOIN tot t USING (m, arm)
        WHERE h.cum >= t.k + 1 GROUP BY 1, 2),
      rnk AS (
        SELECT h.m, h.arm, arg_min(h.c, h.c) AS c
        FROM h JOIN tot t USING (m, arm)
        WHERE h.cum >= t.n - t.k GROUP BY 1, 2),
      rnk1 AS (
        SELECT h.m, h.arm, arg_min(h.c, h.c) AS c,
               arg_min(h.cum, h.c) AS cum, arg_min(h.cumv, h.c) AS cumv
        FROM h JOIN tot t USING (m, arm)
        WHERE h.cum >= t.n - t.k + 1 GROUP BY 1, 2),
      sel AS (
        SELECT t.m, t.arm, t.n, t.k, t.s,
               CASE WHEN t.k = 0 THEN 0
                 ELSE rk.cumv - rk.cnt * rk.c
                      + (t.k - (rk.cum - rk.cnt)) * rk.c END AS bot,
               CASE WHEN t.k = 0 THEN 0
                 ELSE t.s - rnk1.cumv
                      + (rnk1.cum - (t.n - t.k)) * rnk1.c END AS top,
               rk1.c AS vk1, rnk.c AS vnk
        FROM tot t
        LEFT JOIN rk USING (m, arm) LEFT JOIN rk1 USING (m, arm)
        LEFT JOIN rnk USING (m, arm) LEFT JOIN rnk1 USING (m, arm)),
      fin AS (
        SELECT m, arm, n, k, s, s - bot - top AS tsum,
               s - bot - top + CASE WHEN k = 0 THEN 0
                 ELSE k * vk1 + k * vnk END AS wsum
        FROM sel)
      SELECT m AS event_type, arm, n, k AS k_trim,
             CAST((s * 10000) // n AS BIGINT) AS mean_micro,
             CAST((tsum * 10000) // (n - 2 * k) AS BIGINT)
               AS trimmed_micro,
             CAST((wsum * 10000) // n AS BIGINT) AS winsor_micro
      FROM fin
      ORDER BY event_type, arm
    """,

    // Replays the planted shift, the per-metric cents histogram, the
    // cross-multiplied CDF difference, and the single HUGEINT
    // division.
    "p_emd_drift" -> s"""
      WITH ev AS (
        SELECT event_type AS m,
               CAST(floor((CASE WHEN event_type = 'error'
                   AND CAST(ts AS DATE) > DATE '2024-01-15'
                 THEN value + 25.0 ELSE value END) * 100 + 0.5)
                 AS BIGINT) AS c,
               (ts >= TIMESTAMP '2024-01-16') AS post
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL),
      hist AS (
        SELECT m, c, sum(CASE WHEN post THEN 0 ELSE 1 END) AS n1,
               sum(CASE WHEN post THEN 1 ELSE 0 END) AS n2
        FROM ev GROUP BY 1, 2),
      h AS (
        SELECT m, c,
               sum(n1) OVER (PARTITION BY m ORDER BY c) AS cum1,
               sum(n2) OVER (PARTITION BY m ORDER BY c) AS cum2,
               lead(c) OVER (PARTITION BY m ORDER BY c) - c AS gap
        FROM hist),
      tot AS (
        SELECT m, CAST(sum(n1) AS BIGINT) AS n1t,
               CAST(sum(n2) AS BIGINT) AS n2t
        FROM hist GROUP BY 1
        HAVING sum(n1) > 0 AND sum(n2) > 0),
      terms AS (
        SELECT h.m,
               sum(abs(CAST(cum1 AS HUGEINT) * t.n2t
                 - CAST(cum2 AS HUGEINT) * t.n1t) * gap) AS num
        FROM h JOIN tot t ON t.m = h.m
        WHERE gap IS NOT NULL
        GROUP BY 1)
      SELECT event_type, n_pre, n_post, emd_micro,
             ${round6sql("emd_micro / 1e6")} AS emd
      FROM (
        SELECT t.m AS event_type, t.n1t AS n_pre, t.n2t AS n_post,
               coalesce(CAST((x.num * 1000000)
                 // (CAST(t.n1t AS HUGEINT) * t.n2t * 100) AS BIGINT), 0)
                 AS emd_micro
        FROM tot t LEFT JOIN terms x ON x.m = t.m)
      ORDER BY event_type
    """,

    // Hill replay: descending cumulative histogram walk, tie-exact
    // top-k multiplicities, micro-floored ln per distinct value.
    "llm_tail_index" -> """
      WITH hist AS MATERIALIZED (
        SELECT m, cents, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT event_type AS m,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
              FROM events WHERE value IS NOT NULL AND value > 0)
        WHERE cents > 0
        GROUP BY 1, 2),
      cum AS MATERIALIZED (
        SELECT m, cents, n,
               coalesce(sum(n) OVER (PARTITION BY m ORDER BY cents DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
               CAST(floor(ln(cents) * 1000000 + 0.5) AS BIGINT) AS ln_mu
        FROM hist),
      ref AS (
        SELECT m, max(cents) AS x_ref_cents,
               max(CASE WHEN cb < 101 THEN ln_mu END) AS lnref
        FROM cum WHERE cb + n >= 101 GROUP BY m),
      top AS (
        SELECT m, CAST(sum(least(n, 100 - cb) * ln_mu) AS BIGINT) AS sln,
               CAST(sum(least(n, 100 - cb)) AS BIGINT) AS kk
        FROM cum WHERE cb < 100 GROUP BY m)
      SELECT t.m AS metric, t.kk AS k, r.x_ref_cents,
             CAST((t.sln - t.kk * r.lnref) // t.kk AS BIGINT) AS h_micro,
             CAST(1000000000000
               // ((t.sln - t.kk * r.lnref) // t.kk) AS BIGINT) AS alpha_ppm
      FROM top t JOIN ref r USING (m)
      WHERE t.kk = 100
      ORDER BY metric
    """,

    // Power-analysis replay: exact HUGEINT moments, constant-folded z,
    // ceil via (a + b − 1) // b.
    "llm_power_analysis" -> """
      WITH q AS (
        SELECT event_type AS metric,
               CAST(floor(value * 1000000 + 0.5) AS HUGEINT) AS v
        FROM events WHERE value IS NOT NULL),
      m AS (
        SELECT metric, CAST(count(*) AS HUGEINT) AS n,
               sum(v) AS s, sum(v * v) AS ss
        FROM q GROUP BY 1),
      d AS (
        SELECT metric, CAST(n AS BIGINT) AS n_obs,
               CAST(s // n AS BIGINT) AS mean_micro,
               CAST((n * ss - s * s) // (n * (n - 1)) AS BIGINT)
                 AS var_micro2
        FROM m),
      d2 AS (
        SELECT *, (mean_micro * 5) // 100 AS mde_micro FROM d)
      SELECT metric, n_obs, mean_micro, var_micro2, mde_micro,
             CAST((2 * 784 * CAST(var_micro2 AS HUGEINT)
                 + 100 * CAST(mde_micro AS HUGEINT) * mde_micro - 1)
               // (100 * CAST(mde_micro AS HUGEINT) * mde_micro)
               AS BIGINT) AS n_required_per_arm
      FROM d2 ORDER BY metric
    """,

    // Simpson audit replay: identical day-of-week strata partition
    // (bijective offset), exact cross-product contrasts.
    "llm_simpson_audit" -> """
      WITH ev AS (
        SELECT event_type AS m, dayofweek(CAST(ts AS DATE)) + 1 AS g,
               user_id % 2 AS arm,
               CAST(floor(value * 1000000 + 0.5) AS HUGEINT) AS v
        FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      cells AS MATERIALIZED (
        SELECT m, g,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT)
                 AS na,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                 AS nb,
               sum(CASE WHEN arm = 0 THEN v ELSE 0 END) AS sa,
               sum(CASE WHEN arm = 1 THEN v ELSE 0 END) AS sb
        FROM ev GROUP BY 1, 2),
      strata AS (
        SELECT m, CAST(count(*) AS BIGINT) AS n_strata,
               CAST(sum(CASE WHEN nb * sa - na * sb > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_favor_a,
               CAST(sum(CASE WHEN nb * sa - na * sb < 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_favor_b
        FROM cells GROUP BY 1),
      overall AS (
        SELECT m, CAST(sum(nb) * sum(sa) - sum(na) * sum(sb) AS BIGINT)
                 AS overall_diff
        FROM cells GROUP BY 1)
      SELECT o.m AS metric, o.overall_diff, s.n_strata, s.n_favor_a,
             s.n_favor_b,
             (o.overall_diff > 0 AND s.n_favor_a = 0 AND s.n_favor_b > 0)
             OR (o.overall_diff < 0 AND s.n_favor_b = 0
                 AND s.n_favor_a > 0) AS reversal
      FROM overall o JOIN strata s USING (m) ORDER BY metric
    """,

    // Permutation panel + BH: replay the fan-out (b=0 observed, b≥1
    // md5 user parity), exact integer cross-product statistic, exact
    // rational p, integer step-up condition p_num·10·m ≤ k·64.
    "llm_ab_fdr" -> s"""
      WITH ev AS (
        SELECT event_type AS m, user_id AS u,
               CAST(floor((value + CASE WHEN user_id % 2 = 1
                             AND event_type = 'error'
                           THEN 25.0 ELSE 0 END) * 1000000 + 0.5)
                    AS HUGEINT) AS v
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL),
      bs AS (SELECT CAST(x AS INT) AS b FROM range(0, 64) t(x)),
      fanned AS (
        SELECT m, v, b,
               CASE WHEN b = 0 THEN CAST(u % 2 AS INT)
                    ELSE CAST('0x' || substr(md5('perm' ||
                           CAST(b AS VARCHAR) || '|' ||
                           CAST(u AS VARCHAR)), 1, 4) AS INT) % 2
               END AS arm
        FROM ev, bs),
      cells AS MATERIALIZED (
        SELECT m, b,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT)
                 AS na,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                 AS nb,
               sum(CASE WHEN arm = 0 THEN v ELSE 0 END) AS sa,
               sum(CASE WHEN arm = 1 THEN v ELSE 0 END) AS sb
        FROM fanned GROUP BY 1, 2),
      tstat AS MATERIALIZED (
        SELECT m, b, abs(nb * sa - na * sb) AS t FROM cells),
      obs AS (SELECT m, t AS t_obs FROM tstat WHERE b = 0),
      pn AS MATERIALIZED (
        SELECT t.m, o.t_obs,
               CAST(1 + sum(CASE WHEN t.t >= o.t_obs THEN 1 ELSE 0 END)
                    AS BIGINT) AS p_num
        FROM tstat t JOIN obs o ON t.m = o.m
        WHERE t.b >= 1 GROUP BY 1, 2),
      ranked AS MATERIALIZED (
        SELECT m, t_obs, p_num,
               row_number() OVER (ORDER BY p_num, m) AS bh_rank,
               (SELECT count(*) FROM pn) AS mtot
        FROM pn),
      kstar AS (
        SELECT coalesce(max(bh_rank), 0) AS k FROM ranked
        WHERE p_num * 10 * mtot <= bh_rank * 64)
      SELECT m AS metric, CAST(t_obs AS BIGINT) AS t_obs, p_num,
             ${round6sql("p_num / 64.0")} AS p,
             bh_rank, bh_rank <= (SELECT k FROM kstar) AS reject
      FROM ranked
      ORDER BY metric
    """,

    // Mondrian split conformal: exact order statistics from value /
    // residual histograms, ceil ranks via integer //.
    "llm_conformal" -> s"""
      WITH ev AS (
        SELECT event_type AS g,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               CAST('0x' || substr(md5('conf|' ||
                 CAST(event_id AS VARCHAR)), 1, 4) AS INT) % 2 = 0 AS cal
        FROM events
        WHERE value IS NOT NULL AND event_id IS NOT NULL),
      ch AS MATERIALIZED (
        SELECT g, cents, CAST(count(*) AS BIGINT) AS n
        FROM ev WHERE cal GROUP BY 1, 2),
      ncal AS (SELECT g, CAST(sum(n) AS BIGINT) AS n_cal FROM ch GROUP BY 1),
      pred AS MATERIALIZED (
        SELECT g, n_cal, min(cents) AS pred_cents
        FROM (SELECT ch.g, ch.cents, nc.n_cal,
                     sum(ch.n) OVER (PARTITION BY ch.g ORDER BY ch.cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM ch JOIN ncal nc ON ch.g = nc.g)
        WHERE cum >= (n_cal + 1) // 2
        GROUP BY 1, 2),
      rh AS MATERIALIZED (
        SELECT e.g, abs(e.cents - p.pred_cents) AS r,
               CAST(count(*) AS BIGINT) AS n
        FROM ev e JOIN pred p ON e.g = p.g
        WHERE e.cal GROUP BY 1, 2),
      qhat AS MATERIALIZED (
        SELECT g, min(r) AS qhat_cents
        FROM (SELECT rh.g, rh.r, p.n_cal,
                     sum(rh.n) OVER (PARTITION BY rh.g ORDER BY rh.r
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM rh JOIN pred p ON rh.g = p.g)
        WHERE cum >= ((n_cal + 1) * 90 + 99) // 100
        GROUP BY 1)
      SELECT e.g AS event_type, p.n_cal, p.pred_cents, q.qhat_cents,
             CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN abs(e.cents - p.pred_cents) <= q.qhat_cents
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
             ${round6sql(
               "sum(CASE WHEN abs(e.cents - p.pred_cents) <= q.qhat_cents " +
               "THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)")} AS coverage
      FROM ev e
      JOIN pred p ON e.g = p.g
      JOIN qhat q ON e.g = q.g
      WHERE NOT e.cal
      GROUP BY 1, 2, 3, 4
      ORDER BY event_type
    """,

    "llm_ab_did" -> s"""
      WITH panel AS (
        SELECT user_id AS u, user_id % 2 AS treated,
               CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
                 AS post,
               sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS y
        FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2, 3),
      cells AS (
        SELECT treated, post, CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(y AS HUGEINT)) AS s,
               sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS ss
        FROM panel GROUP BY 1, 2),
      d AS (
        SELECT treated, post, n,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 AS mean,
               CAST(n * ss - s * s AS DOUBLE)
                 / CAST(n * (n - 1) AS DOUBLE) / 1e12
                 / CAST(n AS DOUBLE) AS v
        FROM cells)
      SELECT CAST(tp.n AS BIGINT) AS n_t_pre,
             CAST(ta.n AS BIGINT) AS n_t_post,
             CAST(cp.n AS BIGINT) AS n_c_pre,
             CAST(ca.n AS BIGINT) AS n_c_post,
             ${round6sql("tp.mean")} AS mean_t_pre,
             ${round6sql("ta.mean")} AS mean_t_post,
             ${round6sql("cp.mean")} AS mean_c_pre,
             ${round6sql("ca.mean")} AS mean_c_post,
             ${round6sql("(ta.mean - tp.mean) - (ca.mean - cp.mean)")}
               AS did,
             ${round6sql("sqrt(tp.v + ta.v + cp.v + ca.v)")} AS se,
             ${round6sql("((ta.mean - tp.mean) - (ca.mean - cp.mean))" +
               " / sqrt(tp.v + ta.v + cp.v + ca.v)")} AS t_stat
      FROM (SELECT * FROM d WHERE treated = 1 AND post = 0) tp,
           (SELECT * FROM d WHERE treated = 1 AND post = 1) ta,
           (SELECT * FROM d WHERE treated = 0 AND post = 0) cp,
           (SELECT * FROM d WHERE treated = 0 AND post = 1) ca
    """,

    "llm_ratio_jackknife" -> s"""
      WITH cells AS (
        SELECT user_id % 2 AS arm,
               CAST('0x' || substr(md5('rjk|' || CAST(user_id AS VARCHAR)),
                 1, 4) AS BIGINT) % 32 AS bkt,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 AS BIGINT) AS xb,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS yb
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1, 2),
      tot AS (
        SELECT arm, CAST(sum(xb) AS HUGEINT) AS xt,
               CAST(sum(yb) AS HUGEINT) AS yt, count(*) AS nb
        FROM cells GROUP BY 1),
      pseudo AS (
        SELECT c.arm, t.nb, t.xt, t.yt,
               (CAST(t.xt - c.xb AS HUGEINT) * 1000000) // (t.yt - c.yb)
                 AS rb
        FROM cells c JOIN tot t USING (arm)),
      pa AS (
        SELECT arm, any_value(nb) AS nb, any_value(xt) AS xt,
               any_value(yt) AS yt,
               (CAST(sum((rb - rbar) * (rb - rbar)) AS HUGEINT)
                 * (any_value(nb) - 1)) // any_value(nb) AS se2
        FROM (SELECT *, sum(rb) OVER (PARTITION BY arm) // nb AS rbar
              FROM pseudo)
        GROUP BY arm),
      fin AS (
        SELECT arm, CAST(nb AS BIGINT) AS n_buckets,
               (xt * 1000000) // yt AS r_mu, se2
        FROM pa)
      SELECT a0.n_buckets AS n_buckets_0, a1.n_buckets AS n_buckets_1,
             CAST(a0.r_mu AS BIGINT) AS r0_mu,
             CAST(a1.r_mu AS BIGINT) AS r1_mu,
             CAST(a0.se2 AS BIGINT) AS se2_0,
             CAST(a1.se2 AS BIGINT) AS se2_1,
             ${round6sql(
               "(CAST(a1.r_mu AS BIGINT) - CAST(a0.r_mu AS BIGINT))" +
               " / sqrt(CAST(a0.se2 AS DOUBLE) + CAST(a1.se2 AS DOUBLE))")}
               AS z
      FROM (SELECT * FROM fin WHERE arm = 0) a0,
           (SELECT * FROM fin WHERE arm = 1) a1
    """,

    "llm_ab_cuped" -> s"""
      WITH per AS (
        SELECT user_id AS u, user_id % 2 AS variant,
               sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN
                 CAST(floor(value * 1000000 + 0.5) AS BIGINT) ELSE 0 END) AS x,
               sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN
                 CAST(floor(value * 1000000 + 0.5) AS BIGINT) ELSE 0 END) AS y
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2),
      mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
               sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        FROM per),
      t AS (
        SELECT CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
                 * 1000000.0 + 0.5) AS BIGINT) AS theta_mu,
               CAST(floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 AS BIGINT) AS xbar_mu
        FROM mom),
      adj AS (
        SELECT variant, y,
               y - (theta_mu * (x - xbar_mu)) // 1000000 AS ya,
               theta_mu
        FROM per, t),
      m AS (
        SELECT variant, CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
               sum(CAST(ya AS HUGEINT)) AS sa,
               sum(CAST(ya AS HUGEINT) * CAST(ya AS HUGEINT)) AS saa,
               any_value(theta_mu) AS theta_mu
        FROM adj GROUP BY variant)
      SELECT variant, CAST(n AS BIGINT) AS n_users, theta_mu,
             ${round6sql("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 1e6")}
               AS mean_raw,
             ${round6sql("CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) / 1e6")}
               AS mean_adj,
             ${round6sql("CAST(n * syy - sy * sy AS DOUBLE)" +
               " / CAST(n * (n - 1) AS DOUBLE) / 1e12")} AS var_raw,
             ${round6sql("CAST(n * saa - sa * sa AS DOUBLE)" +
               " / CAST(n * (n - 1) AS DOUBLE) / 1e12")} AS var_adj,
             ${round6sql("1.0 - (CAST(n * saa - sa * sa AS DOUBLE)" +
               " / CAST(n * (n - 1) AS DOUBLE) / 1e12)" +
               " / (CAST(n * syy - sy * sy AS DOUBLE)" +
               " / CAST(n * (n - 1) AS DOUBLE) / 1e12)")} AS var_reduction
      FROM m
      ORDER BY variant
    """,

    "llm_bootstrap_ci" -> s"""
      WITH base AS (
        SELECT event_type, CAST(event_id AS VARCHAR) AS id,
               CAST(floor(value * 1000000 + 0.5) AS HUGEINT) AS vmu
        FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL),
      wt AS (
        SELECT event_type, CAST(t.r AS BIGINT) AS r, vmu,
               CAST('0x' || substr(md5('boot-v1|' || id || '|'
                 || CAST(t.r AS VARCHAR)), 1, 12) AS BIGINT) AS h
        FROM base, range(0, 32) t(r)),
      rm AS (
        SELECT event_type, r,
               sum(CAST((h >= 103548857136060) AS BIGINT)
                 + CAST((h >= 207097714272121) AS BIGINT)
                 + CAST((h >= 258872142840152) AS BIGINT)
                 + CAST((h >= 276130285696162) AS BIGINT)
                 + CAST((h >= 280444821410164) AS BIGINT)
                 + CAST((h >= 281307728552965) AS BIGINT)) AS neff,
               sum((CAST((h >= 103548857136060) AS BIGINT)
                 + CAST((h >= 207097714272121) AS BIGINT)
                 + CAST((h >= 258872142840152) AS BIGINT)
                 + CAST((h >= 276130285696162) AS BIGINT)
                 + CAST((h >= 280444821410164) AS BIGINT)
                 + CAST((h >= 281307728552965) AS BIGINT)) * vmu) AS s
        FROM wt GROUP BY 1, 2),
      rmeans AS (
        SELECT event_type,
               ${round6sql(
                 "CAST(s AS DOUBLE) / CAST(neff AS DOUBLE) / 1e6")} AS mean_r
        FROM rm WHERE neff > 0),
      f AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               ${round6sql(
                 "CAST(sum(vmu) AS DOUBLE) / CAST(count(*) AS DOUBLE)" +
                 " / 1e6")} AS mean_full
        FROM base GROUP BY 1),
      ci AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_reps,
               ${round6sql("quantile_cont(mean_r, 0.025)")} AS ci_lo,
               ${round6sql("quantile_cont(mean_r, 0.5)")} AS ci_mid,
               ${round6sql("quantile_cont(mean_r, 0.975)")} AS ci_hi
        FROM rmeans GROUP BY 1)
      SELECT f.event_type, f.n, f.mean_full, ci.n_reps,
             ci.ci_lo, ci.ci_mid, ci.ci_hi
      FROM f JOIN ci USING (event_type) ORDER BY event_type
    """,

    "llm_stump_split" -> """
      WITH h AS MATERIALIZED (
        SELECT CAST(floor(embedding[1] * 1000.0) AS BIGINT) AS x,
               CAST(label AS BIGINT) AS y, count(*) AS c
        FROM embeddings GROUP BY 1, 2),
      cls AS (SELECT y, sum(c) AS cy FROM h GROUP BY 1),
      tot AS (SELECT CAST(sum(cy) AS HUGEINT) AS n,
                     sum(CAST(cy AS HUGEINT) * cy) AS sc2 FROM cls),
      spine AS (
        SELECT xs.x, ys.y, coalesce(h.c, 0) AS c
        FROM (SELECT DISTINCT x FROM h) xs
        CROSS JOIN (SELECT DISTINCT y FROM h) ys
        LEFT JOIN h ON h.x = xs.x AND h.y = ys.y),
      cum AS (
        SELECT x, y, sum(c) OVER (PARTITION BY y ORDER BY x) AS cum
        FROM spine),
      j AS (SELECT cum.x, cum.cum, cls.cy
            FROM cum JOIN cls ON cls.y = cum.y),
      perT AS (
        SELECT x AS t, sum(cum) AS nl,
               sum(CAST(cum AS HUGEINT) * cum) AS sl2,
               sum(CAST(cy - cum AS HUGEINT) * (cy - cum)) AS sr2
        FROM j GROUP BY 1),
      sc AS (
        SELECT t, nl, n - nl AS nr,
               (sl2 * 1000000) // nl
                 + (sr2 * 1000000) // (n - nl) AS score
        FROM perT, tot WHERE nl > 0 AND nl < n),
      best AS (SELECT * FROM sc ORDER BY score DESC, t LIMIT 1)
      SELECT CAST(t AS BIGINT) AS threshold, CAST(nl AS BIGINT) AS n_left,
             CAST(nr AS BIGINT) AS n_right,
             CAST(score AS BIGINT) AS score_micro,
             CAST((sc2 * 1000000) // n AS BIGINT) AS parent_micro,
             score > (sc2 * 1000000) // n AS purifies
      FROM best, tot
    """,

    "llm_woe_iv" -> s"""
      WITH base AS (
        SELECT CAST(floor((CASE WHEN event_type = 'error' THEN value + 20.0
                 ELSE value END) * 1000000 + 0.5) AS BIGINT) AS f,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS bad
        FROM events WHERE value IS NOT NULL),
      e AS (
        SELECT quantile_cont(f, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
                                 0.9]) AS edges
        FROM base),
      binned AS (
        SELECT 1 + list_sum(list_transform(edges,
                 x -> CASE WHEN f > x THEN 1 ELSE 0 END)) AS bin, bad
        FROM base CROSS JOIN e),
      counts AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(bad) AS BIGINT) AS n_bad
        FROM binned GROUP BY bin),
      tot AS (SELECT sum(n) AS tn, sum(n_bad) AS tb FROM counts),
      d AS (
        SELECT bin, n, n_bad,
               (CAST(n - n_bad AS DOUBLE) + 0.5)
                 / (CAST(tn - tb AS DOUBLE) + 5.0) AS gs,
               (CAST(n_bad AS DOUBLE) + 0.5)
                 / (CAST(tb AS DOUBLE) + 5.0) AS bs
        FROM counts CROSS JOIN tot)
      SELECT CAST(bin AS INT) AS bin, n, n_bad,
             ${round6sql("CAST(n_bad AS DOUBLE) / CAST(n AS DOUBLE)")}
               AS bad_rate,
             ${round6sql("ln(gs / bs)")} AS woe,
             ${round6sql("(gs - bs) * ln(gs / bs)")} AS iv_contrib
      FROM d ORDER BY bin
    """,

    "llm_dp_release" -> s"""
      WITH g AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n_true
        FROM documents GROUP BY 1, 2),
      h AS (
        SELECT lang, source, n_true,
               (CAST(CAST('0x' || substr(md5('dp-epoch-1|' || lang || '|'
                  || source), 1, 12) AS BIGINT) AS DOUBLE) + 0.5)
                 / 281474976710656.0 AS u
        FROM g)
      SELECT lang, source, n_true,
             ${round6sql("CAST(n_true AS DOUBLE) + (-(1.0) * sign(u - 0.5)" +
               " * ln(1.0 - 2.0 * abs(u - 0.5)))")} AS released
      FROM h ORDER BY lang, source
    """,

    "llm_quantile_norm" -> s"""
      WITH base AS (
        SELECT event_id,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_micro
        FROM events WHERE value IS NOT NULL),
      hist AS (
        SELECT value_micro, CAST(count(*) AS BIGINT) AS c
        FROM base GROUP BY 1),
      tot AS (SELECT sum(c) AS n FROM hist),
      ranked AS (
        SELECT value_micro, c,
               coalesce(sum(c) OVER (ORDER BY value_micro
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS below
        FROM hist)
      SELECT b.event_id, b.value_micro,
             ${round6sql("(CAST(below AS DOUBLE) + 0.5 * CAST(c AS DOUBLE))" +
               " / CAST(n AS DOUBLE)")} AS qnorm
      FROM base b JOIN ranked USING (value_micro) CROSS JOIN tot
      ORDER BY b.event_id
    """,

    "llm_vocab_jsd" -> """
      WITH d AS (
        SELECT doc_id, CASE WHEN doc_id % 10 = 1
                 THEN text || ' newslang' ELSE text END AS text2
        FROM documents),
      ta AS (
        SELECT unnest(string_split(text2, ' ')) AS term
        FROM d WHERE doc_id % 2 = 0),
      tb AS (
        SELECT unnest(string_split(text2, ' ')) AS term
        FROM d WHERE doc_id % 2 = 1),
      ca AS (SELECT term, CAST(count(*) AS BIGINT) AS c_a
             FROM ta GROUP BY 1),
      cb AS (SELECT term, CAST(count(*) AS BIGINT) AS c_b
             FROM tb GROUP BY 1),
      j AS (
        SELECT coalesce(ca.term, cb.term) AS term,
               coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
        FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
      tot AS (SELECT sum(c_a) AS tta, sum(c_b) AS ttb FROM j),
      e AS (
        SELECT term, c_a, c_b,
               CAST(c_a AS DOUBLE) / CAST(tta AS DOUBLE) AS p,
               CAST(c_b AS DOUBLE) / CAST(ttb AS DOUBLE) AS q
        FROM j CROSS JOIN tot)
      SELECT term, c_a, c_b,
             CAST(floor(
               ((CASE WHEN c_a = 0 THEN 0.0
                      ELSE 0.5 * p * ln(p / ((p + q) / 2.0)) END)
                + (CASE WHEN c_b = 0 THEN 0.0
                       ELSE 0.5 * q * ln(q / ((p + q) / 2.0)) END))
               * 1000000000.0 + 0.5) AS BIGINT) AS jsd_nano
      FROM e ORDER BY term
    """,

    "llm_chi_square" -> s"""
      WITH d AS (SELECT lang, source FROM documents),
      cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n_xy
        FROM d GROUP BY 1, 2),
      rowm AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_x
               FROM d GROUP BY 1),
      colm AS (SELECT source, CAST(count(*) AS BIGINT) AS n_y
               FROM d GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      grid AS (
        SELECT r.lang, c.source, r.n_x, c.n_y, t.n,
               coalesce(cl.n_xy, 0) AS n_xy
        FROM rowm r CROSS JOIN colm c CROSS JOIN tot t
        LEFT JOIN cells cl ON cl.lang = r.lang AND cl.source = c.source)
      SELECT lang, source, n_xy,
             ${round6sql("CAST(n_x AS DOUBLE) * n_y / n")} AS expected,
             ${round6sql(
        "(CAST(n_xy AS DOUBLE) - CAST(n_x AS DOUBLE) * n_y / n)" +
          " * (CAST(n_xy AS DOUBLE) - CAST(n_x AS DOUBLE) * n_y / n)" +
          " / (CAST(n_x AS DOUBLE) * n_y / n)")} AS contribution
      FROM grid
      ORDER BY lang, source
    """,

    "llm_rank_normalize" -> s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      q AS (
        SELECT doc_id,
               CAST(floor(($qualitySqlCol) * 1000) AS BIGINT) AS q_mq
        FROM d),
      h AS (SELECT q_mq, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY q_mq),
      c AS (
        SELECT q_mq, n,
               coalesce(CAST(sum(n) OVER (ORDER BY q_mq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS n_below
        FROM h),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn FROM h)
      SELECT doc_id, q_mq,
             ${round6sql("(n_below + 0.5 * n) / CAST(tn AS DOUBLE)")} AS rank_pct
      FROM q JOIN c USING (q_mq), tot
      ORDER BY doc_id
    """,

    "llm_outlier_clip" -> s"""
      WITH e AS (
        SELECT list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        FROM embeddings),
      x AS (
        SELECT generate_subscripts(qv, 1) - 1 AS dim, unnest(qv) AS q FROM e),
      st AS (
        SELECT dim, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS BIGINT) AS s,
               CAST(sum(q * q) AS BIGINT) AS qq
        FROM x GROUP BY dim),
      b AS (
        SELECT dim, n, s,
               sqrt(CAST(n * qq - s * s AS DOUBLE)) AS dev
        FROM st)
      SELECT CAST(x.dim AS INT) AS dim, b.n,
             floor((s - 2.0 * dev) / n * 1000000.0 + 0.5) / 1000000.0 AS lo_q,
             floor((s + 2.0 * dev) / n * 1000000.0 + 0.5) / 1000000.0 AS hi_q,
             CAST(sum(CASE WHEN CAST(n * q AS DOUBLE) < s - 2.0 * dev
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
             CAST(sum(CASE WHEN CAST(n * q AS DOUBLE) > s + 2.0 * dev
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi
      FROM x JOIN b USING (dim)
      GROUP BY x.dim, b.n, b.s, b.dev ORDER BY dim
    """,

    // Full recompute — equality against the Spark-side base ⊎ delta merge
    // proves the monoid-state identity cross-engine.
    "llm_incr_agg" -> s"""
      SELECT source AS key,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(n_chars) AS BIGINT) AS sum_sz,
             min(doc_id) AS min_id, max(doc_id) AS max_id,
             ${round6sql("CAST(sum(n_chars) AS DOUBLE) / count(*)")} AS avg_sz
      FROM documents GROUP BY source ORDER BY key
    """,

    // Recursive-CTE dup groups (the X187 oracle machinery) feed the
    // fold key; the k complement models and the exact integer
    // mean/variance replay the Spark math verbatim.
    "llm_cv_folds" -> s"""
      WITH RECURSIVE $simhashPairsCte,
      edges AS (
        SELECT doc_a, doc_b FROM pairs
        WHERE bit_count(xor(sim_a, sim_b)) <= 3),
      sym AS (
        SELECT doc_a AS node, doc_b AS nbr FROM edges
        UNION ALL
        SELECT doc_b, doc_a FROM edges),
      reach(node, label) AS (
        SELECT node, node FROM sym
        UNION
        SELECT s.node, r.label FROM sym s JOIN reach r ON s.nbr = r.node),
      cc AS (SELECT node, min(label) AS group_id FROM reach GROUP BY node),
      rep AS (
        SELECT d.doc_id, d.text, coalesce(cc.group_id, d.doc_id) AS group_rep
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.node),
      basef AS MATERIALIZED (
        SELECT doc_id, text, group_rep,
               CAST('0x' || substr(md5('cvf|' || CAST(group_rep AS VARCHAR)),
                 1, 4) AS INT) % 5 AS fold
        FROM rep),
      cvt AS MATERIALIZED (
        SELECT fold,
               CAST('0x' || substr(md5('slm|' || w), 1, 4) AS INT) % 256 AS b
        FROM (SELECT fold, unnest(string_split(text, ' ')) AS w FROM basef)),
      fb AS MATERIALIZED (
        SELECT g.fold, g.b, coalesce(s.c, 0) AS c
        FROM (SELECT f.fold, t.b
              FROM (SELECT unnest(range(5)) AS fold) f
              CROSS JOIN (SELECT unnest(range(256)) AS b) t) g
        LEFT JOIN (SELECT fold, b, count(*) AS c FROM cvt GROUP BY 1, 2) s
          USING (fold, b)),
      tb AS (SELECT b, CAST(sum(c) AS BIGINT) AS tc FROM fb GROUP BY b),
      nf AS (SELECT fold, CAST(sum(c) AS BIGINT) AS nf FROM fb GROUP BY fold),
      tt AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM fb),
      nll AS MATERIALIZED (
        SELECT fb.fold, fb.b,
               CAST(floor(-ln(CAST(tb.tc - fb.c + 1 AS DOUBLE)
                 / CAST(tt.tt - nf.nf + 256 AS DOUBLE)) * 1000000.0 + 0.5)
                 AS BIGINT) AS nll_mu
        FROM (fb JOIN tb USING (b)) JOIN nf USING (fold) CROSS JOIN tt),
      pf AS MATERIALIZED (
        SELECT fold, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(floor(CAST(sum(nll_mu) AS DOUBLE) / count(*)) AS BIGINT)
                 AS xent_micro
        FROM cvt JOIN nll USING (fold, b) GROUP BY fold),
      nd AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_docs
             FROM basef GROUP BY fold),
      mv1 AS (SELECT CAST(floor(CAST(sum(xent_micro) AS DOUBLE) / 5)
                AS BIGINT) AS mean FROM pf),
      mv2 AS (SELECT CAST(floor(CAST(sum((xent_micro - mean)
                * (xent_micro - mean)) AS DOUBLE) / 5) AS BIGINT) AS varr
              FROM pf CROSS JOIN mv1)
      SELECT part, k, sym, n FROM (
        SELECT 'fold' AS part, CAST(fold AS BIGINT) AS k, 'n_docs' AS sym,
               n_docs AS n FROM nd
        UNION ALL
        SELECT 'fold', CAST(fold AS BIGINT), 'n_tokens', n_tokens FROM pf
        UNION ALL
        SELECT 'fold', CAST(fold AS BIGINT), 'xent_micro', xent_micro FROM pf
        UNION ALL
        SELECT 'cv', CAST(NULL AS BIGINT), 'n_groups',
               CAST(count(DISTINCT group_rep) AS BIGINT) FROM basef
        UNION ALL
        SELECT 'cv', CAST(NULL AS BIGINT), 'mean_micro', mean FROM mv1
        UNION ALL
        SELECT 'cv', CAST(NULL AS BIGINT), 'var_micro2', varr FROM mv2)
      ORDER BY part, k, sym
    """,

    // No loops to unroll — nested subsets cumulate from one (level,
    // bucket) table and the OLS is closed-form; every float step is the
    // same fixed-order IEEE expression as the Spark side.
    "llm_scaling_law" -> """
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
               CAST('0x' || substr(md5('ho|' || CAST(doc_id AS VARCHAR)), 1, 4)
                 AS INT) % 8 = 0 AS ho,
               CAST('0x' || substr(md5('lvl|' || CAST(doc_id AS VARCHAR)), 1, 4)
                 AS INT) % 8 AS lvl
        FROM documents),
      tok AS MATERIALIZED (
        SELECT ho, lvl,
               CAST('0x' || substr(md5('slm|' || w), 1, 4) AS INT) % 256 AS b
        FROM (SELECT ho, lvl, unnest(ws) AS w FROM d)),
      lc AS (SELECT lvl, b, count(*) AS c FROM tok WHERE NOT ho GROUP BY 1, 2),
      lt(i, kk) AS (VALUES (1, 1), (2, 2), (3, 4), (4, 8)),
      mc AS MATERIALIZED (
        SELECT g.i, g.b, coalesce(s.c, 0) AS c
        FROM (SELECT lt.i, t.b
              FROM lt CROSS JOIN (SELECT unnest(range(256)) AS b) t) g
        LEFT JOIN (SELECT lt.i, lc.b, CAST(sum(c) AS BIGINT) AS c
                   FROM lc CROSS JOIN lt WHERE lc.lvl < lt.kk
                   GROUP BY 1, 2) s USING (i, b)),
      sz AS MATERIALIZED (
        SELECT i, CAST(sum(c) AS BIGINT) AS n_train FROM mc GROUP BY i),
      nll AS MATERIALIZED (
        SELECT mc.i, mc.b,
               CAST(floor(-ln(CAST(mc.c + 1 AS DOUBLE)
                 / CAST(sz.n_train + 256 AS DOUBLE)) * 1000000.0 + 0.5)
                 AS BIGINT) AS nll_mu
        FROM mc JOIN sz USING (i)),
      ps AS MATERIALIZED (
        SELECT i, sz.n_train,
               CAST(floor(CAST(sum(nll_mu) AS DOUBLE) / count(*)) AS BIGINT)
                 AS xent_micro,
               CAST(count(*) AS BIGINT) AS n_ho
        FROM (SELECT b FROM tok WHERE ho) h
        JOIN nll USING (b) JOIN sz USING (i)
        GROUP BY i, sz.n_train),
      pts AS (
        SELECT i,
               CAST(floor(ln(CAST(n_train AS DOUBLE)) * 1000000.0 + 0.5)
                 AS BIGINT) AS x,
               CAST(floor(ln(CAST(xent_micro AS DOUBLE)) * 1000000.0 + 0.5)
                 AS BIGINT) AS y
        FROM ps),
      mom AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM pts),
      fit1 AS MATERIALIZED (
        SELECT CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0
                 / CAST(n * sxx - sx * sx AS DOUBLE) + 0.5) AS BIGINT)
                 AS slope
        FROM mom),
      fit2 AS (
        SELECT f.slope,
               CAST(floor((CAST(m.sy AS DOUBLE)
                 - CAST(f.slope AS DOUBLE) / 1000000.0 * CAST(m.sx AS DOUBLE))
                 / CAST(m.n AS DOUBLE) + 0.5) AS BIGINT) AS icept
        FROM fit1 f CROSS JOIN mom m)
      SELECT part, k, sym, n FROM (
        SELECT 'size' AS part, CAST(i AS BIGINT) AS k, 'train_tokens' AS sym,
               n_train AS n FROM ps
        UNION ALL
        SELECT 'size', CAST(i AS BIGINT), 'xent_micro', xent_micro FROM ps
        UNION ALL
        SELECT 'fit', CAST(NULL AS BIGINT), 'slope_micro', slope FROM fit2
        UNION ALL
        SELECT 'fit', CAST(NULL AS BIGINT), 'intercept_micro', icept FROM fit2
        UNION ALL
        SELECT 'fit', CAST(NULL AS BIGINT), 'n_heldout_tokens',
               (SELECT max(n_ho) FROM ps))
      ORDER BY part, k, sym
    """,

    "llm_calibration" -> {
      val (lrA, lrB, clA, clB) = (5, 250, 100000, 2000)
      val rounds = (1 to 8).map { r =>
        val p = r - 1
        s"""      d$r AS MATERIALIZED (
        SELECT s.doc_id, s.z, l.y,
               CAST(floor(CAST(ab.a * s.z AS DOUBLE) / 1000000.0) AS BIGINT)
                 + ab.b AS t
        FROM (z s JOIN lab l USING (doc_id)) CROSS JOIN ab$p ab),
      e$r AS MATERIALIZED (
        SELECT doc_id, z, y,
               least(1000000, greatest(0, (t + 2000) * 250)) - y * 1000000 AS e,
               CASE WHEN abs(t) <= 2000 THEN 1 ELSE 0 END AS inr
        FROM d$r),
      ab$r AS MATERIALIZED (
        SELECT ab.a - least($clA, greatest(-$clA,
                 CAST(floor(CAST(g.ga AS DOUBLE) / (nn.n * $lrA)) AS BIGINT))) AS a,
               ab.b - least($clB, greatest(-$clB,
                 CAST(floor(CAST(g.gb AS DOUBLE) / (nn.n * $lrB)) AS BIGINT))) AS b
        FROM ab$p ab
        CROSS JOIN (SELECT CAST(sum(e * z * inr) AS BIGINT) AS ga,
                           CAST(sum(e * inr) AS BIGINT) AS gb FROM e$r) g
        CROSS JOIN nn)"""
      }.mkString(",\n")
      val curveUnion = (1 to 8).map(r =>
        s"SELECT $r AS k, CAST(sum(abs(e)) AS BIGINT) AS n FROM e$r")
        .mkString("\n        UNION ALL ")
      s"""
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      f AS (
        SELECT doc_id,
               CAST('0x' || substr(md5('feat|' || w), 1, 4) AS INT) % 1024 AS b
        FROM w),
      fc AS (SELECT doc_id, b, count(*) AS c FROM f GROUP BY doc_id, b),
      m AS (
        SELECT CAST(g AS INT) AS b,
               (CAST('0x' || substr(md5('wgt|' || CAST(g AS VARCHAR)), 1, 4) AS INT)
                % 2001) - 1000 AS wt
        FROM generate_series(0, 1023) t(g)),
      z AS MATERIALIZED (
        SELECT doc_id,
               CAST(floor(CAST(sum(c * wt) AS DOUBLE) / sum(c)) AS BIGINT) AS z
        FROM fc JOIN m USING (b) GROUP BY doc_id),
      lab AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN len(list_filter(string_split(text, ' '),
                      w -> w IN ('the', 'a', 'of', 'to', 'and'))) * 1000
                    >= 61 * len(string_split(text, ' '))
                    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
        FROM documents),
      nn AS (SELECT count(*) AS n FROM z),
      ab0 AS MATERIALIZED (
        SELECT CAST(1000000 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b),
$rounds,
      pf AS MATERIALIZED (
        SELECT s.doc_id, l.y,
               least(1000000, greatest(0,
                 (CAST(floor(CAST(ab.a * s.z AS DOUBLE) / 1000000.0) AS BIGINT)
                  + ab.b + 2000) * 250)) AS p
        FROM (z s JOIN lab l USING (doc_id)) CROSS JOIN ab8 ab),
      p0 AS (
        SELECT s.doc_id, l.y,
               least(1000000, greatest(0, (s.z + 2000) * 250)) AS p
        FROM z s JOIN lab l USING (doc_id)),
      binf AS MATERIALIZED (
        SELECT least(p // 100000, 9) AS bin, CAST(count(*) AS BIGINT) AS nb,
               CAST(sum(p) AS BIGINT) AS conf, CAST(sum(y) AS BIGINT) AS pos
        FROM pf GROUP BY 1),
      bin0 AS (
        SELECT least(p // 100000, 9) AS bin,
               CAST(sum(p) AS BIGINT) AS conf, CAST(sum(y) AS BIGINT) AS pos
        FROM p0 GROUP BY 1)
      SELECT part, k, sym, n FROM (
        SELECT 'round' AS part, CAST(k AS BIGINT) AS k, '' AS sym, n
        FROM ($curveUnion)
        UNION ALL
        SELECT 'param', CAST(NULL AS BIGINT), 'a', a FROM ab8
        UNION ALL
        SELECT 'param', CAST(NULL AS BIGINT), 'b', b FROM ab8
        UNION ALL
        SELECT 'bin', bin, 'n', nb FROM binf
        UNION ALL
        SELECT 'bin', bin, 'conf', conf FROM binf
        UNION ALL
        SELECT 'bin', bin, 'pos', pos FROM binf
        UNION ALL
        SELECT 'ece', CAST(NULL AS BIGINT), 'before',
               CAST(floor(CAST((SELECT sum(abs(conf - pos * 1000000)) FROM bin0)
                 AS DOUBLE) / (SELECT n FROM nn)) AS BIGINT)
        UNION ALL
        SELECT 'ece', CAST(NULL AS BIGINT), 'after',
               CAST(floor(CAST((SELECT sum(abs(conf - pos * 1000000)) FROM binf)
                 AS DOUBLE) / (SELECT n FROM nn)) AS BIGINT))
      ORDER BY part, k, sym
    """
    },

    // 8 unrolled Platt-GD rounds over the llm_classifier score table;
    // same guarded-floor double divisions (all magnitudes < 2^53) and
    // hard-sigmoid region masks as the Spark side.
    // minimax-identity isotonic replay over the calibration logits:
    // same z/lab CTEs, then prefix sums, interval means, min-per-(i,j),
    // max-per-i — all over the <=16-row bin histogram
    "llm_isotonic" -> """
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      f AS (
        SELECT doc_id,
               CAST('0x' || substr(md5('feat|' || w), 1, 4) AS INT) % 1024 AS b
        FROM w),
      fc AS (SELECT doc_id, b, count(*) AS c FROM f GROUP BY doc_id, b),
      m AS (
        SELECT CAST(g AS INT) AS b,
               (CAST('0x' || substr(md5('wgt|' || CAST(g AS VARCHAR)), 1, 4) AS INT)
                % 2001) - 1000 AS wt
        FROM generate_series(0, 1023) t(g)),
      z AS MATERIALIZED (
        SELECT doc_id,
               CAST(floor(CAST(sum(c * wt) AS DOUBLE) / sum(c)) AS BIGINT) AS z
        FROM fc JOIN m USING (b) GROUP BY doc_id),
      lab AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN len(list_filter(string_split(text, ' '),
                      w -> w IN ('the', 'a', 'of', 'to', 'and'))) * 1000
                    >= 61 * len(string_split(text, ' '))
                    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
        FROM documents),
      zy AS (SELECT z.z, lab.y FROM z JOIN lab USING (doc_id)),
      bounds AS (SELECT min(z) AS zlo, max(z) AS zhi FROM zy),
      hist AS (
        SELECT least(((z - zlo) * 16) // (zhi - zlo + 1), 15) AS bin,
               CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
        FROM zy, bounds GROUP BY 1),
      pre AS MATERIALIZED (
        SELECT bin, n, pos,
               sum(n) OVER (ORDER BY bin) AS cn,
               sum(pos) OVER (ORDER BY bin) AS cp,
               row_number() OVER (ORDER BY bin) AS idx
        FROM hist),
      iv AS (
        SELECT a.idx AS j, b.idx AS k,
               ((b.cp - (a.cp - a.pos)) * 1000000)
                 // (b.cn - (a.cn - a.n)) AS m
        FROM pre a JOIN pre b ON a.idx <= b.idx),
      mn AS (
        SELECT p.idx AS i, p.bin, p.n, p.pos, iv.j, min(iv.m) AS mn
        FROM pre p JOIN iv ON iv.j <= p.idx AND iv.k >= p.idx
        GROUP BY 1, 2, 3, 4, 5)
      SELECT bin, n, pos, (pos * 1000000) // n AS raw_rate_mu,
             CAST(max(mn) AS BIGINT) AS iso_rate_mu
      FROM mn GROUP BY 1, 2, 3
      ORDER BY bin
    """,

    // All 5 IPF rounds unrolled; integer `//` end to end (the same
    // bigint-division bit-stability argument as the Spark side), sums
    // CAST from HUGEINT back to BIGINT at every boundary.
    "llm_ipf_raking" -> {
      val rounds = (1 to 5).map { r =>
        val p = r - 1
        s"""      s$r AS (
        SELECT source, CAST(sum(w * toks) AS BIGINT) AS mw
        FROM w$p GROUP BY source),
      a$r AS MATERIALIZED (
        SELECT w.source, w.lang, w.toks,
               (w.w * ((t.tgt_s * 1000000) // s.mw)) // 1000000 AS w
        FROM (w$p w JOIN s$r s USING (source)) CROSS JOIN tgt t),
      l$r AS (
        SELECT lang, CAST(sum(w * toks) AS BIGINT) AS mw
        FROM a$r GROUP BY lang),
      w$r AS MATERIALIZED (
        SELECT a.source, a.lang, a.toks,
               (a.w * ((t.tgt_l * 1000000) // l.mw)) // 1000000 AS w
        FROM (a$r a JOIN l$r l USING (lang)) CROSS JOIN tgt t)"""
      }.mkString(",\n")
      s"""
      WITH cells AS MATERIALIZED (
        SELECT source, lang,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
        FROM documents GROUP BY source, lang),
      tgt AS MATERIALIZED (
        SELECT (CAST(sum(toks) AS BIGINT) * 1000000)
                 // count(DISTINCT source) AS tgt_s,
               (CAST(sum(toks) AS BIGINT) * 1000000)
                 // count(DISTINCT lang) AS tgt_l
        FROM cells),
      w0 AS MATERIALIZED (
        SELECT source, lang, toks, CAST(1000000 AS BIGINT) AS w FROM cells),
$rounds
      SELECT part, source, lang, toks, w_micro, weighted_micro FROM (
        SELECT 'cell' AS part, source, lang, toks,
               CAST(w AS BIGINT) AS w_micro,
               CAST(w * toks AS BIGINT) AS weighted_micro
        FROM w5
        UNION ALL
        SELECT 'src', source, '', CAST(sum(toks) AS BIGINT),
               CAST(NULL AS BIGINT), CAST(sum(w * toks) AS BIGINT)
        FROM w5 GROUP BY source
        UNION ALL
        SELECT 'lang', '', lang, CAST(sum(toks) AS BIGINT),
               CAST(NULL AS BIGINT), CAST(sum(w * toks) AS BIGINT)
        FROM w5 GROUP BY lang)
      ORDER BY part, source, lang
    """
    },

    // Replays the System-R-with-heavy-hitters estimator: top-16 exact
    // keys (count DESC, user_id), residual under uniformity, integer
    // division throughout.
    "p_join_forecast" -> """
      WITH f AS (SELECT user_id, CAST(count(*) AS BIGINT) AS f
                 FROM events GROUP BY user_id),
      heavy AS (SELECT user_id, f FROM f
                ORDER BY f DESC, user_id LIMIT 16),
      hs AS (SELECT CAST(sum(f * f) AS BIGINT) AS hv,
                    CAST(sum(f) AS BIGINT) AS hn,
                    CAST(count(*) AS BIGINT) AS hd
             FROM heavy),
      tot AS (SELECT CAST(sum(f * f) AS BIGINT) AS exact,
                     CAST(sum(f) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS d
              FROM f),
      est AS (SELECT exact,
                     hv + CASE WHEN d - hd > 0
                               THEN ((n - hn) * (n - hn)) // (d - hd)
                               ELSE 0 END AS e
              FROM tot, hs)
      SELECT part, key, value FROM (
        SELECT 'heavy_key' AS part, user_id AS key, f AS value FROM heavy
        UNION ALL
        SELECT 'exact', CAST(-1 AS BIGINT), exact FROM est
        UNION ALL
        SELECT 'estimate', CAST(-1 AS BIGINT), CAST(e AS BIGINT) FROM est
        UNION ALL
        SELECT 'err_ppm', CAST(-1 AS BIGINT),
               CAST(abs(e - exact) * 1000000 // exact AS BIGINT) FROM est)
      ORDER BY part, key
    """,

    // Replays the runs(C|K) = Σ ndv_k − boundary-merges decomposition
    // per (key, target) pair; ndv and n from one global scan.
    "p_sortkey_advisor" -> {
      val keys = Seq("l_returnflag" -> "l_returnflag",
        "ship_month" -> "month(l_shipdate)", "l_suppkey" -> "l_suppkey")
      val targets = Seq("l_returnflag", "l_linestatus", "l_quantity",
        "l_suppkey")
      val pairSql = (for { (kn, ke) <- keys; cn <- targets } yield s"""
      SELECT '$kn' AS sort_key, '$cn' AS target_col,
             CAST(sum(ndvk) - sum(m) AS BIGINT) AS runs
      FROM (SELECT ndvk, mn, mx,
                   CASE WHEN lag(mx) OVER (ORDER BY k) = mn
                        THEN 1 ELSE 0 END AS m
            FROM (SELECT $ke AS k, count(DISTINCT $cn) AS ndvk,
                         min($cn) AS mn, max($cn) AS mx
                  FROM lineitem GROUP BY 1))""").mkString("\n      UNION ALL")
      s"""
      WITH pairs AS ($pairSql),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
      nd AS (${targets.map(cn =>
        s"SELECT '$cn' AS target_col, CAST(count(DISTINCT $cn) AS BIGINT) AS ndv FROM lineitem")
        .mkString("\n      UNION ALL ")})
      SELECT p.sort_key, p.target_col, g.n, nd.ndv, p.runs,
             ${round6sql("CAST(p.runs AS DOUBLE) / CAST(g.n AS DOUBLE)")}
               AS run_ratio
      FROM pairs p, g
      JOIN nd ON nd.target_col = p.target_col
      ORDER BY p.sort_key, p.target_col
    """
    },

    "llm_truth_vote" -> """
      WITH base AS (
        SELECT c_custkey AS entity, c_nationkey AS tru FROM customer),
      claims AS (
        SELECT entity, 'crawl_a' AS source,
               CASE WHEN entity % 7 = 0 THEN (tru + 1) % 25 ELSE tru END
                 AS val
        FROM base
        UNION ALL
        SELECT entity, 'crawl_b',
               CASE WHEN entity % 5 = 0 THEN (tru + 1) % 25 ELSE tru END
        FROM base
        UNION ALL
        SELECT entity, 'crawl_c',
               CASE WHEN entity % 3 = 0 THEN (tru + 1) % 25 ELSE tru END
        FROM base),
      v1 AS (
        SELECT entity, val, count(*) AS w FROM claims GROUP BY 1, 2),
      c1 AS (
        SELECT entity, val AS cons FROM (
          SELECT entity, val, row_number() OVER (
                   PARTITION BY entity ORDER BY w DESC, val) AS rn
          FROM v1) WHERE rn = 1),
      trust AS (
        SELECT source, sum(CASE WHEN val = cons THEN 1 ELSE 0 END) AS trust
        FROM claims JOIN c1 USING (entity) GROUP BY source),
      v2 AS (
        SELECT entity, val, sum(trust) AS w
        FROM claims JOIN trust USING (source) GROUP BY 1, 2),
      c2 AS (
        SELECT entity, val AS cons2 FROM (
          SELECT entity, val, row_number() OVER (
                   PARTITION BY entity ORDER BY w DESC, val) AS rn
          FROM v2) WHERE rn = 1)
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_claims,
             CAST(sum(CASE WHEN val = cons THEN 1 ELSE 0 END) AS BIGINT)
               AS match_r1,
             CAST(sum(CASE WHEN val = cons2 THEN 1 ELSE 0 END) AS BIGINT)
               AS match_r2,
             CAST(sum(CASE WHEN val = tru THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct
      FROM claims
      JOIN c1 USING (entity) JOIN c2 USING (entity) JOIN base USING (entity)
      GROUP BY source
      ORDER BY source
    """,

    "llm_ab_cliffs_delta" -> """
      WITH hist AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
               sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
               sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY 1),
      cum AS (
        SELECT n0, n1,
               coalesce(sum(n0) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS b0,
               coalesce(sum(n1) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS b1
        FROM hist),
      m AS (
        SELECT CAST(sum(n0) AS HUGEINT) AS n0,
               CAST(sum(n1) AS HUGEINT) AS n1,
               sum(CAST(n1 AS HUGEINT) * b0) AS gt,
               sum(CAST(n0 AS HUGEINT) * b1) AS lt
        FROM cum)
      SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
             CAST(gt AS BIGINT) AS gt_pairs,
             CAST(lt AS BIGINT) AS lt_pairs,
             CAST(gt - lt AS BIGINT) AS d_num,
             CAST(CASE WHEN n0 > 0 AND n1 > 0
                  THEN (CASE WHEN gt >= lt THEN 1 ELSE -1 END)
                       * ((abs(gt - lt) * 1000000) // (n0 * n1))
                  ELSE 0 END AS BIGINT) AS delta_micro,
             CASE WHEN n0 = 0 OR n1 = 0 THEN 'undefined'
                  WHEN abs(gt - lt) * 1000000 < 147000 * n0 * n1
                    THEN 'negligible'
                  WHEN abs(gt - lt) * 1000000 < 330000 * n0 * n1
                    THEN 'small'
                  WHEN abs(gt - lt) * 1000000 < 474000 * n0 * n1
                    THEN 'medium'
                  ELSE 'large' END AS magnitude
      FROM m
    """,

    "llm_fleiss_kappa" -> """
      WITH f AS MATERIALIZED (
        SELECT doc_id, len(string_split(text, ' ')) AS n,
               len(list_distinct(string_split(text, ' '))) AS nd,
               len(list_filter(string_split(text, ' '),
                 x -> x IN ('the', 'a', 'of', 'to', 'in'))) AS ns
        FROM documents),
      r AS (
        SELECT doc_id, CASE WHEN n < 40 THEN 0 WHEN n < 70 THEN 1
                            ELSE 2 END AS cat FROM f
        UNION ALL
        SELECT doc_id, CASE WHEN ns * 25 < n THEN 0
                            WHEN ns * 25 < n * 2 THEN 1 ELSE 2 END FROM f
        UNION ALL
        SELECT doc_id, CASE WHEN nd * 5 < n * 2 THEN 0
                            WHEN nd * 20 < n * 11 THEN 1 ELSE 2 END
        FROM f),
      cells AS MATERIALIZED (
        SELECT doc_id AS s, cat AS c, count(*) AS nij
        FROM r GROUP BY 1, 2),
      per AS (SELECT s, sum(nij * nij) AS sq, sum(nij) AS n
              FROM cells GROUP BY 1),
      panel AS (SELECT count(*) AS nsub, sum(sq) AS spraw,
                       min(n) AS nr FROM per),
      marg AS (
        SELECT count(*) AS k, sum(CAST(cj AS HUGEINT) * cj) AS sumc2
        FROM (SELECT c, sum(nij) AS cj FROM cells GROUP BY 1)),
      j AS (SELECT nsub, nr, k, spraw - nsub * nr AS sp, sumc2
            FROM panel, marg)
      SELECT CAST(nsub AS BIGINT) AS n_subjects,
             CAST(nr AS BIGINT) AS n_raters,
             CAST(k AS BIGINT) AS n_categories,
             CAST(sp AS BIGINT) AS sp, CAST(sumc2 AS BIGINT) AS sum_c2,
             CAST((CAST(sp AS HUGEINT) * 1000000)
                  // (CAST(nsub AS HUGEINT) * nr * (nr - 1)) AS BIGINT)
               AS pbar_micro,
             CAST((sumc2 * 1000000)
                  // (CAST(nsub AS HUGEINT) * nr * nsub * nr) AS BIGINT)
               AS pe_micro,
             CAST(CASE WHEN (nr - 1) * (CAST(nsub AS HUGEINT) * nr * nsub
                              * nr - sumc2) > 0
                  THEN (CASE WHEN CAST(sp AS HUGEINT) * nsub * nr
                               - sumc2 * (nr - 1) >= 0
                        THEN 1 ELSE -1 END)
                       * ((abs(CAST(sp AS HUGEINT) * nsub * nr
                               - sumc2 * (nr - 1)) * 1000000)
                          // ((nr - 1) * (CAST(nsub AS HUGEINT) * nr
                              * nsub * nr - sumc2)))
                  ELSE 0 END AS BIGINT) AS kappa_micro
      FROM j
    """,

    "llm_hll_audit" -> s"""
      WITH ws AS (
        SELECT lang, string_split(text, ' ') AS ws FROM documents),
      w AS MATERIALIZED (
        SELECT lang, unnest(CASE WHEN len(ws) >= 3
          THEN list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
          ELSE [] END) AS sh
        FROM ws),
      h AS (
        SELECT lang,
               CAST('0x' || substr(md5('hll|' || sh), 1, 15) AS BIGINT)
                 AS h
        FROM w),
      r AS (SELECT lang, h % 1024 AS idx, h // 1024 AS wf FROM h),
      reg AS (
        SELECT lang, idx,
               max(CASE WHEN wf = 0 THEN 51
                        ELSE 51 - length(bin(wf)) END) AS mj
        FROM r GROUP BY 1, 2),
      agg AS (
        SELECT lang, count(*) AS hit,
               sum(CAST(CAST(1 AS BIGINT) << (51 - mj) AS HUGEINT))
                 AS shit
        FROM reg GROUP BY 1),
      est AS (
        SELECT lang, hit, 1024 - hit AS v_empty,
               (CAST(${graft.operators.Hll.ALPHA_MICRO} AS HUGEINT)
                * 1024 * 1024 * ${1L << 51})
               // ((shit + CAST(1024 - hit AS HUGEINT) * ${1L << 51})
                   * 1000000) AS est
        FROM agg),
      ex AS (SELECT lang, count(DISTINCT sh) AS n_exact
             FROM w GROUP BY 1)
      SELECT ex.lang, CAST(n_exact AS BIGINT) AS n_exact,
             CAST(est AS BIGINT) AS est,
             CAST(v_empty AS BIGINT) AS v_empty,
             CAST(hit AS BIGINT) AS n_registers_hit,
             CAST((abs(est - n_exact) * 10000) // n_exact AS BIGINT)
               AS err_bp
      FROM ex JOIN est USING (lang) ORDER BY lang
    """,

    "p_cochran_q" -> """
      WITH cells AS MATERIALIZED (
        SELECT DISTINCT CAST(user_id AS VARCHAR) || '|'
                 || strftime(date_trunc('week', ts), '%Y-%m-%d') AS s,
               event_type AS t
        FROM events),
      rsum AS (
        SELECT count(*) AS n_subjects, sum(r) AS sumr,
               sum(CAST(r AS HUGEINT) * r) AS sumr2
        FROM (SELECT s, count(*) AS r FROM cells GROUP BY s)),
      csum AS (
        SELECT count(*) AS k, sum(c) AS sumc,
               sum(CAST(c AS HUGEINT) * c) AS sumc2
        FROM (SELECT t, count(*) AS c FROM cells GROUP BY t))
      SELECT CAST(k AS BIGINT) AS k,
             CAST(n_subjects AS BIGINT) AS n_subjects,
             CAST(sumc AS BIGINT) AS sum_c,
             CAST(sumc2 AS BIGINT) AS sum_c2,
             CAST(sumr2 AS BIGINT) AS sum_r2,
             CAST(CASE WHEN k * CAST(sumr AS HUGEINT) - sumr2 > 0
               THEN ((k - 1) * (k * sumc2 - CAST(sumc AS HUGEINT) * sumc)
                     * 1000000)
                    // (k * CAST(sumr AS HUGEINT) - sumr2)
               ELSE 0 END AS BIGINT) AS q_micro,
             (k * CAST(sumr AS HUGEINT) - sumr2 > 0
              AND (k - 1) * (k * sumc2 - CAST(sumc AS HUGEINT) * sumc)
                  * 1000000
                  >= (CASE k - 1 WHEN 1 THEN 3841458 WHEN 2 THEN 5991464
                        WHEN 3 THEN 7814727 WHEN 4 THEN 9487729
                        WHEN 5 THEN 11070497 WHEN 6 THEN 12591587 END)
                     * (k * CAST(sumr AS HUGEINT) - sumr2))
               AS reject_05
      FROM rsum, csum
    """,

    "llm_f2_sketch" -> """
      WITH wc AS MATERIALIZED (
        SELECT lang, w, count(*) AS c FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS w
          FROM documents)
        GROUP BY 1, 2),
      hb AS (
        SELECT lang, c,
               CAST('0x' || substr(md5('f2|' || w), 1, 15) AS BIGINT)
                 % 1073741824 AS hb
        FROM wc),
      s AS MATERIALIZED (
        SELECT lang, j.range AS j,
               sum((1 - ((((((2654435761 * (j.range + 1)) % 536870912)
                     * 2 + 1) * hb
                     + (40503 * (j.range + 1)) % 1073741824)
                    // 33554432) % 2) * 2) * c) AS s
        FROM hb CROSS JOIN range(56) j GROUP BY 1, 2),
      g AS MATERIALIZED (
        SELECT lang, j // 7 AS grp, sum(CAST(s AS HUGEINT) * s) AS gs
        FROM s GROUP BY 1, 2),
      r AS (
        SELECT lang, gs,
               row_number() OVER (PARTITION BY lang ORDER BY gs, grp)
                 AS rn
        FROM g),
      est AS (
        SELECT lang, CAST(sum(gs) // 14 AS BIGINT) AS f2_est
        FROM r WHERE rn IN (4, 5) GROUP BY 1),
      ex AS (
        SELECT lang, CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT)
                 AS f2_exact
        FROM wc GROUP BY 1)
      SELECT ex.lang, f2_exact, f2_est,
             CAST((abs(CAST(f2_est AS HUGEINT) - f2_exact) * 10000)
                  // f2_exact AS BIGINT) AS err_bp
      FROM ex JOIN est USING (lang) ORDER BY lang
    """,

    "llm_brier_decomp" -> """
      WITH d AS (
        SELECT len(string_split(text, ' ')) AS n,
               len(list_filter(string_split(text, ' '),
                 x -> x IN ('the', 'a', 'of', 'to', 'in'))) AS ns,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents),
      f AS (
        SELECT least(99, (300 * ns) // greatest(n, 1) + 1) AS f_pct, y
        FROM d),
      bins AS (
        SELECT f_pct // 10 AS bin, count(*) AS n_k, sum(y) AS o_k
        FROM f GROUP BY 1),
      tot AS (SELECT sum(n_k) AS n, sum(o_k) AS o FROM bins)
      SELECT CAST(bin AS BIGINT) AS bin,
             CAST(bin * 10 + 5 AS BIGINT) AS f_pct,
             CAST(n_k AS BIGINT) AS n_k, CAST(o_k AS BIGINT) AS o_k,
             CAST(n AS BIGINT) AS n, CAST(o AS BIGINT) AS o,
             CAST(((CAST(bin * 10 + 5 AS HUGEINT) * n_k - 100 * o_k)
                   * (CAST(bin * 10 + 5 AS HUGEINT) * n_k - 100 * o_k)
                   * 1000000)
                  // (CAST(10000 AS HUGEINT) * n_k * n) AS BIGINT)
               AS rel_micro,
             CAST(((CAST(o_k AS HUGEINT) * n - CAST(o AS HUGEINT) * n_k)
                   * (CAST(o_k AS HUGEINT) * n - CAST(o AS HUGEINT) * n_k)
                   * 1000000)
                  // (CAST(n_k AS HUGEINT) * n * n * n) AS BIGINT)
               AS res_micro,
             CAST((CAST(o AS HUGEINT) * (n - o) * 1000000)
                  // (CAST(n AS HUGEINT) * n) AS BIGINT) AS unc_micro
      FROM bins, tot ORDER BY bin
    """,

    // Mood's median replay: pooled-median clearing, per-group above
    // counts, per-term micro-floored chi-square contributions.
    "p_mood_median" -> """
      WITH cells AS MATERIALIZED (
        SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      pooled AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM cells GROUP BY 1),
      cum AS (SELECT v, sum(cv) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM pooled),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM cells),
      med AS (SELECT min(v) AS med FROM cum, tot WHERE 2 * cum >= nt),
      grp AS MATERIALIZED (
        SELECT g, CAST(sum(c) AS BIGINT) AS ng,
               CAST(sum(CASE WHEN v > (SELECT med FROM med) THEN c
                             ELSE 0 END) AS BIGINT) AS ag
        FROM cells GROUP BY 1),
      ab AS (SELECT CAST(sum(ag) AS BIGINT) AS aa,
                    CAST(sum(ng) AS BIGINT) AS nn,
                    CAST(count(*) AS BIGINT) AS k FROM grp),
      terms AS (
        SELECT g, ng, ag, k,
               CASE WHEN aa > 0 AND aa < nn THEN
                 CAST(((CAST(ag AS HUGEINT) * nn - CAST(ng AS HUGEINT) * aa)
                     * (CAST(ag AS HUGEINT) * nn - CAST(ng AS HUGEINT) * aa)
                     * 1000000)
                   // (CAST(ng AS HUGEINT) * aa * (nn - aa)) AS BIGINT)
               ELSE 0 END AS term_micro
        FROM grp, ab)
      SELECT g, ng AS n, ag AS n_above,
             (SELECT med FROM med) AS pooled_median, term_micro,
             CAST(sum(term_micro) OVER () AS BIGINT) AS chi2_micro,
             k - 1 AS df,
             sum(term_micro) OVER () >= (CASE k - 1 WHEN 1 THEN 3841458 WHEN 2 THEN 5991464 WHEN 3 THEN 7814727 WHEN 4 THEN 9487729 WHEN 5 THEN 11070497 WHEN 6 THEN 12591587 END)
               AS reject_05
      FROM terms
      ORDER BY g
    """,

    // Brown-Forsythe replay: per-group median clearing, deviation
    // moments, micro-floored SSB/SSW, the (k-1)W chi-square decision.
    "p_brown_forsythe" -> """
      WITH cells AS MATERIALIZED (
        SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      cum AS (SELECT g, v, c,
                sum(c) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(c) OVER (PARTITION BY g) AS ntot
              FROM cells),
      meds AS (SELECT g, min(v) AS med FROM cum
               WHERE 2 * cum >= ntot GROUP BY g),
      grp AS MATERIALIZED (
        SELECT c.g, m.med, CAST(sum(c.c) AS BIGINT) AS ng,
               CAST(sum(c.c * abs(c.v - m.med)) AS BIGINT) AS sd,
               sum(CAST(c.c AS HUGEINT) * abs(c.v - m.med)
                 * abs(c.v - m.med)) AS sd2
        FROM cells c JOIN meds m ON c.g = m.g GROUP BY 1, 2),
      tot AS (
        SELECT CAST(sum(ng) AS BIGINT) AS nn,
               CAST(count(*) AS BIGINT) AS k,
               CAST(sum(sd) AS BIGINT) AS s_all,
               sum(sd2 * 1000000) AS sd2_all6,
               sum((CAST(sd AS HUGEINT) * sd * 1000000) // ng) AS sq6
        FROM grp),
      ssx AS (
        SELECT nn, k,
               greatest(sq6 - (CAST(s_all AS HUGEINT) * s_all * 1000000)
                 // nn, 0) AS ssb6,
               greatest(sd2_all6 - sq6, 0) AS ssw6
        FROM tot)
      SELECT g, ng AS n, med AS med_cents,
             CAST((CAST(sd AS HUGEINT) * 1000000) // ng AS BIGINT)
               AS mean_absdev_micro,
             CAST(CASE WHEN ssw6 > 0 THEN
                 ((nn - k) * ssb6 * 1000000) // ((k - 1) * ssw6)
               ELSE 0 END AS BIGINT) AS w_micro,
             k - 1 AS df1, nn - k AS df2,
             (k - 1) * (CASE WHEN ssw6 > 0 THEN
                 ((nn - k) * ssb6 * 1000000) // ((k - 1) * ssw6)
               ELSE 0 END)
               >= (CASE k - 1 WHEN 1 THEN 3841458 WHEN 2 THEN 5991464 WHEN 3 THEN 7814727 WHEN 4 THEN 9487729 WHEN 5 THEN 11070497 WHEN 6 THEN 12591587 END) AS reject_05_approx
      FROM grp, ssx
      ORDER BY g
    """,

    // trimmed/winsorized replay: rank-interval overlap arithmetic on
    // the per-group cumulative histogram, boundary order statistics
    // by integer clearing, truncating micro divisions.
    "p_trimmed_mean" -> """
      WITH cells AS (
        SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      cum AS MATERIALIZED (
        SELECT g, v, c,
               sum(c) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(c) OVER (PARTITION BY g) AS n,
               (sum(c) OVER (PARTITION BY g)) // 10 AS t
        FROM cells),
      lo AS (SELECT g, min(v) AS lo_v FROM cum WHERE cum >= t + 1 GROUP BY g),
      hi AS (SELECT g, min(v) AS hi_v FROM cum WHERE cum >= n - t GROUP BY g),
      agg AS (
        SELECT g, CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS t,
               sum(CAST(v AS HUGEINT) * greatest(0,
                 least(cum, n - t) - greatest(cum - c + 1, t + 1) + 1))
                 AS s_trim,
               sum(CAST(v AS HUGEINT) * c) AS s_raw
        FROM cum GROUP BY 1, 2, 3)
      SELECT g, n, t, lo_v AS lo_cents, hi_v AS hi_cents,
             CAST((s_trim * 1000000) // (n - 2 * t) AS BIGINT)
               AS trimmed_mean_micro,
             CAST(((s_trim + CAST(t AS HUGEINT) * lo_v
                  + CAST(t AS HUGEINT) * hi_v) * 1000000) // n AS BIGINT)
               AS winsor_mean_micro,
             CAST((s_raw * 1000000) // n AS BIGINT) AS raw_mean_micro
      FROM agg JOIN lo USING (g) JOIN hi USING (g)
      ORDER BY g
    """,


    // Bowker replay over the shared NB CTEs + the heuristic argmax:
    // disagreement counts, label-universe pair grid, per-pair
    // micro-floored terms, df-indexed quantile CASE (extended table).
    "llm_mcnemar_bowker" -> s"""
      WITH $nbLangCtes,
      nb AS (SELECT doc_id, cand AS b FROM r WHERE rn = 1),
      hs AS (
        SELECT doc_id, $langArgmax AS a FROM (
          SELECT doc_id, lang, ws, $langScoreCols
          FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
                FROM documents)) scored),
      preds AS (SELECT hs.a, nb.b FROM hs JOIN nb USING (doc_id)),
      cnt AS MATERIALIZED (
        SELECT a, b, CAST(count(*) AS BIGINT) AS c
        FROM preds WHERE a <> b GROUP BY 1, 2),
      labels AS (SELECT a AS l FROM cnt UNION SELECT b FROM cnt),
      grid AS (SELECT x.l AS la, y.l AS lb
               FROM labels x JOIN labels y ON x.l < y.l),
      pairs AS (
        SELECT g.la, g.lb, coalesce(ab.c, 0) AS n_ab,
               coalesce(ba.c, 0) AS n_ba
        FROM grid g
        LEFT JOIN cnt ab ON ab.a = g.la AND ab.b = g.lb
        LEFT JOIN cnt ba ON ba.a = g.lb AND ba.b = g.la),
      terms AS (
        SELECT la, lb, n_ab, n_ba,
               CASE WHEN n_ab + n_ba > 0 THEN
                 CAST(((CAST(n_ab AS HUGEINT) - n_ba)
                     * (CAST(n_ab AS HUGEINT) - n_ba) * 1000000)
                   // (n_ab + n_ba) AS BIGINT)
               ELSE 0 END AS term_micro,
               (n_ab + n_ba > 0) AS used
        FROM pairs)
      SELECT la, lb, n_ab, n_ba, term_micro, used,
             CAST(sum(term_micro) OVER () AS BIGINT) AS chi2_micro,
             CAST(sum(CASE WHEN used THEN 1 ELSE 0 END) OVER ()
               AS BIGINT) AS df,
             CASE WHEN sum(CASE WHEN used THEN 1 ELSE 0 END) OVER () = 0
                  THEN FALSE
                  ELSE sum(term_micro) OVER () >=
                    (CASE CAST(sum(CASE WHEN used THEN 1 ELSE 0 END)
                       OVER () AS INT) WHEN 1 THEN 3841458 WHEN 2 THEN 5991464 WHEN 3 THEN 7814727 WHEN 4 THEN 9487729 WHEN 5 THEN 11070497 WHEN 6 THEN 12591587 WHEN 7 THEN 14067140 WHEN 8 THEN 15507313 WHEN 9 THEN 16918978 WHEN 10 THEN 18307038 END)
             END AS reject_05
      FROM terms
      ORDER BY la, lb
    """,


    // V-optimal replay: prefix sums, pair cost table, 3 MATERIALIZED
    // DP rounds with (cost, j) tie order, argmin backtrack joins.
    "p_vopt_histogram" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS x
        FROM events GROUP BY 1),
      cells AS MATERIALIZED (
        SELECT day, x,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
               CAST(sum(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS HUGEINT) AS p,
               sum(CAST(x AS HUGEINT) * x) OVER (ORDER BY day ROWS
                 BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q
        FROM daily),
      pref AS (SELECT i, p, q FROM cells
               UNION ALL SELECT 0, 0, 0),
      cost AS MATERIALIZED (
        SELECT a.i AS j, b.i AS i,
               (b.q - a.q) * 1000000
                 - ((b.p - a.p) * (b.p - a.p) * 1000000) // (b.i - a.i)
                 AS c6
        FROM pref a JOIN pref b ON a.i < b.i),
      dp1 AS MATERIALIZED (
        SELECT i, c6 AS c, CAST(0 AS BIGINT) AS arg
        FROM cost WHERE j = 0),
      dp2 AS MATERIALIZED (
        SELECT i, c, arg FROM (
          SELECT c.i, d.c + c.c6 AS c, c.j AS arg,
                 row_number() OVER (PARTITION BY c.i
                   ORDER BY d.c + c.c6, c.j) AS rk
          FROM dp1 d JOIN cost c ON c.j = d.i)
        WHERE rk = 1),
      dp3 AS MATERIALIZED (
        SELECT i, c, arg FROM (
          SELECT c.i, d.c + c.c6 AS c, c.j AS arg,
                 row_number() OVER (PARTITION BY c.i
                   ORDER BY d.c + c.c6, c.j) AS rk
          FROM dp2 d JOIN cost c ON c.j = d.i)
        WHERE rk = 1),
      dp4 AS MATERIALIZED (
        SELECT i, c, arg FROM (
          SELECT c.i, d.c + c.c6 AS c, c.j AS arg,
                 row_number() OVER (PARTITION BY c.i
                   ORDER BY d.c + c.c6, c.j) AS rk
          FROM dp3 d JOIN cost c ON c.j = d.i)
        WHERE rk = 1),
      cc AS (SELECT max(i) AS cc FROM cells),
      b4 AS (SELECT dp4.arg AS j4, cc.cc FROM dp4, cc
             WHERE dp4.i = cc.cc),
      b3 AS (SELECT dp3.arg AS j3, b4.j4, b4.cc FROM dp3, b4
             WHERE dp3.i = b4.j4),
      b2 AS (SELECT dp2.arg AS j2, b3.j3, b3.j4, b3.cc FROM dp2, b3
             WHERE dp2.i = b3.j3),
      bks AS (
        SELECT CAST(1 AS BIGINT) AS bucket, CAST(1 AS BIGINT) AS lo,
               j2 AS hi FROM b2
        UNION ALL SELECT 2, j2 + 1, j3 FROM b2
        UNION ALL SELECT 3, j3 + 1, j4 FROM b2
        UNION ALL SELECT 4, j4 + 1, cc FROM b2)
      SELECT bk.bucket, CAST(cs.day AS VARCHAR) AS start_day,
             CAST(ce.day AS VARCHAR) AS end_day,
             bk.hi - bk.lo + 1 AS n_days,
             CAST(co.c6 AS BIGINT) AS sse_micro
      FROM bks bk
      JOIN cost co ON co.j = bk.lo - 1 AND co.i = bk.hi
      JOIN cells cs ON cs.i = bk.lo
      JOIN cells ce ON ce.i = bk.hi
      ORDER BY bucket
    """,


    // capture-recapture replay: same salted md5 nibble captures,
    // Chapman arithmetic in BIGINT.
    "p_capture_recapture" -> """
      WITH users AS (SELECT DISTINCT user_id FROM events),
      c1 AS (SELECT user_id FROM users
             WHERE CAST('0x' || substr(md5('cap1|'
               || CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 10 = 0),
      c2 AS (SELECT user_id FROM users
             WHERE CAST('0x' || substr(md5('cap2|'
               || CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 10 = 0),
      agg AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM users) AS n_pop,
               (SELECT CAST(count(*) AS BIGINT) FROM c1) AS n1,
               (SELECT CAST(count(*) AS BIGINT) FROM c2) AS n2,
               (SELECT CAST(count(*) AS BIGINT)
                FROM c1 WHERE user_id IN (SELECT user_id FROM c2)) AS m)
      SELECT n_pop, n1, n2, m,
             ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS chapman_est,
             (abs(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 - n_pop)
               * 1000000) // n_pop AS err_micro
      FROM agg
    """,


    // Bartels replay: ranks by (x, day), lead-difference NM, the same
    // cross-multiplied decision in HUGEINT.
    "p_bartels_rank" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS x
        FROM events GROUP BY 1),
      ranked AS (
        SELECT day,
               CAST(row_number() OVER (ORDER BY x, day) AS BIGINT) AS r
        FROM daily),
      nm AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN rn IS NOT NULL
                 THEN (r - rn) * (r - rn) ELSE 0 END) AS BIGINT) AS nm
        FROM (SELECT r, lead(r) OVER (ORDER BY day) AS rn FROM ranked)),
      s AS (
        SELECT n, nm,
               CAST(n AS HUGEINT) * n * n - n AS n3n,
               CAST(nm AS HUGEINT) * 12 - 2 * (CAST(n AS HUGEINT) * n * n - n)
                 AS dev
        FROM nm)
      SELECT n, nm,
             CAST((CAST(nm AS HUGEINT) * 12 * 1000000) // n3n AS BIGINT)
               AS rvn_micro,
             dev * dev * 1000000 * 5 * n * (n + 1) * (n - 1) * (n - 1)
               >= CAST(3841458 AS HUGEINT) * 4 * (n - 2)
                  * (5 * CAST(n AS HUGEINT) * n - 2 * n - 9)
                  * n3n * n3n AS reject_05
      FROM s
    """,

  )
}
