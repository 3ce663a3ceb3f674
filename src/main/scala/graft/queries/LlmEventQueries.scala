package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{EvalOps, EventOps, FeatureOps, Multimodal, TextOps, VectorOps}

/** Event slice of [[LlmSurface]] — event streams, time series, attribution, survival, sequential tests.
  *
  * r14 mechanical split, ZERO behavior change: query lambdas and their
  * DuckDB oracle SQL only. Every shared helper, constant, and CTE
  * generator stays in [[LlmSurface]] (reached via the wildcard import
  * below, which inner-scope-shadows functions._ exactly like the
  * original enclosing-object scope did).
  */
private[queries] object LlmEventQueries {

  import LlmSurface._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- tumbling 1-hour event-time windows ------------------------------
    "llm_event_windows" -> ((s, dir) => {
      EventOps.tumbling(events(s, dir), "1 hour")
        .orderBy("win_start", "event_type")
    }),

    // ---- sliding 1-hour windows, 30-minute slide -------------------------
    "llm_event_windows_sliding" -> ((s, dir) => {
      EventOps.sliding(events(s, dir), "1 hour", "30 minutes")
        .orderBy("win_start", "event_type")
    }),

    // ---- gap-based sessionization (30-minute inactivity gap) -------------
    "llm_sessionize" -> ((s, dir) => {
      EventOps.sessionize(events(s, dir), gapMinutes = 30)
        .orderBy("user_id", "session_idx")
    }),

    // ---- gridded interval join: events per maintenance window ------------
    // graft.operators.RangeJoin: intervals explode onto fixed-width grid
    // buckets, points map to one bucket, join is an EQUI-join + exact
    // range predicate — work is linear-ish, never |points|×|intervals|.
    "llm_interval_join" -> ((s, dir) => {
      val base = lit(1704067200L) // 2024-01-01 00:00:00 UTC
      val iv = s.range(0, 30).toDF("interval_id")
        .withColumn("lo",
          base + col("interval_id") * 86400L + (col("interval_id") % 7) * 3600L)
        .withColumn("hi", col("lo") + (lit(1L) + col("interval_id") % 5) * 3600L)
      val p = events(s, dir)
        .select(unix_timestamp(col("ts")).as("psec"), col("value"))
      graft.operators.RangeJoin
        .pointInInterval(p, iv, "psec", "lo", "hi", bucketWidth = 3600L)
        .groupBy("interval_id", "lo", "hi")
        .agg(count(lit(1)).as("n"), EventOps.centsSum(col("value")).as("value_sum"))
        .orderBy("interval_id")
    }),

    // ---- JSON property extraction + rollup -------------------------------
    "llm_event_props" -> ((s, dir) => {
      val ev = events(s, dir)
      ev.select(col("event_type"),
        (EventOps.jsonIntProp(col("props"), "k") % 10).as("k_bucket"),
        col("value"))
        .groupBy("event_type", "k_bucket")
        .agg(count(lit(1)).as("n"), EventOps.centsSum(col("value")).as("value_sum"))
        .orderBy("event_type", "k_bucket")
    }),

    // ---- conversion funnel: view -> click -> purchase --------------------
    // Ordered-sequence semantics: each step's earliest occurrence
    // STRICTLY AFTER the previous step's time (cascaded conditional
    // mins — one filtered agg per step, per-user-sized transition
    // joins).
    "llm_funnel" -> ((s, dir) => {
      EventOps.funnel(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
        .orderBy("user_id")
    }),

    // ---- funnel conversion-rate summary (the X62 dashboard table) --------
    // Per step: users reaching it, conversion from the previous step,
    // and from the top — one aggregate over the per-user funnel output
    // (|steps| rows; the window runs over that aggregate only).
    "llm_funnel_rates" -> ((s, dir) => {
      val f = EventOps.funnel(events(s, dir), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      val steps = Seq("view", "click", "purchase")
      val wide = f.agg(
        sum(when(col("reached") >= 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("reached") >= 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("reached") >= 3, 1L).otherwise(0L)).as("n3"))
      wide.select(explode(array(steps.zipWithIndex.map { case (nm, i) =>
        struct(lit(i + 1).as("step"), lit(nm).as("step_name"),
          col(s"n${i + 1}").as("n_reached"),
          TextOps.round6(col(s"n${i + 1}") /
            col(s"n${if (i == 0) 1 else i}").cast("double"))
            .as("conv_from_prev"),
          TextOps.round6(col(s"n${i + 1}") / col("n1").cast("double"))
            .as("conv_from_start"))
      }: _*)).as("r"))
        .select("r.*")
        .orderBy("step")
    }),

    // ---- Ljung-Box whiteness test on the daily series --------------------
    // "Are days independent": exact integer autocovariances, r_k ppm,
    // Q in micro vs the constant-folded chi-square-7 95th percentile.
    // The honest expected answer on seasonal traffic is REJECT.
    "p_ljung_box" -> ((s, dir) => {
      EventOps.ljungBox(events(s, dir), "ts", maxLag = 7)
    }),

    // ---- Nelson-Aalen cumulative hazard (X357) ----------------------------
    // The ADDITIVE survival readout next to llm_survival_km's product
    // (llm/EventOps.nelsonAalen): H(t) = sum d_i/n_i needs no
    // sequential fold — a plain cumulative window over the duration
    // histogram, the estimator a distributed engine prefers on the
    // hazard scale. Same purchase>150 feed as the KM pair.
    "llm_survival_na" -> ((s, dir) => {
      EventOps.nelsonAalen(events(s, dir), "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 150)
    }),

    // ---- Jonckheere-Terpstra ordered trend across hour buckets (X354) -----
    // The ORDERED k-sample question Kruskal-Wallis can't ask
    // (operators/Jonckheere.scala): do event values rise through the
    // day's six 4-hour buckets? Pools pairwise Mann-Whitney counts of
    // every ordered bucket pair from cumulative value histograms on
    // the zero-filled spine; z² decision cross-multiplied against the
    // chi-square(1) literal with the classical no-tie variance.
    "p_jonckheere" -> ((s, dir) => {
      val d = events(s, dir)
        .select(expr("hour(ts) div 4").as("g"),
          floor(col("value") * 1000.0).cast("long").as("v"))
      graft.operators.Jonckheere.jt(d, "g", "v")
    }),

    // ---- Gumbel return levels for daily maxima (X368) ----------------------
    // EVT block-maxima capacity planning: "what single-event value do
    // we expect to exceed once a week / once a month". Gumbel by
    // method of moments on the daily-max cents series — every
    // transcendental (√6/π, Euler γ, −ln(−ln(1−1/T))) a DRIVER-FOLDED
    // ×10⁷ literal shared with the oracle; s·10⁶ via isqrtDec of the
    // exact variance numerator; one floored product per constant.
    // Complements llm_tail_index (which warns WHEN the tail is too
    // heavy for moments to mean anything).
    "p_gumbel_maxima" -> ((s, dir) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val daily = events(s, dir)
        .select(to_date(col("ts")).as("day"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy("day").agg(max("c").as("m"))
      val mom = daily.agg(count(lit(1)).as("n"), sum(dec(col("m"))).as("sm"),
        sum(dec(col("m")) * dec(col("m"))).as("sm2"))
      val fit = mom.select(col("n"),
          TextOps.floorDivDec(col("sm") * lit(1000000L), dec(col("n")))
            .as("mean_micro"),
          TextOps.isqrtDec(TextOps.floorDivDec(
            (dec(col("n")) * col("sm2") - col("sm") * col("sm"))
              * lit(1000000000000L),
            dec(col("n")) * dec(col("n") - 1))).as("s_micro"))
        .select(col("n"), col("mean_micro"),
          TextOps.floorDivDec(lit(7796968L) * col("s_micro"),
            dec(lit(10000000L))).as("beta_micro"))
        .select(col("n"),
          (col("mean_micro") - TextOps.floorDivDec(
            lit(5772157L) * col("beta_micro"), dec(lit(10000000L))))
            .as("mu_micro"),
          col("beta_micro"))
      val horizons = s.createDataFrame(Seq((7L, 18698247L),
        (30L, 33842945L))).toDF("horizon_days", "c7")
      fit.crossJoin(broadcast(horizons)) // 2-row fold-constant join
        .select(col("horizon_days"), col("n").as("n_days"),
          col("mu_micro").cast("long").as("mu_micro"),
          col("beta_micro").cast("long").as("beta_micro"),
          (col("mu_micro") + TextOps.floorDivDec(
            col("c7") * col("beta_micro"), dec(lit(10000000L))))
            .cast("long").as("return_level_micro"))
        .orderBy("horizon_days")
    }),

    // ---- fixed-period periodogram of daily revenue (X365) ------------------
    // "How much of the daily-revenue variance sits at the weekly /
    // biweekly / monthly frequency": the Schuster periodogram at
    // periods {7, 14, 30} on the zero-filled calendar spine, every
    // cos/sin a DRIVER-FOLDED micro literal shared verbatim with the
    // oracle (no runtime transcendental — the llm_bandit_ucb
    // discipline), centering via the integer z = n·x − S trick, one
    // floored micro division per period. Complements p_seasonal's
    // day-of-week profile with an actual spectral fraction.
    "p_periodogram" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .select(to_date(col("ts")).as("day"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy("day").agg(sum("c").as("x"))
      val b = daily.agg(min("day").as("d0"), max("day").as("d1"))
      val spine = b
        .select(explode(sequence(col("d0"), col("d1"))).as("day"),
          col("d0"))
        .join(daily, Seq("day"), "left")
        .select(datediff(col("day"), col("d0")).cast("long").as("t"),
          coalesce(col("x"), lit(0L)).as("x"))
      val m = spine.agg(count(lit(1)).as("n"), sum("x").as("s"))
      val z0 = spine.crossJoin(broadcast(m)) // 1-row scalar join
        .select(col("t"),
          (col("n") * col("x") - col("s")).cast("decimal(38,0)").as("z"),
          col("n"))
      // LOUD decimal(38,0) envelope (the CvmTest/KruskalWallis
      // discipline): a = Σ z·cmi is bounded by n·max|z|·1e6 and the
      // final stage squares it, so a² fits decimal(38,0) only while
      // n·max|z| ≤ 7·10¹² (then |a| ≤ 7·10¹⁸ and a²+b² < 10³⁸). Past
      // that, fail with a named contract instead of an opaque ANSI
      // decimal overflow.
      val zEnv = z0.agg(max(abs(col("z"))).as("zmax"), max("n").as("ne"))
      val z = z0.crossJoin(broadcast(zEnv)) // 1-row scalar join
        .select(col("t"), col("n"),
          when(col("ne").cast("decimal(38,0)") * col("zmax")
              <= lit(7000000000000L),
            col("z"))
            .otherwise(raise_error(concat(
              lit("p_periodogram: n*max|z| = "),
              (col("ne").cast("decimal(38,0)") * col("zmax"))
                .cast("string"),
              lit(" exceeds the decimal(38,0) envelope (7e12); aggregate"
                + " revenue to a coarser unit upstream")))).as("z"))
      val trig = s.createDataFrame(periodogramTrig)
        .toDF("p", "r", "cmi", "smi")
      val terms = z
        .crossJoin(broadcast(trig.select("p").distinct())) // 3 periods
        .withColumn("r", col("t") % col("p"))
        .join(broadcast(trig), Seq("p", "r"))
        .groupBy("p")
        .agg(sum(col("z") * col("cmi")).as("a"),
          sum(col("z") * col("smi")).as("b"))
      val sz2 = z.agg(sum(col("z") * col("z")).as("sz2"),
        max("n").as("n"))
      terms.crossJoin(broadcast(sz2)) // 1-row scalar join
        .select(col("p").as("period"),
          when(col("sz2") > 0,
            TextOps.floorDivDec(
              (col("a") * col("a") + col("b") * col("b"))
                * lit(2L),
              col("n").cast("decimal(38,0)") * col("sz2")
                * lit(1000000L)).cast("long"))
            .otherwise(lit(0L)).as("power_frac_micro"))
        .orderBy("period")
    }),

    // ---- Page's trend test: hour buckets ranked within days (X364) --------
    // The blocked-AND-ordered corner of the rank-test matrix
    // (operators/Page.scala): does value rise through the day's
    // 4-hour buckets CONSISTENTLY day after day? p_jonckheere pools
    // all days; this ranks within each day first, so a per-day trend
    // survives day-level traffic waves.
    "p_page_trend" -> ((s, dir) => {
      val cells = events(s, dir)
        .select(to_date(col("ts")).as("day"),
          expr("hour(ts) div 4").as("g"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .groupBy("day", "g").agg(sum("cents").as("v"))
      graft.operators.Page.trend(cells, "day", "g", "v")
    }),

    // ---- Wald–Wolfowitz runs test on the daily series (X336) --------------
    // The randomness audit next to Ljung–Box (operators/RunsTest
    // .scala): dichotomize daily cent revenue about its lower median
    // (median days drop — the standard tie rule) and count sign runs;
    // too few = clustering/regimes, too many = alternation — both
    // non-random. α=0.05 two-sided decision in exact rational
    // arithmetic (196² = 38416; (R·n − 2ab − n)²(n−1)·10⁴ vs
    // 38416·2ab(2ab − n)).
    "p_runs_test" -> ((s, dir) => {
      val daily = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("value"))
        .groupBy("day")
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      graft.operators.RunsTest.test(daily, "day", "cents")
    }),

    // ---- frequent sequential patterns in sessions (X285) -----------------
    // The ORDERED complement of p_assoc_rules' itemsets: consecutive
    // event-type bigrams/trigrams within 30-min session gaps, support
    // in both occurrences and distinct users. Window is user-
    // partitioned (parallel), agg is pattern-vocabulary-bounded.
    "p_seq_patterns" -> ((s, dir) =>
      EventOps.sequencePatterns(events(s, dir), gapMinutes = 30,
        topK = 30)),

    // ---- deterministic UCB1 bandit trajectory replay (X299) --------------
    // The sequential-decision audit next to SPRT (testing) and
    // off-policy scoring (counterfactual): what WOULD UCB1 have
    // played, day by day, against the full-information log. All
    // transcendentals (the sqrt-ln bonus) fold in the JVM and ship to
    // both engines as literals; the decision recursion runs on the
    // |arms|x30 metadata table only.
    "llm_bandit_ucb" -> ((s, dir) =>
      EventOps.ucbTrajectory(events(s, dir), "ts", "event_type",
        "value", horizon = 30)),

    // ---- rank-2 ALS latent-factor recommendation (X298) ------------------
    // The collaborative-filtering family next to co-order graphs and
    // link prediction: customer × part purchase counts factorized by
    // 2 exact-integer ALS alternations (closed-form 2x2 adjugate
    // solves, λ-regularized so det > 0 always). Each half-step is one
    // ratings equi-join + one combine agg; scoring is restricted to
    // observed candidates — no user×item product anywhere.
    "llm_recsys_als" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val ord = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      val ratings = li.join(ord, "l_orderkey")
        .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("item"))
        .agg(count(lit(1)).as("r"))
      graft.llm.AlsOps.alsFactors(ratings, "cust", "item", "r",
        rounds = 2, lambdaMilli2 = 100000L, topUsers = 20)
    }),

    // ---- interrupted time series at the known break (X274) ---------------
    // The quantification the changepoint (finds) and CUSUM (alarms)
    // stop short of: two OLS segments with x-origin AT the 16th, so
    // intercepts ARE levels at the intervention and the level/slope
    // changes read off directly. Same planted +25 error-value shift
    // as p_psi_drift/p_emd_drift: the level_change must read the
    // intervention's daily revenue effect while slope_change stays
    // near zero.
    "p_its" -> ((s, dir) => {
      val ev = events(s, dir)
        .filter(col("event_type") === "error")
        .withColumn("value",
          when(to_date(col("ts")) > to_date(lit("2024-01-15")),
            col("value") + 25.0).otherwise(col("value")))
      EventOps.interruptedTimeSeries(ev, "ts", "value", "2024-01-16")
    }),

    // ---- CUSUM drift detection over the dense daily scaffold -------------
    // Page's one-sided CUSUM via the exact prefix identity
    // S = P − min(0, running-min P) in integer N-units — the sustained-
    // drift alarm a per-day z-test dilutes. Error-type counts are
    // tripled from Jan 26 (both engines) so the alarm has a real drift
    // to catch: S accumulates ~110 rows/day against a 4σ≈38 threshold.
    // Both windows run over the |days|×|types| scaffold, never events.
    "llm_cusum_drift" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_type"))
      val days = ev.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val daily = days.crossJoin(broadcast(ev.select("event_type").distinct()))
        .join(ev.groupBy("day", "event_type").agg(count(lit(1)).as("n")),
          Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          when(col("event_type") === "error"
              && col("day") >= to_date(lit("2024-01-26")),
            coalesce(col("n"), lit(0L)) * 3)
          .otherwise(coalesce(col("n"), lit(0L))).as("n"))
      EventOps.cusumDrift(daily, "event_type", "day", "n", sigmas = 4.0)
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
          col("cusum_stat"), col("threshold"), col("alarm"))
        .orderBy("event_type", "day")
    }),

    // ---- U-shaped multi-touch attribution --------------------------------
    // Each purchase credits its user's trailing-7-day touches 40/20/40
    // (first/middles/last); credits are pinned to micro-units per touch
    // then integer-summed, and untouched conversions land in "(direct)"
    // so the column conserves total conversion value. The pairing is a
    // user-keyed equi-join; the position window is conversion-keyed.
    "llm_attribution" -> ((s, dir) => {
      EventOps.attributionUShape(events(s, dir), "user_id", "event_id",
        "ts", "event_type", "value", convType = "purchase", windowDays = 7)
        .orderBy("channel")
    }),

    // ---- inter-event latency histogram (power-of-2 buckets) --------------
    // Bucket = binary-string length of the integer-second delay — the
    // no-floating-log spelling of floor(log2)+1, portable by
    // construction (Spark bin() vs DuckDB format('{:b}')).
    "llm_latency_histogram" -> ((s, dir) => {
      EventOps.latencyHistogram(events(s, dir), "user_id", "ts",
        "event_id")
        .orderBy("bucket")
    }),

    // ---- off-policy evaluation: DM + IPS counterfactual value (X261) -----
    // "What would the greedy per-dow policy have earned": target
    // policy learned on the pre-16th train half (argmax train mean,
    // micro-floored, rank-window tiebreak), evaluated on the eval
    // half via the direct method AND inverse-propensity scoring with
    // exact empirical propensities — each context's IPS sum collapses
    // to ONE integer division (S_match·n_ctx div n_match). The DM-vs-
    // IPS gap per context is the model-misfit readout.
    "llm_offpolicy" -> ((s, dir) => {
      EventOps.offPolicyValue(events(s, dir), "ts", "event_type",
        "value", "2024-01-16")
    }),

    // ---- RFM quintile segmentation over the order log (X260) -------------
    // Recency/Frequency/Monetary scored 1-5 by corpus quintile, each
    // boundary from a value histogram rank walk (5*cum >= q*n integer
    // clearing — no corpus sort), value-based membership so ties
    // share a score; monetary histogram in 1000-cent score bands
    // (per-customer sums have no bounded natural domain). Rolled up
    // to the <=125 segment cells a campaign plan reads.
    "p_rfm_segments" -> ((s, dir) => {
      EventOps.rfmSegments(Tables(s, dir, "orders"), "o_custkey",
        "o_orderdate", "o_totalprice")
    }),

    // ---- pairwise association rules over order baskets (X259) ------------
    // Directional A->B rules with exact support / confidence / lift,
    // all three statistics on the SAME cap-5 basket prefixes (mixing
    // capped pair counts with uncapped item counts would let
    // confidence exceed 1). PPM integers via exact decimal floor-div;
    // top-40 by (lift, conf) total order.
    "p_assoc_rules" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      graft.operators.AssociationRules.rules(rel, "l_orderkey",
        "l_partkey", cap = 5, minSupport = 2, topK = 40)
    }),

    // ---- rolling distinct engagement (DAU / WAU / stickiness) ------------
    // Exact trailing-7-day distinct users via the window-explode
    // spelling (each activity day charged to the <=7 window ends it
    // serves; distinct isn't a monoid, so daily partials can't merge);
    // the oracle uses the range-join spelling — the hash match proves
    // the two equivalent.
    "llm_rolling_engagement" -> ((s, dir) => {
      EventOps.rollingEngagement(events(s, dir), "user_id", "ts")
        .orderBy("day")
    }),

    // ---- trailing-window rate anomaly detection ---------------------------
    // Daily per-type counts z-scored against their own trailing 7-day
    // history, over the DENSE scaffold (gap days are zero cells — a
    // rows-window over sparse days would stretch the week across
    // gaps). The analytic window runs over |days|×|types| metadata.
    "llm_rate_anomaly" -> ((s, dir) => {
      EventOps.rateAnomaly(events(s, dir), "ts", "event_type", window = 7)
        .orderBy("day", "event_type")
    }),

    // ---- time-weighted average held value per user ------------------------
    // Integral of the step function each user's events trace: exact
    // microsecond × cent products in decimal(38,0), one round6 division
    // at the end. Single-event users drop (no interval).
    "llm_time_weighted_avg" -> ((s, dir) => {
      EventOps.timeWeightedAvg(events(s, dir),
        "user_id", "ts", "event_id", "value")
        .orderBy("user_id")
    }),

    // ---- dense time series: gap-filled (day × type) scaffold --------------
    // The dashboard-feed shape: every (day, event_type) cell in the
    // observed date span, zero-filled where no events landed. The
    // scaffold cross join is METADATA-sized (|days| × |types|) by
    // construction — the corpus itself is touched once by the count
    // agg and once by the two tiny bound/distinct aggs.
    "llm_dense_timeseries" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_type"))
      val days = ev.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val types = ev.select("event_type").distinct()
      val actual = ev.groupBy("day", "event_type")
        .agg(count(lit(1)).as("n"))
      days.crossJoin(broadcast(types))
        .join(actual, Seq("day", "event_type"), "left")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("day", "event_type")
    }),

    // ---- matrix-profile motif discovery (X327) ----------------------------
    // The repeated-pattern lens (Yeh et al. ICDM'16 — operators/
    // MatrixProfile.scala): per event type, the exact squared-distance
    // nearest-neighbor profile of every 7-day window of the daily
    // cent-revenue series over the dense zero-filled spine (the
    // llm_dense_timeseries calendar). Dips = motifs (a week that
    // repeats), peaks = discords (a week like no other) — structure
    // nobody named in advance. Exclusion zone |i−j| ≥ 7, ties to the
    // smaller j; per-key cost calendar-bounded, keys parallel.
    "p_motif_profile" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_type"),
          col("value"))
      val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
      val days = bounds
        .select(col("d0"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val types = ev.select("event_type").distinct()
      val actual = ev.groupBy("day", "event_type")
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("c"))
      val daily = days.crossJoin(broadcast(types))
        .join(actual, Seq("day", "event_type"), "left")
        .select(col("event_type"),
          datediff(col("day"), col("d0")).cast("long").as("idx"),
          coalesce(col("c"), lit(0L)).as("cents"))
      graft.operators.MatrixProfile.profile(daily, "event_type", "idx",
          "cents", w = 7)
        .select(col("key").as("event_type"), col("pos"), col("nn_pos"),
          col("nn_dist2"))
        .orderBy("event_type", "pos")
    }),

    // ---- association rules over per-user behavior baskets ----------------
    // Market-basket support/confidence/lift per ordered event-type
    // pair, with the Apriori prune (items below minSupport dropped
    // before the pair join) as a real plan step. All ratios from exact
    // integer counts, round6-pinned.
    "llm_assoc_rules" -> ((s, dir) => {
      EventOps.assocRules(events(s, dir), "user_id", "event_type",
        minSupport = 0.05)
        .orderBy("antecedent", "consequent")
    }),

    // ---- first-order Markov transition matrix (path analysis) ------------
    // Per-user (prev, next) event bigrams with a ^start entry state:
    // one user-keyed lag window, a partial-combining count to
    // |types|²-ish rows, and row normalization over that model-sized
    // aggregate only. (ts, event_id) ordering is total — deterministic
    // under same-timestamp events in any engine.
    "llm_markov_transitions" -> ((s, dir) => {
      EventOps.markovTransitions(events(s, dir),
        "user_id", "ts", "event_id", "event_type")
        .orderBy("prev_type", "next_type")
    }),

    // ---- Markov removal-effect attribution (Anderl et al. 2014) ----------
    // The data-driven alternative to llm_attribution's 40/20/40
    // heuristic: journeys become a first-order chain over channels with
    // absorbing conv/null states; each channel's credit is how much
    // start→conv probability drops when its transitions redirect to
    // null. Corpus work = two user-keyed windows down to the ~30-row
    // transition model; the 12-round exact-integer value iterations
    // (base + one per channel) run on that model, and the oracle
    // replays every round unrolled.
    "llm_attribution_markov" -> ((s, dir) => {
      EventOps.markovRemovalAttribution(events(s, dir), "user_id", "ts",
        "event_id", "event_type", convType = "purchase", rounds = 12)
    }),

    // ---- trending terms (per-window lift vs previous window) -------------
    // Ingest-day windows synthesized as doc_id % 7 in both engines; the
    // operator is the (window, term) combine agg + one self-join on
    // (window−1, term), with the support filter pruning the cur side
    // before the join (prev stays unfiltered — sub-threshold n_prev is
    // the newborn-term signal).
    "llm_trending_terms" -> ((s, dir) => {
      TextOps.trendingTerms(
        Tables(s, dir, "documents").withColumn("day", col("doc_id") % 7),
        "day", "text", minCount = 10)
        .orderBy("win", "term")
    }),

    // ---- Kaplan-Meier time-to-conversion with right-censoring ------------
    // Survival curve for "days from first activity to first big
    // purchase" (value > 150): censored users (never converted) leave
    // the risk set at their last activity instead of being dropped —
    // the correction the naive ECDF gets wrong. Product-limit fold is
    // an integer ppm recurrence over the <=31-row step table; the
    // oracle replays it as a RECURSIVE CTE.
    "llm_survival_km" -> ((s, dir) => {
      EventOps.kaplanMeier(events(s, dir), "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 150)
    }),

    // ---- restricted mean survival time (X363) -----------------------------
    // The single-number area-under-KM summary (llm/EventOps.rmst):
    // average event-free days up to the last event time — defined
    // where the median isn't (S never crossing 1/2) and the mean
    // can't be (censoring). A lag window over the already-ppm KM
    // steps: integer products only, no new quantization.
    "llm_survival_rmst" -> ((s, dir) => {
      EventOps.rmst(events(s, dir), "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 150)
    }),

    // ---- two-sample log-rank test over the KM curves ---------------------
    // The significance test the survival pair needs (as Welch is to
    // means): per event time, observed-vs-expected arm-0 events under
    // the hypergeometric null; E and V floored to micro per time
    // (quantized log-rank — error bounded by |times|*1e-6, identical
    // both engines), one integer division for the chi^2.
    "llm_survival_logrank" -> ((s, dir) => {
      EventOps.survivalLogRank(events(s, dir), "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 150)
    }),

    // ---- cohort retention matrix (first-seen cohorts × day offsets) ------
    // distinct (user, day) → first-seen combine agg → one user equi-join
    // → partial-combine counts; no windows, no per-user history. The
    // offset-0 diagonal is 1.0 by construction — a built-in self-check.
    "llm_retention" -> ((s, dir) => {
      EventOps.retentionMatrix(events(s, dir), "user_id", "ts",
        maxOffset = 7)
        .orderBy("cohort_day", "day_offset")
    }),

    // ---- Holt linear-trend forecast (X206) -------------------------------
    // Level+trend extrapolation of the daily ingest volume — the
    // forward-looking companion to CUSUM (X171) and trailing-rate
    // (X146) detection. Integer-micro recurrence (div-only), daily agg
    // is the only corpus-scale work; oracle replays the recurrence as a
    // RECURSIVE CTE over the day index.
    "p_holt_forecast" -> ((s, dir) => {
      EventOps.holtLinear(Tables(s, dir, "events"), "ts", horizon = 7)
    }),

    // ---- classical seasonal decomposition of the daily series ------------
    // trend = 7-day centered MA (full windows only), seasonal =
    // per-dow mean of the detrended series, residual = the alarm
    // input with "weekends are slow" removed. All integer micro.
    "p_seasonal" -> ((s, dir) => {
      EventOps.seasonalDecompose(events(s, dir), "ts")
    }),

    // ---- Theil-Sen robust daily trend (median of pairwise slopes) --------
    // The 29.3%-breakdown complement to the OLS slope (shipped in the
    // same row as the readout): integer ppm slopes, lower-median rank
    // selection, all O(days^2) work on calendar metadata.
    "p_theil_sen" -> ((s, dir) => {
      EventOps.theilSenDailyTrend(events(s, dir), "ts")
    }),

    // ---- offline change-point (exact least-squares mean break) -----------
    // The "WHEN did it change" companion to llm_cusum_drift's online
    // alarm, over the SAME planted daily error series (×3 from
    // 2024-01-26): scan every break, pick min SSE₁+SSE₂ in exact
    // micro integer arithmetic. The recovered break must be 01-25 —
    // the last pre-shift day.
    "p_changepoint" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_type"))
      val days = ev.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val daily = days
        .join(ev.filter(col("event_type") === "error").groupBy("day")
          .agg(count(lit(1)).as("_n")), Seq("day"), "left")
        .select(col("day"),
          when(col("day") >= to_date(lit("2024-01-26")),
            coalesce(col("_n"), lit(0L)) * 3)
          .otherwise(coalesce(col("_n"), lit(0L))).as("n"))
      EventOps.changepointMean(daily, "day", "n")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
          col("mean_before_micro"), col("mean_after_micro"),
          col("sse_micro"), col("is_best"))
        .orderBy("day")
    }),

    // ---- Pettitt rank change-point (X394) --------------------------------
    // The NONPARAMETRIC "when did it change" next to p_changepoint's
    // exact-SSE mean break, over the SAME planted daily error series
    // (x3 from 2024-01-26): U_t from the telescoped |days|^2 sign-pair
    // aggregate, K = max |U_t| with ties to the earliest day, and the
    // two-sided 5% decision as ONE exact cross-multiplication against
    // the folded -ln(0.025) literal (3688879 micro) — no runtime
    // transcendental, no normality assumption.
    "p_pettitt" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_type"))
      val days = ev.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val daily = days
        .join(ev.filter(col("event_type") === "error").groupBy("day")
          .agg(count(lit(1)).as("_n")), Seq("day"), "left")
        .select(col("day"),
          when(col("day") >= to_date(lit("2024-01-26")),
            coalesce(col("_n"), lit(0L)) * 3)
          .otherwise(coalesce(col("_n"), lit(0L))).as("n"))
      graft.operators.Pettitt.test(daily, "day", "n")
        .select(date_format(col("i"), "yyyy-MM-dd").as("day"),
          col("y").as("n"), col("u"), col("is_best"), col("k"),
          col("reject_05"))
        .orderBy("day")
    }),

    // ---- tabular two-sided CUSUM monitor (X290) --------------------------
    // The SPC monitoring form next to llm_cusum_drift's retrospective
    // one: HELD-OUT baseline (first 7 days — the whole-series mean
    // leaks the drift into mu0 and shrinks the signal), explicit
    // allowance k (5% of mu0, the ARL tuning knob), decision interval
    // h (25%), and BOTH sides. Recursion unrolled to a calendar²-
    // bounded pair max. A sustained ×2 value drift is planted from
    // 01-26 (both engines) so the high-side alarm demonstrably fires.
    "p_cusum_tabular" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("value",
        when(col("ts") >= lit("2024-01-26").cast("timestamp"),
          col("value") * 2).otherwise(col("value")))
      EventOps.cusumTabular(ev, "ts", "event_type", "value",
        baseDays = 7, kPermille = 50, hPermille = 250)
    }),

    // ---- daily cross-correlation (lead-lag, clicks → purchases) ----------
    // r(ℓ) between clicks_t and purchases_{t+ℓ} for ℓ ∈ [−7, 7] on a
    // DENSE zero-filled calendar spine; exact int64 Pearson moments,
    // one sqrt per lag. The peak lag is the funnel-delay hypothesis.
    "p_ccf" -> ((s, dir) => {
      EventOps.ccfDaily(events(s, dir), "ts", "event_type",
        "click", "purchase", maxLag = 7)
    }),

    // ---- Mann-Kendall monotone trend per event type (X371) ---------------
    // The distribution-free IS-IT-DRIFTING test
    // (operators/MannKendall.scala) next to p_theil_sen's slope and
    // p_page_trend's blocked ordering: daily event counts per type on
    // the dense calendar spine (absent days are real zeros), S from
    // time-ordered pairs. The pair join is |days|² metadata per type
    // — one combine agg reduces the corpus first, so 100 TB enters
    // the quadratic stage as ~90 rows per type.
    "p_mann_kendall" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("event_type").as("g"), to_date(col("ts")).as("d"))
      val spine = ev.agg(min("d").as("_a"), max("d").as("_b"))
        .select(explode(sequence(col("_a"), col("_b"))).as("d"))
        .crossJoin(ev.select("g").distinct())
      val daily = spine
        .join(ev.groupBy("g", "d").agg(count(lit(1)).as("y")),
          Seq("g", "d"), "left")
        .select(col("g"),
          datediff(col("d"), to_date(lit("1970-01-01"))).as("i"),
          coalesce(col("y"), lit(0L)).as("y"))
      graft.operators.MannKendall.trend(daily, "g", "i", "y")
        .withColumnRenamed("g", "event_type")
        .orderBy("event_type")
    }),

    // ---- EWMA control chart on daily revenue (X380) ----------------------
    // Roberts' small-shift monitor completing the control-chart row
    // next to CUSUM: λ = ½ dyadic weights over a 20-day horizon make
    // the smoothed value one exact rational per day, and the 3σ band
    // is a fully cross-multiplied integer comparison. Runs on the
    // dense zero-filled (day × type) spine (the rate_anomaly
    // scaffold) so lags never stretch across gap days.
    "p_ewma_chart" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_type"),
          floor(coalesce(col("value"), lit(0.0)) * 100 + 0.5)
            .cast("long").as("cents"))
      val daily = ev.groupBy("day", "event_type")
        .agg(sum("cents").as("x"))
      val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
      val days = bounds.select(explode(expr("sequence(d0, d1)"))
        .as("day"))
      val types = ev.select("event_type").distinct()
      val dense = days.crossJoin(broadcast(types))
        .join(daily, Seq("day", "event_type"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("x"), lit(0L)).as("x"))
      graft.operators.EwmaChart.chart(dense, "event_type", "day", "x")
        .orderBy("event_type", "day")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "llm_event_windows" -> """
      SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 * 1000000 AS BIGINT)),
                      '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type,
             count(*) AS n,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS value_sum
      FROM events
      GROUP BY 1, 2 ORDER BY 1, 2
    """,

    "llm_event_windows_sliding" -> """
      SELECT strftime(make_timestamp(CAST((floor(epoch(ts) / 1800) - k) * 1800 * 1000000 AS BIGINT)),
                      '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type,
             count(*) AS n,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS value_sum
      FROM events, (VALUES (0), (1)) t(k)
      GROUP BY 1, 2 ORDER BY 1, 2
    """,

    "llm_sessionize" -> """
      WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM flagged)
      SELECT user_id, session_idx,
             count(*) AS n_events,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS value_sum
      FROM sess
      GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx
    """,

    "llm_interval_join" -> """
      WITH iv AS (
        SELECT i AS interval_id,
               CAST(1704067200 + i * 86400 + (i % 7) * 3600 AS BIGINT) AS lo,
               CAST(1704067200 + i * 86400 + (i % 7) * 3600
                    + (1 + i % 5) * 3600 AS BIGINT) AS hi
        FROM generate_series(0, 29) t(i)),
      p AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS psec, value FROM events)
      SELECT interval_id, lo, hi, count(*) AS n,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS value_sum
      FROM p JOIN iv ON psec >= lo AND psec < hi
      GROUP BY 1, 2, 3 ORDER BY 1
    """,

    "llm_event_props" -> """
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
             count(*) AS n,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS value_sum
      FROM events
      GROUP BY 1, 2 ORDER BY 1, 2
    """,

    "llm_funnel" -> """
      WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (
        SELECT s1.user_id, t1,
               min(CASE WHEN e.ts > t1 THEN e.ts END) AS t2
        FROM s1 LEFT JOIN events e
          ON s1.user_id = e.user_id AND e.event_type = 'click'
        GROUP BY s1.user_id, t1),
      s3 AS (
        SELECT s2.user_id, t1, t2,
               min(CASE WHEN e.ts > t2 THEN e.ts END) AS t3
        FROM s2 LEFT JOIN events e
          ON s2.user_id = e.user_id AND e.event_type = 'purchase'
        GROUP BY s2.user_id, t1, t2)
      SELECT user_id,
             strftime(t1, '%Y-%m-%d %H:%M:%S') AS t_view,
             strftime(t2, '%Y-%m-%d %H:%M:%S') AS t_click,
             strftime(t3, '%Y-%m-%d %H:%M:%S') AS t_purchase,
             (CASE WHEN t3 IS NOT NULL THEN 3
                   WHEN t2 IS NOT NULL THEN 2
                   ELSE 1 END) AS reached
      FROM s3 ORDER BY user_id
    """,

    "llm_funnel_rates" -> s"""
      WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (
        SELECT s1.user_id, t1,
               min(CASE WHEN e.ts > t1 THEN e.ts END) AS t2
        FROM s1 LEFT JOIN events e
          ON s1.user_id = e.user_id AND e.event_type = 'click'
        GROUP BY s1.user_id, t1),
      s3 AS (
        SELECT s2.user_id, t1, t2,
               min(CASE WHEN e.ts > t2 THEN e.ts END) AS t3
        FROM s2 LEFT JOIN events e
          ON s2.user_id = e.user_id AND e.event_type = 'purchase'
        GROUP BY s2.user_id, t1, t2),
      wide AS (
        SELECT CAST(count(*) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n3
        FROM s3)
      SELECT 1 AS step, 'view' AS step_name, n1 AS n_reached,
             ${round6sql("n1 / CAST(n1 AS DOUBLE)")} AS conv_from_prev,
             ${round6sql("n1 / CAST(n1 AS DOUBLE)")} AS conv_from_start
      FROM wide
      UNION ALL
      SELECT 2, 'click', n2,
             ${round6sql("n2 / CAST(n1 AS DOUBLE)")},
             ${round6sql("n2 / CAST(n1 AS DOUBLE)")}
      FROM wide
      UNION ALL
      SELECT 3, 'purchase', n3,
             ${round6sql("n3 / CAST(n2 AS DOUBLE)")},
             ${round6sql("n3 / CAST(n1 AS DOUBLE)")}
      FROM wide
      ORDER BY step
    """,

    "p_ljung_box" -> s"""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1),
      spine AS MATERIALIZED (
        SELECT date_diff('day', (SELECT min(day) FROM daily), day) AS t, y
        FROM daily),
      base AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) // count(*) AS BIGINT) AS mu
        FROM spine),
      cent AS MATERIALIZED (
        SELECT t, y - (SELECT mu FROM base) AS x FROM spine),
      den AS (SELECT CAST(sum(x * x) AS BIGINT) AS d0 FROM cent),
      rks AS MATERIALIZED (
        SELECT l.lag,
               CAST((sum(a.x * b.x) * 1000000) // (SELECT d0 FROM den)
                 AS BIGINT) AS r_ppm
        FROM (SELECT CAST(x AS BIGINT) AS lag FROM range(1, 8) t(x)) l
        JOIN cent a ON true
        JOIN cent b ON b.t = a.t + l.lag
        GROUP BY l.lag),
      q AS (
        SELECT CAST(((SELECT n FROM base) * ((SELECT n FROM base) + 2)
                 * sum((r_ppm * r_ppm) // ((SELECT n FROM base) - lag)))
               // 1000000 AS BIGINT) AS q_micro
        FROM rks)
      SELECT lag, r_ppm, CAST(NULL AS BIGINT) AS q_micro,
             CAST(NULL AS BOOLEAN) AS reject_whiteness
      FROM rks
      UNION ALL
      SELECT CAST(-1 AS BIGINT), CAST(NULL AS BIGINT), q_micro,
             q_micro > 14067000
      FROM q
      ORDER BY lag
    """,

    "llm_survival_na" -> """
      WITH u AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l,
               min(CASE WHEN event_type = 'purchase' AND value > 150
                   THEN CAST(ts AS DATE) END) AS pt
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      dur AS (
        SELECT CASE WHEN pt IS NOT NULL THEN date_diff('day', f, pt)
                    ELSE date_diff('day', f, l) END AS d,
               CASE WHEN pt IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM u),
      hist AS (
        SELECT d, count(*) AS c_all, CAST(sum(obs) AS BIGINT) AS c_obs
        FROM dur GROUP BY 1),
      ntot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM dur),
      steps AS (
        SELECT d, n_risk, c_obs FROM (
          SELECT d, c_obs,
                 n_tot - coalesce(sum(c_all) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
          FROM hist, ntot)
        WHERE c_obs > 0),
      na AS (
        SELECT d, n_risk, c_obs,
               sum((c_obs * 1000000) // n_risk)
                 OVER (ORDER BY d) AS h_cum_micro,
               sum((c_obs * 1000000) // (n_risk * n_risk))
                 OVER (ORDER BY d) AS var_cum_micro
        FROM steps)
      SELECT CAST(d AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
             c_obs AS d_events, CAST(h_cum_micro AS BIGINT) AS h_cum_micro,
             CAST(var_cum_micro AS BIGINT) AS var_cum_micro
      FROM na ORDER BY t_days
    """,

    "p_jonckheere" -> """
      WITH d AS (
        SELECT hour(ts) // 4 AS g,
               CAST(floor(value * 1000.0) AS BIGINT) AS v
        FROM events),
      hist AS MATERIALIZED (
        SELECT g, v, count(*) AS c FROM d GROUP BY 1, 2),
      spine AS (SELECT DISTINCT v FROM hist),
      grp AS (SELECT DISTINCT g FROM hist),
      grid AS MATERIALIZED (
        SELECT grp.g, spine.v, coalesce(h.c, 0) AS c,
               sum(coalesce(h.c, 0)) OVER (PARTITION BY grp.g
                 ORDER BY spine.v) AS cum
        FROM spine CROSS JOIN grp
        LEFT JOIN hist h ON h.g = grp.g AND h.v = spine.v),
      jt AS (
        SELECT coalesce(sum(CAST(b.c AS HUGEINT) * (2 * a.cum - a.c)), 0)
          AS jt2
        FROM grid a JOIN grid b ON a.v = b.v AND a.g < b.g),
      sizes AS (
        SELECT CAST(sum(ng) AS HUGEINT) AS n, count(*) AS k,
               sum(CAST(ng AS HUGEINT) * ng) AS sn2,
               sum(CAST(ng AS HUGEINT) * ng * (2 * ng + 3)) AS sn23
        FROM (SELECT g, sum(c) AS ng FROM hist GROUP BY 1)),
      f AS (
        SELECT jt2, n, k, (n * n - sn2) // 2 AS e2,
               n * n * (2 * n + 3) - sn23 AS var72
        FROM jt, sizes)
      SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             CAST(jt2 AS BIGINT) AS jt2, CAST(e2 AS BIGINT) AS e2,
             CAST(CASE WHEN var72 > 0
                  THEN ((jt2 - e2) * (jt2 - e2) * 18 * 1000000) // var72
                  ELSE 0 END AS BIGINT) AS z2_micro,
             jt2 > e2 AS rising,
             (var72 > 0 AND (jt2 - e2) * (jt2 - e2) * 18 * 1000000
                >= CAST(3841458 AS HUGEINT) * var72) AS reject_05
      FROM f
    """,

    "p_gumbel_maxima" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS m
        FROM events GROUP BY 1),
      mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(CAST(m AS HUGEINT)) AS sm,
               sum(CAST(m AS HUGEINT) * m) AS sm2
        FROM daily),
      v AS (
        SELECT n, (sm * 1000000) // n AS mean_micro,
               ((n * sm2 - sm * sm) * 1000000000000) // (n * (n - 1))
                 AS varn
        FROM mom),
      s0 AS (SELECT v.*, CAST(floor(sqrt(CAST(varn AS DOUBLE)))
               AS HUGEINT) AS r0 FROM v),
      s1 AS (SELECT s0.*, CASE WHEN (r0 + 1) * (r0 + 1) <= varn
                               THEN r0 + 1 ELSE r0 END AS r1 FROM s0),
      s2 AS (SELECT s1.*, CASE WHEN r1 * r1 > varn THEN r1 - 1
                               ELSE r1 END AS s_micro FROM s1),
      fit AS (
        SELECT n, mean_micro,
               (7796968 * s_micro) // 10000000 AS beta_micro
        FROM s2),
      fit2 AS (
        SELECT n,
               mean_micro - (5772157 * beta_micro) // 10000000 AS mu_micro,
               beta_micro
        FROM fit),
      hz(horizon_days, c7) AS (VALUES (7, 18698247), (30, 33842945))
      SELECT CAST(hz.horizon_days AS BIGINT) AS horizon_days,
             CAST(n AS BIGINT) AS n_days,
             CAST(mu_micro AS BIGINT) AS mu_micro,
             CAST(beta_micro AS BIGINT) AS beta_micro,
             CAST(mu_micro + (hz.c7 * beta_micro) // 10000000 AS BIGINT)
               AS return_level_micro
      FROM fit2, hz
      ORDER BY horizon_days
    """,

    "p_periodogram" -> s"""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS x
        FROM events GROUP BY 1),
      b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      gd AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))
               AS day, d0 FROM b),
      spine AS (
        SELECT date_diff('day', gd.d0, CAST(gd.day AS DATE)) AS t,
               coalesce(daily.x, 0) AS x
        FROM gd LEFT JOIN daily ON daily.day = CAST(gd.day AS DATE)),
      m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s
            FROM spine),
      z AS MATERIALIZED (
        SELECT t, m.n * x - m.s AS z, m.n AS n FROM spine, m),
      trig(p, r, cmi, smi) AS (VALUES ${periodogramTrig
        .map { case (p, r, c, sn) => s"($p, $r, $c, $sn)" }
        .mkString(", ")}),
      terms AS (
        SELECT p, sum(z.z * tg.cmi) AS a, sum(z.z * tg.smi) AS b2
        FROM z JOIN trig tg ON tg.r = z.t % tg.p
        GROUP BY p),
      sz AS (SELECT sum(z * z) AS sz2, max(n) AS n FROM z)
      SELECT CAST(p AS BIGINT) AS period,
             CAST(CASE WHEN sz2 > 0
                  THEN (2 * (a * a + b2 * b2)) // (n * sz2 * 1000000)
                  ELSE 0 END AS BIGINT) AS power_frac_micro
      FROM terms, sz ORDER BY period
    """,

    "p_page_trend" -> """
      WITH cells AS MATERIALIZED (
        SELECT CAST(ts AS DATE) AS b, hour(ts) // 4 AS j,
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
      ord AS (
        SELECT j, row_number() OVER (ORDER BY j) AS t
        FROM (SELECT DISTINCT j FROM comp)),
      l2t AS (
        SELECT coalesce(sum(CAST(t AS HUGEINT) * r2), 0) AS l2
        FROM rk JOIN ord ON ord.j = rk.j),
      nb AS (SELECT count(DISTINCT b) AS n FROM comp),
      f AS (
        SELECT n, k, n_dropped, l2,
               (CAST(n AS HUGEINT) * k * (k + 1) * (k + 1)) // 2 AS e2,
               CAST(n AS HUGEINT) * k * k * (k + 1) * (k * k - 1) AS v144
        FROM nb, ka, nd, l2t)
      SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
             CAST(n_dropped AS BIGINT) AS n_dropped,
             CAST(l2 AS BIGINT) AS l2, CAST(e2 AS BIGINT) AS e2,
             CAST(CASE WHEN v144 > 0
                  THEN ((l2 - e2) * (l2 - e2) * 36 * 1000000) // v144
                  ELSE 0 END AS BIGINT) AS z2_micro,
             l2 > e2 AS rising,
             (v144 > 0 AND (l2 - e2) * (l2 - e2) * 36 * 1000000
                >= CAST(3841458 AS HUGEINT) * v144) AS reject_05
      FROM f
    """,

    "p_runs_test" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
        FROM events GROUP BY 1),
      nn AS (SELECT count(*) AS n FROM daily),
      med AS (
        SELECT min(v) AS med FROM (
          SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM (
            SELECT v, count(*) AS c FROM daily GROUP BY 1)) h, nn
        WHERE h.cum * 2 >= nn.n),
      sgn AS (
        SELECT day, v > med AS up FROM daily, med WHERE v <> med),
      run AS (
        SELECT coalesce(sum(CASE WHEN up THEN 1 ELSE 0 END), 0) AS a,
               coalesce(sum(CASE WHEN up THEN 0 ELSE 1 END), 0) AS b,
               coalesce(sum(CASE WHEN prev IS NULL OR prev <> up
                                 THEN 1 ELSE 0 END), 0) AS r
        FROM (SELECT up, lag(up) OVER (ORDER BY day) AS prev FROM sgn))
      SELECT CAST(a + b AS BIGINT) AS n_used,
             CAST(a AS BIGINT) AS n_above, CAST(b AS BIGINT) AS n_below,
             CAST(r AS BIGINT) AS n_runs,
             CAST((2 * a * b * 1000000) // greatest(a + b, 1) + 1000000
               AS BIGINT) AS mu_micro,
             (a > 0 AND b > 0 AND
              CAST(r * (a + b) - 2 * a * b - (a + b) AS HUGEINT)
                * (r * (a + b) - 2 * a * b - (a + b))
                * (a + b - 1) * 10000
              >= CAST(38416 AS HUGEINT) * (2 * a * b)
                 * (2 * a * b - (a + b))) AS reject_05
      FROM run
    """,

    // Replays the two lead() windows over (user_id | ts, event_id), the
    // 30-min consecutive-gap filter (boundary INCLUSIVE: s1 <= ts + 30min),
    // and the (n_users DESC, n_occurrences DESC, pattern) total order —
    // pattern encodes its own length, so the tie-break is genuinely total.
    "p_seq_patterns" -> """
      WITH o AS (
        SELECT user_id, event_type, ts,
               lead(event_type, 1) OVER w AS t1,
               lead(ts, 1) OVER w AS s1,
               lead(event_type, 2) OVER w AS t2,
               lead(ts, 2) OVER w AS s2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      pats AS (
        SELECT user_id, event_type || '>' || t1 AS pattern, 2 AS length
        FROM o
        WHERE s1 IS NOT NULL AND s1 <= ts + INTERVAL 30 MINUTE
        UNION ALL
        SELECT user_id, event_type || '>' || t1 || '>' || t2 AS pattern,
               3 AS length
        FROM o
        WHERE s1 IS NOT NULL AND s2 IS NOT NULL
          AND s1 <= ts + INTERVAL 30 MINUTE
          AND s2 <= s1 + INTERVAL 30 MINUTE)
      SELECT pattern, length,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM pats
      GROUP BY pattern, length
      ORDER BY n_users DESC, n_occurrences DESC, pattern
      LIMIT 30
    """,

    // Replays the dense 30-day arena, the JVM-folded bonus table
    // (every (p, n) pair as an integer literal — no runtime sqrt/ln
    // in either engine), the play-each-arm-once seed, and all 29
    // decision steps as unrolled MATERIALIZED CTEs.
    "llm_bandit_ucb" -> {
      val horizon = 30
      // p covers |arms| + horizon - 2 for any arm count the Spark side
      // ACCEPTS (ucbTrajectory requires arms + horizon - 2 <= 60, so an
      // out-of-range feed fails loudly there instead of silently
      // emptying this join)
      val bonusRows = (for (p <- 2 to 60; n <- 1 to 60)
        yield s"($p, $n, ${EventOps.ucbBonusMicro(p, n)})").mkString(", ")
      val tVals = (1 to horizon).map(t => s"($t)").mkString(", ")
      val steps = (2 to horizon).map { t =>
        s"""sc$t AS (
        SELECT st.arm, st.n, st.s, st.s // st.n + b.b AS ucb
        FROM st${t - 1} st
        JOIN bonus b ON b.n = st.n
          AND b.p = (SELECT count(*) FROM st1) + $t - 2),
      ch$t AS MATERIALIZED (
        SELECT arm, ucb FROM (
          SELECT arm, ucb,
                 row_number() OVER (ORDER BY ucb DESC, arm) AS k
          FROM sc$t)
        WHERE k = 1),
      st$t AS MATERIALIZED (
        SELECT st.arm,
               st.n + CASE WHEN st.arm = ch.arm THEN 1 ELSE 0 END AS n,
               st.s + CASE WHEN st.arm = ch.arm THEN r.r ELSE 0 END AS s
        FROM st${t - 1} st
        CROSS JOIN ch$t ch
        JOIN rnorm r ON r.arm = st.arm AND r.t = $t),
      o$t AS (
        SELECT $t AS t, ch.arm, r.r AS reward, ch.ucb,
               st.n AS n_after, st.s AS s_after
        FROM ch$t ch
        JOIN st$t st ON st.arm = ch.arm
        JOIN rnorm r ON r.arm = ch.arm AND r.t = $t)"""
      }.mkString(",\n      ")
      val oAll = (1 to horizon).map(t => s"SELECT * FROM o$t")
        .mkString(" UNION ALL ")
      s"""
      WITH ev AS (
        SELECT event_type AS arm, CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events),
      mind AS (SELECT min(day) AS d0 FROM ev),
      cell AS MATERIALIZED (
        SELECT arm,
               CAST(date_diff('day', d0, day) + 1 AS INTEGER) AS t,
               CAST((sum(c) * 1000000) // count(*) AS BIGINT) AS mean
        FROM ev CROSS JOIN mind
        GROUP BY 1, 2),
      mx AS (SELECT greatest(1, max(mean)) AS mx FROM cell),
      rnorm AS MATERIALIZED (
        SELECT a.arm, tt.t,
               CAST(coalesce((CAST(c.mean AS HUGEINT) * 1000000) // mx.mx,
                 0) AS BIGINT) AS r
        FROM (SELECT DISTINCT arm FROM ev) a
        CROSS JOIN (VALUES $tVals) tt(t)
        CROSS JOIN mx
        LEFT JOIN cell c ON c.arm = a.arm AND c.t = tt.t),
      bonus(p, n, b) AS (VALUES $bonusRows),
      st1 AS MATERIALIZED (
        SELECT arm, CAST(1 AS BIGINT) AS n, r AS s
        FROM rnorm WHERE t = 1),
      o1 AS (
        SELECT 1 AS t, arm, r AS reward, CAST(0 AS BIGINT) AS ucb,
               CAST(1 AS BIGINT) AS n_after, r AS s_after
        FROM rnorm WHERE t = 1),
      $steps
      SELECT o.t, strftime(mind.d0 + (o.t - 1), '%Y-%m-%d') AS day,
             o.arm, o.reward AS reward_norm_micro,
             o.ucb AS ucb_micro, o.n_after, o.s_after
      FROM ($oAll) o CROSS JOIN mind
      ORDER BY o.t, o.arm
    """
    },

    // Replays the ratings build, the keyed-md5 item init, and both
    // ALS alternations as closed-form 2x2 adjugate solves through
    // HUGEINT; the signed factor divisions are toward-zero `//`.
    "llm_recsys_als" -> {
      def solve(out: String, outKey: String, inKey: String,
          factors: String): String =
        s"""$out AS MATERIALIZED (
        SELECT $outKey,
               CAST((1000000 * ((a22 + 100000) * b1 - a12 * b2)) // det
                 AS BIGINT) AS f1,
               CAST((1000000 * ((a11 + 100000) * b2 - a12 * b1)) // det
                 AS BIGINT) AS f2
        FROM (
          SELECT $outKey, a11, a12, a22, b1, b2,
                 (a11 + 100000) * (a22 + 100000) - a12 * a12 AS det
          FROM (
            SELECT rat.$outKey,
                   sum(CAST(g.f1 AS HUGEINT) * g.f1) AS a11,
                   sum(CAST(g.f1 AS HUGEINT) * g.f2) AS a12,
                   sum(CAST(g.f2 AS HUGEINT) * g.f2) AS a22,
                   sum(CAST(rat.r AS HUGEINT) * g.f1) AS b1,
                   sum(CAST(rat.r AS HUGEINT) * g.f2) AS b2
            FROM rat JOIN $factors g ON g.$inKey = rat.$inKey
            GROUP BY 1)))"""
      val rounds = (1 to 2).map { r =>
        val vPrev = if (r == 1) "v0" else s"v${r - 1}"
        solve(s"u$r", "u", "i", vPrev) + ",\n      " +
          solve(s"v$r", "i", "u", s"u$r")
      }.mkString(",\n      ")
      s"""
      WITH rat AS MATERIALIZED (
        SELECT o_custkey AS u, l_partkey AS i,
               CAST(count(*) AS BIGINT) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        GROUP BY 1, 2),
      v0 AS MATERIALIZED (
        SELECT i,
               900 + CAST('0x' || substr(md5('als|' || CAST(i AS VARCHAR)
                 || '|1'), 1, 15) AS BIGINT) % 201 AS f1,
               900 + CAST('0x' || substr(md5('als|' || CAST(i AS VARCHAR)
                 || '|2'), 1, 15) AS BIGINT) % 201 AS f2
        FROM (SELECT DISTINCT i FROM rat)),
      $rounds,
      act AS (SELECT u, CAST(count(*) AS BIGINT) AS n_items
              FROM rat GROUP BY 1),
      sc AS MATERIALIZED (
        SELECT u, i, score FROM (
          SELECT rat.u, rat.i,
                 CAST(CAST(uu.f1 AS HUGEINT) * vv.f1
                   + CAST(uu.f2 AS HUGEINT) * vv.f2 AS BIGINT) AS score,
                 row_number() OVER (PARTITION BY rat.u ORDER BY
                   CAST(uu.f1 AS HUGEINT) * vv.f1
                     + CAST(uu.f2 AS HUGEINT) * vv.f2 DESC,
                   rat.i) AS rn
          FROM rat
          JOIN v2 vv ON vv.i = rat.i
          JOIN u2 uu ON uu.u = rat.u)
        WHERE rn = 1)
      SELECT u AS cust, n_items, f1 AS f1_milli, f2 AS f2_milli,
             i AS top_item, score AS top_score_milli2
      FROM (
        SELECT act.u, act.n_items, u2.f1, u2.f2, sc.i, sc.score,
               row_number() OVER (ORDER BY act.n_items DESC, act.u) AS ur
        FROM act
        JOIN u2 ON u2.u = act.u
        JOIN sc ON sc.u = act.u)
      WHERE ur <= 20
      ORDER BY cust
    """
    },

    // Replays the planted shift, the daily cents sums, and the two
    // break-centered OLS fits with the identical double operation
    // order (the X141 contract).
    "p_its" -> s"""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor((CASE WHEN CAST(ts AS DATE)
                   > DATE '2024-01-15' THEN value + 25.0 ELSE value END)
                   * 100 + 0.5) AS BIGINT)) AS HUGEINT) AS y
        FROM events
        WHERE event_type = 'error' AND ts IS NOT NULL
          AND value IS NOT NULL
        GROUP BY 1),
      d AS (
        SELECT CAST(date_diff('day', DATE '2024-01-16', day) AS HUGEINT)
                 AS x, y
        FROM daily),
      mom AS (
        SELECT (x >= 0) AS post, CAST(count(*) AS HUGEINT) AS n_d,
               sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
               sum(x * y) AS sxy
        FROM d GROUP BY 1),
      segp AS (
        SELECT CAST(n_d AS BIGINT) AS n_pre,
               CAST(n_d * sxy - sx * sy AS DOUBLE)
                 / CAST(n_d * sxx - sx * sx AS DOUBLE) / 100.0 AS sl,
               CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n_d * sxx - sx * sx AS DOUBLE) / 100.0 AS lv
        FROM mom WHERE NOT post),
      segq AS (
        SELECT CAST(n_d AS BIGINT) AS n_post,
               CAST(n_d * sxy - sx * sy AS DOUBLE)
                 / CAST(n_d * sxx - sx * sx AS DOUBLE) / 100.0 AS sl,
               CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n_d * sxx - sx * sx AS DOUBLE) / 100.0 AS lv
        FROM mom WHERE post)
      SELECT p.n_pre, q.n_post,
             ${round6sql("p.sl")} AS pre_slope,
             ${round6sql("q.sl")} AS post_slope,
             ${round6sql("p.lv")} AS pre_level,
             ${round6sql("q.lv")} AS post_level,
             ${round6sql("q.lv - p.lv")} AS level_change,
             ${round6sql("q.sl - p.sl")} AS slope_change
      FROM segp p, segq q
    """,

    "llm_cusum_drift" -> s"""
      WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      days AS (
        SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM bnd),
      types AS (SELECT DISTINCT event_type FROM ev),
      actual AS (
        SELECT day, event_type, CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY 1, 2),
      daily AS (
        SELECT d.day, t.event_type,
               CASE WHEN t.event_type = 'error' AND d.day >= DATE '2024-01-26'
                    THEN coalesce(a.n, 0) * 3
                    ELSE coalesce(a.n, 0) END AS n
        FROM days d CROSS JOIN types t
        LEFT JOIN actual a ON a.day = d.day AND a.event_type = t.event_type),
      tot AS (
        SELECT event_type, sum(n) AS tt, CAST(count(*) AS BIGINT) AS nn
        FROM daily GROUP BY 1),
      pre AS (
        SELECT daily.event_type, day, n, tt, nn,
               sum(n * nn - tt) OVER (PARTITION BY daily.event_type
                 ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS p
        FROM daily JOIN tot USING (event_type)),
      sv AS (
        SELECT event_type, day, n, tt, nn,
               p - least(0, min(p) OVER (PARTITION BY event_type
                 ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)) AS s
        FROM pre)
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
             ${round6sql("CAST(s AS DOUBLE) / CAST(nn AS DOUBLE)")}
               AS cusum_stat,
             ${round6sql(
               "4.0 * sqrt(CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE))")}
               AS threshold,
             (${round6sql("CAST(s AS DOUBLE) / CAST(nn AS DOUBLE)")})
               > (${round6sql(
                 "4.0 * sqrt(CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE))")})
               AS alarm
      FROM sv ORDER BY event_type, day
    """,

    "llm_attribution" -> s"""
      WITH conv AS (
        SELECT user_id AS u, event_id AS conv_id, ts AS cts,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vmu
        FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
          AND value IS NOT NULL),
      touch AS (
        SELECT user_id AS u, event_id AS touch_id, ts AS tts,
               event_type AS channel
        FROM events
        WHERE event_type <> 'purchase' AND user_id IS NOT NULL),
      j AS (
        SELECT conv_id, vmu, channel, tts, touch_id
        FROM conv JOIN touch USING (u)
        WHERE tts < cts AND tts >= cts - INTERVAL 7 DAY),
      pos AS (
        SELECT conv_id, vmu, channel,
               row_number() OVER (PARTITION BY conv_id
                 ORDER BY tts, touch_id) AS p,
               count(*) OVER (PARTITION BY conv_id) AS m
        FROM j),
      cr AS (
        SELECT channel,
               CAST(floor(CAST(vmu AS DOUBLE)
                 * (CASE WHEN m = 1 THEN 10000.0
                         WHEN m = 2 THEN 5000.0
                         WHEN p = 1 OR p = m THEN 4000.0
                         ELSE 2000.0 / CAST(m - 2 AS DOUBLE) END)
                 / 10000.0 + 0.5) AS BIGINT) AS cmu
        FROM pos),
      att AS (
        SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
               ${round6sql("CAST(sum(cmu) AS DOUBLE) / 1e6")}
                 AS attributed_value
        FROM cr GROUP BY 1),
      direct AS (
        SELECT '(direct)' AS channel, CAST(count(*) AS BIGINT) AS n_touches,
               ${round6sql("CAST(coalesce(sum(vmu), 0) AS DOUBLE) / 1e6")}
                 AS attributed_value
        FROM conv WHERE conv_id NOT IN (SELECT conv_id FROM j))
      SELECT * FROM att UNION ALL SELECT * FROM direct ORDER BY channel
    """,

    "llm_latency_histogram" -> """
      WITH d AS (
        SELECT date_diff('second',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS dt
        FROM events)
      SELECT CASE WHEN dt <= 0 THEN 0
                  ELSE length(format('{:b}', dt)) END AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             min(dt) AS min_s, max(dt) AS max_s
      FROM d WHERE dt IS NOT NULL
      GROUP BY 1
      ORDER BY bucket
    """,

    // Replays the split, the (ctx, act, half) cell table, the
    // rank-window policy argmax, and both estimators' exact integer
    // divisions (all operands nonnegative, so DuckDB's toward-zero //
    // agrees with the Spark-side floor).
    "llm_offpolicy" -> """
      WITH base AS (
        SELECT dayofweek(ts) + 1 AS ctx, event_type AS act,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS r,
               (ts >= TIMESTAMP '2024-01-16') AS ev
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL),
      cells AS (
        SELECT ctx, act, ev, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(r) AS HUGEINT) AS s
        FROM base GROUP BY 1, 2, 3),
      pi AS (
        SELECT ctx, act AS pi_act, CAST(mean_micro AS BIGINT) AS dm_micro,
               n AS n_tr_match
        FROM (
          SELECT ctx, act, n, s // n AS mean_micro,
                 row_number() OVER (PARTITION BY ctx
                   ORDER BY (s // n) DESC, act) AS rn
          FROM cells WHERE NOT ev)
        WHERE rn = 1),
      traintot AS (
        SELECT ctx, CAST(sum(n) AS BIGINT) AS n_tr_ctx
        FROM cells WHERE NOT ev GROUP BY 1),
      ctxtot AS (
        SELECT ctx, CAST(sum(n) AS BIGINT) AS n_ctx
        FROM cells WHERE ev GROUP BY 1),
      perctx AS (
        SELECT pi.ctx, pi.pi_act, ct.n_ctx,
               coalesce(e.n, 0) AS n_match, pi.dm_micro,
               coalesce(CAST((e.s * tt.n_tr_ctx) // pi.n_tr_match
                 AS BIGINT), 0) AS ips_term,
               coalesce(CAST((CAST(e.n AS HUGEINT) * tt.n_tr_ctx * 1000000)
                 // pi.n_tr_match AS BIGINT), 0) AS w_term,
               ct.n_ctx * pi.dm_micro
                 + coalesce(CAST(((e.s - CAST(e.n AS HUGEINT) * pi.dm_micro)
                     * tt.n_tr_ctx) // pi.n_tr_match AS BIGINT), 0)
                 AS dr_total
        FROM pi
        JOIN traintot tt ON tt.ctx = pi.ctx
        JOIN ctxtot ct ON ct.ctx = pi.ctx
        LEFT JOIN (SELECT ctx, act, n, s FROM cells WHERE ev) e
          ON e.ctx = pi.ctx AND e.act = pi.pi_act),
      allrow AS (
        SELECT '__ALL__' AS context, '-' AS pi_action,
               CAST(sum(n_ctx) AS BIGINT) AS n_eval,
               CAST(sum(n_match) AS BIGINT) AS n_match,
               CAST(sum(CAST(n_ctx AS HUGEINT) * dm_micro)
                 // sum(n_ctx) AS BIGINT) AS dm_micro,
               CAST(sum(CAST(ips_term AS HUGEINT))
                 // sum(n_ctx) AS BIGINT) AS ips_micro,
               CASE WHEN sum(w_term) > 0 THEN
                 CAST(sum(CAST(ips_term AS HUGEINT) * 1000000)
                   // sum(w_term) AS BIGINT)
               ELSE 0 END AS snips_micro,
               CAST(sum(CAST(dr_total AS HUGEINT))
                 // sum(n_ctx) AS BIGINT) AS dr_micro
        FROM perctx)
      SELECT * FROM (
        SELECT CAST(ctx AS VARCHAR) AS context, pi_act AS pi_action,
               n_ctx AS n_eval, CAST(n_match AS BIGINT) AS n_match,
               dm_micro,
               CAST(CAST(ips_term AS HUGEINT) // n_ctx AS BIGINT)
                 AS ips_micro,
               CASE WHEN w_term > 0 THEN
                 CAST((CAST(ips_term AS HUGEINT) * 1000000) // w_term
                   AS BIGINT)
               ELSE 0 END AS snips_micro,
               CAST(CAST(dr_total AS HUGEINT) // n_ctx AS BIGINT)
                 AS dr_micro
        FROM perctx
        UNION ALL
        SELECT * FROM allrow)
      ORDER BY context
    """,

    // Replays the per-customer rollup, the three histogram rank walks,
    // and the value-based quintile membership (correlated threshold
    // counts — ≤4 rows each).
    "p_rfm_segments" -> s"""
      WITH per AS (
        SELECT o_custkey AS cust, max(CAST(o_orderdate AS DATE)) AS last_day,
               CAST(count(*) AS BIGINT) AS f,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS m_cents
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
          AND o_totalprice IS NOT NULL
        GROUP BY 1),
      rfm AS (
        SELECT cust,
               CAST(date_diff('day', last_day,
                 (SELECT max(last_day) FROM per)) AS BIGINT) AS r_days,
               f, m_cents, m_cents // 1000 AS m_bin
        FROM per),
      nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rfm),
      hist_r AS (SELECT r_days AS v, count(*) AS n FROM rfm GROUP BY 1),
      cum_r AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum FROM hist_r),
      thr_r AS (SELECT q, min(v) AS t
                FROM cum_r, nt, (VALUES (1),(2),(3),(4)) vq(q)
                WHERE cum * 5 >= q * nt.n GROUP BY q),
      hist_f AS (SELECT f AS v, count(*) AS n FROM rfm GROUP BY 1),
      cum_f AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum FROM hist_f),
      thr_f AS (SELECT q, min(v) AS t
                FROM cum_f, nt, (VALUES (1),(2),(3),(4)) vq(q)
                WHERE cum * 5 >= q * nt.n GROUP BY q),
      hist_m AS (SELECT m_bin AS v, count(*) AS n FROM rfm GROUP BY 1),
      cum_m AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum FROM hist_m),
      thr_m AS (SELECT q, min(v) AS t
                FROM cum_m, nt, (VALUES (1),(2),(3),(4)) vq(q)
                WHERE cum * 5 >= q * nt.n GROUP BY q),
      scored AS (
        SELECT cust, f, m_cents,
               6 - (1 + (SELECT count(*) FROM thr_r WHERE rfm.r_days > t))
                 AS r_score,
               1 + (SELECT count(*) FROM thr_f WHERE rfm.f > t) AS f_score,
               1 + (SELECT count(*) FROM thr_m WHERE rfm.m_bin > t)
                 AS m_score
        FROM rfm)
      SELECT r_score, f_score, m_score,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(f) AS BIGINT) AS f_total,
             CAST(sum(m_cents) AS BIGINT) AS m_cents_total,
             ${round6sql("sum(f) / CAST(count(*) AS DOUBLE)")} AS avg_orders,
             ${round6sql("sum(m_cents) / (count(*) * 100.0)")} AS avg_m
      FROM scored
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """,

    // Replays the cap-5 basket prefixes, both rule directions, and the
    // exact HUGEINT ppm divisions.
    "p_assoc_rules" -> s"""
      WITH rel AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      bcap AS (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5),
      itemsup AS (
        SELECT i AS item, CAST(count(*) AS BIGINT) AS sup
        FROM bcap GROUP BY 1),
      nb AS (
        SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM bcap),
      pairs AS (
        SELECT x.i AS a, y.i AS b, CAST(count(*) AS BIGINT) AS s_pair
        FROM bcap x JOIN bcap y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      directed AS (
        SELECT a AS antecedent, b AS consequent, s_pair FROM pairs
        UNION ALL
        SELECT b AS antecedent, a AS consequent, s_pair FROM pairs),
      scored AS (
        SELECT d.antecedent, d.consequent, d.s_pair,
               ia.sup AS s_ante, ic.sup AS s_cons, nb.n_baskets,
               CAST((CAST(d.s_pair AS HUGEINT) * 1000000) // ia.sup
                 AS BIGINT) AS conf_ppm,
               CAST((CAST(d.s_pair AS HUGEINT) * nb.n_baskets * 1000000)
                 // (CAST(ia.sup AS HUGEINT) * ic.sup) AS BIGINT)
                 AS lift_ppm
        FROM directed d
        JOIN itemsup ia ON ia.item = d.antecedent
        JOIN itemsup ic ON ic.item = d.consequent
        CROSS JOIN nb)
      SELECT antecedent, consequent, s_pair, s_ante, s_cons, n_baskets,
             conf_ppm, lift_ppm,
             ${round6sql("conf_ppm / 1e6")} AS confidence,
             ${round6sql("lift_ppm / 1e6")} AS lift
      FROM scored
      ORDER BY lift_ppm DESC, conf_ppm DESC, antecedent, consequent
      LIMIT 40
    """,

    // Range-join spelling of the rolling distinct — deliberately a
    // DIFFERENT algorithm from the Spark window-explode (see op doc).
    "llm_rolling_engagement" -> s"""
      WITH ud AS (
        SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
      dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
      wau AS (
        SELECT d.day, CAST(count(DISTINCT a.u) AS BIGINT) AS wau
        FROM (SELECT DISTINCT day FROM ud) d
        JOIN ud a ON a.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day)
      SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
             ${round6sql("dau.dau / CAST(wau.wau AS DOUBLE)")} AS stickiness
      FROM dau JOIN wau ON dau.day = wau.day
      ORDER BY day
    """,

    "llm_rate_anomaly" -> s"""
      WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      days AS (
        SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM b),
      types AS (SELECT DISTINCT event_type FROM ev),
      actual AS (
        SELECT day, event_type, CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY 1, 2),
      dense AS (
        SELECT d.day, t.event_type, coalesce(a.n, 0) AS n
        FROM days d CROSS JOIN types t
        LEFT JOIN actual a ON a.day = d.day AND a.event_type = t.event_type),
      wn AS (
        SELECT day, event_type, n,
               CAST(count(*) OVER wprev AS BIGINT) AS n_prev,
               sum(n) OVER wprev AS s_prev,
               sum(n * n) OVER wprev AS q_prev
        FROM dense
        WINDOW wprev AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      scored AS (
        SELECT day, event_type, n, n_prev,
               CAST(s_prev AS DOUBLE) / n_prev AS mean,
               greatest(CAST(q_prev AS DOUBLE) / n_prev
                          - (CAST(s_prev AS DOUBLE) / n_prev)
                            * (CAST(s_prev AS DOUBLE) / n_prev),
                        0.0) AS varr
        FROM wn)
      SELECT strftime(day, '%Y-%m-%d') AS day, event_type, n, n_prev,
             CASE WHEN n_prev = 7
                  THEN ${round6sql("mean")} END AS mean_prev,
             CASE WHEN n_prev = 7 AND sqrt(varr) > 0.0
                  THEN ${round6sql(
        "(CAST(n AS DOUBLE) - mean) / sqrt(varr)")} END AS z,
             (CASE WHEN n_prev = 7 AND sqrt(varr) > 0.0
                   THEN ${round6sql(
        "(CAST(n AS DOUBLE) - mean) / sqrt(varr)")} END IS NOT NULL
              AND abs(CASE WHEN n_prev = 7 AND sqrt(varr) > 0.0
                           THEN ${round6sql(
        "(CAST(n AS DOUBLE) - mean) / sqrt(varr)")} END) >= 3.0)
               AS is_anomaly
      FROM scored
      ORDER BY day, event_type
    """,

    "llm_time_weighted_avg" -> s"""
      WITH iv AS (
        SELECT user_id,
               epoch_us(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
                 - epoch_us(ts) AS dt,
               coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0) AS vc
        FROM events),
      agg AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
               sum(CAST(dt AS HUGEINT)) AS sdt,
               sum(CAST(vc AS HUGEINT) * CAST(dt AS HUGEINT)) AS svdt
        FROM iv WHERE dt IS NOT NULL GROUP BY user_id)
      SELECT user_id, n_intervals, CAST(sdt AS BIGINT) AS held_micros,
             ${round6sql(
        "CAST(svdt AS DOUBLE) / (CAST(sdt AS DOUBLE) * 100.0)")} AS twa
      FROM agg
      ORDER BY user_id
    """,

    "llm_dense_timeseries" -> """
      WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      days AS (
        SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM b),
      types AS (SELECT DISTINCT event_type FROM ev),
      actual AS (
        SELECT day, event_type, CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY 1, 2)
      SELECT strftime(d.day, '%Y-%m-%d') AS day, t.event_type,
             coalesce(a.n, 0) AS n
      FROM days d CROSS JOIN types t
      LEFT JOIN actual a ON a.day = d.day AND a.event_type = t.event_type
      ORDER BY 1, 2
    """,

    "p_motif_profile" -> """
      WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, event_type, value FROM events),
      b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      days AS (
        SELECT d0,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM b),
      types AS (SELECT DISTINCT event_type FROM ev),
      actual AS (
        SELECT day, event_type,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c
        FROM ev GROUP BY 1, 2),
      daily AS MATERIALIZED (
        SELECT t.event_type,
               CAST(datediff('day', d.d0, d.day) AS BIGINT) AS idx,
               coalesce(a.c, 0) AS cents
        FROM days d CROSS JOIN types t
        LEFT JOIN actual a ON a.day = d.day AND a.event_type = t.event_type),
      off AS MATERIALIZED (
        SELECT event_type, idx - k AS i, k, cents AS x
        FROM daily, (SELECT unnest(generate_series(0, 6)) AS k) ks),
      pd AS MATERIALIZED (
        SELECT a.event_type, a.i, o.i AS j,
               sum((a.x - o.x) * (a.x - o.x)) AS d2
        FROM off a JOIN off o
          ON o.event_type = a.event_type AND o.k = a.k
         AND abs(a.i - o.i) >= 7
        GROUP BY 1, 2, 3
        HAVING count(*) = 7)
      SELECT event_type, CAST(i AS BIGINT) AS pos,
             CAST(j AS BIGINT) AS nn_pos, CAST(d2 AS BIGINT) AS nn_dist2
      FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type, i
                                     ORDER BY d2, j) AS rn
        FROM pd)
      WHERE rn = 1
      ORDER BY event_type, pos
    """,

    "llm_assoc_rules" -> s"""
      WITH ut AS (
        SELECT DISTINCT user_id AS u, event_type AS i FROM events),
      tot AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users FROM ut),
      items AS (
        SELECT i, CAST(count(*) AS BIGINT) AS n_i
        FROM ut GROUP BY i
        HAVING count(*) >= (SELECT n_users FROM tot) * 0.05),
      pc AS (
        SELECT a.i AS ia, b.i AS ib, CAST(count(*) AS BIGINT) AS n_ab
        FROM ut a JOIN ut b ON a.u = b.u AND a.i < b.i
        WHERE a.i IN (SELECT i FROM items) AND b.i IN (SELECT i FROM items)
        GROUP BY a.i, b.i),
      directed AS (
        SELECT ia AS antecedent, ib AS consequent, n_ab FROM pc
        UNION ALL
        SELECT ib, ia, n_ab FROM pc)
      SELECT d.antecedent, d.consequent, t.n_users,
             ia.n_i AS n_ante, ic.n_i AS n_cons, d.n_ab,
             ${round6sql("d.n_ab / CAST(t.n_users AS DOUBLE)")} AS support,
             ${round6sql("d.n_ab / CAST(ia.n_i AS DOUBLE)")} AS confidence,
             ${round6sql(
        "CAST(d.n_ab AS DOUBLE) * CAST(t.n_users AS DOUBLE)" +
          " / (CAST(ia.n_i AS DOUBLE) * CAST(ic.n_i AS DOUBLE))")} AS lift
      FROM directed d
      JOIN items ia ON d.antecedent = ia.i
      JOIN items ic ON d.consequent = ic.i
      CROSS JOIN tot t
      ORDER BY antecedent, consequent
    """,

    "llm_markov_transitions" -> s"""
      WITH ordered AS (
        SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id),
                        '^start') AS prev_type,
               event_type AS next_type
        FROM events),
      c AS (
        SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        FROM ordered GROUP BY 1, 2)
      SELECT prev_type, next_type, n,
             ${round6sql(
        "n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)")} AS p
      FROM c
      ORDER BY prev_type, next_type
    """,

    // Removal-effect attribution: same episode windows as the Spark
    // side, then the 12-round integer value iteration unrolled once per
    // scenario (base + the four hardcoded channels of the generated
    // events domain — a new channel in the data would surface as a row
    // mismatch, which is the check working).
    "llm_attribution_markov" -> s"""
      WITH ev AS (
        SELECT user_id AS u, ts, event_id AS id,
               CASE WHEN event_type = 'purchase' THEN 'conv'
                    ELSE event_type END AS st
        FROM events),
      epi AS (
        SELECT u, ts, id, st,
               coalesce(sum(CASE WHEN st = 'conv' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY u ORDER BY ts, id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS e
        FROM ev),
      seq AS (
        SELECT st, coalesce(lag(st) OVER w, '^start') AS prev,
               lead(st) OVER w IS NULL AS is_last
        FROM epi
        WINDOW w AS (PARTITION BY u, e ORDER BY ts, id)),
      tr0 AS (
        SELECT prev, st AS next FROM seq
        UNION ALL
        SELECT st AS prev, 'null' AS next FROM seq
        WHERE is_last AND st <> 'conv'),
      cnt AS MATERIALIZED (
        SELECT prev, next, CAST(count(*) AS BIGINT) AS n
        FROM tr0 GROUP BY 1, 2),
      tot AS MATERIALIZED (
        SELECT prev, CAST(sum(n) AS BIGINT) AS t FROM cnt GROUP BY 1),
      tr AS MATERIALIZED (
        SELECT c.prev, c.next, CAST(c.n * 1000000 // t.t AS BIGINT) AS ppm
        FROM cnt c JOIN tot t USING (prev)),
      ${markovScenarioCtes("b", None, 12)},
      ${markovScenarioCtes("rclick", Some("click"), 12)},
      ${markovScenarioCtes("rerror", Some("error"), 12)},
      ${markovScenarioCtes("rsignup", Some("signup"), 12)},
      ${markovScenarioCtes("rview", Some("view"), 12)},
      base AS MATERIALIZED (SELECT p FROM b12 WHERE s = '^start'),
      rem AS (
        SELECT 'click' AS channel, p FROM rclick12 WHERE s = '^start'
        UNION ALL
        SELECT 'error', p FROM rerror12 WHERE s = '^start'
        UNION ALL
        SELECT 'signup', p FROM rsignup12 WHERE s = '^start'
        UNION ALL
        SELECT 'view', p FROM rview12 WHERE s = '^start'),
      re AS MATERIALIZED (
        SELECT channel, p AS p_conv_micro,
               CAST(((SELECT p FROM base) - p) * 1000000
                    // (SELECT p FROM base) AS BIGINT) AS removal_effect_ppm
        FROM rem)
      SELECT channel, p_conv_micro, removal_effect_ppm,
             ${round6sql("removal_effect_ppm / CAST((SELECT " +
               "sum(removal_effect_ppm) FROM re) AS DOUBLE)")}
               AS attribution_share
      FROM re
      UNION ALL
      SELECT '__BASE__', (SELECT p FROM base),
             CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
      ORDER BY channel
    """,

    "llm_trending_terms" -> s"""
      WITH t AS (
        SELECT doc_id % 7 AS win, unnest(string_split(text, ' ')) AS term
        FROM documents),
      c AS (
        SELECT win, term, CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY win, term)
      SELECT cur.win, cur.term, cur.n,
             coalesce(prev.n, 0) AS n_prev,
             ${round6sql("(cur.n + 1) / CAST(coalesce(prev.n, 0) + 1 AS DOUBLE)")} AS lift
      FROM (SELECT * FROM c WHERE n >= 10) cur
      LEFT JOIN c prev ON prev.win = cur.win - 1 AND prev.term = cur.term
      ORDER BY cur.win, cur.term
    """,

    // KM product-limit replay: identical risk sets from the duration
    // histogram, the ppm recurrence as a RECURSIVE CTE (HUGEINT //
    // matches the exact-double floor on the Spark side)
    "llm_survival_km" -> """
      WITH RECURSIVE u AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l,
               min(CASE WHEN event_type = 'purchase' AND value > 150
                   THEN CAST(ts AS DATE) END) AS pt
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      dur AS (
        SELECT CASE WHEN pt IS NOT NULL THEN date_diff('day', f, pt)
                    ELSE date_diff('day', f, l) END AS d,
               CASE WHEN pt IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM u),
      hist AS (
        SELECT d, count(*) AS c_all, CAST(sum(obs) AS BIGINT) AS c_obs
        FROM dur GROUP BY 1),
      ntot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM dur),
      steps AS (
        SELECT d, n_risk, c_obs, row_number() OVER (ORDER BY d) AS rn
        FROM (
          SELECT d, c_obs,
                 n_tot - coalesce(sum(c_all) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
          FROM hist, ntot)
        WHERE c_obs > 0),
      km AS (
        SELECT rn, d, n_risk, c_obs,
               (1000000 * (n_risk - c_obs)) // n_risk AS s
        FROM steps WHERE rn = 1
        UNION ALL
        SELECT st.rn, st.d, st.n_risk, st.c_obs,
               (km.s * (st.n_risk - st.c_obs)) // st.n_risk
        FROM steps st JOIN km ON st.rn = km.rn + 1)
      SELECT CAST(d AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
             c_obs AS d_events, CAST(s AS BIGINT) AS s_ppm
      FROM km
      ORDER BY t_days
    """,

    "llm_survival_rmst" -> """
      WITH RECURSIVE u AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l,
               min(CASE WHEN event_type = 'purchase' AND value > 150
                   THEN CAST(ts AS DATE) END) AS pt
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      dur AS (
        SELECT CASE WHEN pt IS NOT NULL THEN date_diff('day', f, pt)
                    ELSE date_diff('day', f, l) END AS d,
               CASE WHEN pt IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM u),
      hist AS (
        SELECT d, count(*) AS c_all, CAST(sum(obs) AS BIGINT) AS c_obs
        FROM dur GROUP BY 1),
      ntot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM dur),
      steps AS (
        SELECT d, n_risk, c_obs, row_number() OVER (ORDER BY d) AS rn
        FROM (
          SELECT d, c_obs,
                 n_tot - coalesce(sum(c_all) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
          FROM hist, ntot)
        WHERE c_obs > 0),
      km AS (
        SELECT rn, d, n_risk, c_obs,
               (1000000 * (n_risk - c_obs)) // n_risk AS s
        FROM steps WHERE rn = 1
        UNION ALL
        SELECT st.rn, st.d, st.n_risk, st.c_obs,
               (km.s * (st.n_risk - st.c_obs)) // st.n_risk
        FROM steps st JOIN km ON st.rn = km.rn + 1),
      r AS (
        SELECT d, s,
               lag(s, 1, 1000000) OVER (ORDER BY d) AS s_prev,
               lag(d, 1, 0) OVER (ORDER BY d) AS t_prev
        FROM km)
      SELECT CAST(max(d) AS BIGINT) AS tau_days,
             CAST(sum(s_prev * (d - t_prev)) AS BIGINT) AS rmst_ppm_days,
             CAST(min(s) AS BIGINT) AS s_final_ppm
      FROM r
    """,

    // quantized log-rank replay: per-variant risk sets from the same
    // duration histograms, E/V floored to micro per event time
    "llm_survival_logrank" -> """
      WITH u AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l,
               min(CASE WHEN event_type = 'purchase' AND value > 150
                   THEN CAST(ts AS DATE) END) AS pt
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      dur AS (
        SELECT user_id % 2 AS v,
               CASE WHEN pt IS NOT NULL THEN date_diff('day', f, pt)
                    ELSE date_diff('day', f, l) END AS d,
               CASE WHEN pt IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM u),
      hist AS (
        SELECT d,
               sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS a0,
               sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS a1,
               CAST(sum(CASE WHEN v = 0 THEN obs ELSE 0 END) AS BIGINT) AS o0,
               CAST(sum(CASE WHEN v = 1 THEN obs ELSE 0 END) AS BIGINT) AS o1
        FROM dur GROUP BY 1),
      nt AS (
        SELECT sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS nt0,
               sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS nt1
        FROM dur),
      steps AS (
        SELECT d, CAST(nt0 - cb0 AS HUGEINT) AS n1,
               CAST(nt1 - cb1 AS HUGEINT) AS n2, o0, o1
        FROM (
          SELECT d, o0, o1,
                 coalesce(sum(a0) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb0,
                 coalesce(sum(a1) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb1
          FROM hist), nt
        WHERE o0 + o1 > 0),
      quant AS (
        SELECT o0,
               (CAST(o0 + o1 AS HUGEINT) * n1 * 1000000) // (n1 + n2) AS e_mu,
               CASE WHEN n1 + n2 > 1 THEN
                 (CAST(o0 + o1 AS HUGEINT) * n1 * n2
                   * (n1 + n2 - (o0 + o1)) * 1000000)
                   // ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
               ELSE 0 END AS v_mu
        FROM steps)
      SELECT CAST(count(*) AS BIGINT) AS n_times,
             CAST(sum(o0) AS BIGINT) AS o_obs,
             CAST(sum(e_mu) AS BIGINT) AS e_mu,
             CAST(sum(v_mu) AS BIGINT) AS v_mu,
             CAST(((CAST(sum(o0) AS HUGEINT) * 1000000 - sum(e_mu))
               * (CAST(sum(o0) AS HUGEINT) * 1000000 - sum(e_mu)))
               // sum(v_mu) AS BIGINT) AS chi2_mu
      FROM quant
    """,

    "llm_retention" -> s"""
      WITH days AS (
        SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
      first AS (
        SELECT u, min(day) AS cohort FROM days GROUP BY u),
      sizes AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
        FROM first GROUP BY cohort),
      act AS (
        SELECT cohort, date_diff('day', cohort, day) AS day_offset,
               CAST(count(*) AS BIGINT) AS n_active
        FROM days JOIN first USING (u)
        WHERE date_diff('day', cohort, day) <= 7
        GROUP BY cohort, date_diff('day', cohort, day))
      SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
             CAST(day_offset AS INT) AS day_offset, n_cohort, n_active,
             ${round6sql("n_active / CAST(n_cohort AS DOUBLE)")} AS retention
      FROM act JOIN sizes USING (cohort)
      ORDER BY cohort_day, day_offset
    """,

    // Replays the integer Holt recurrence as a RECURSIVE CTE (the l_t
    // expression is repeated inside b_t — identical arithmetic, `//`
    // truncates toward zero exactly like the Spark-side Long division).
    "p_holt_forecast" -> """
      WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1),
      idx AS (SELECT d, y,
                     CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
              FROM daily),
      hw AS (
        SELECT i1.t, i1.d, i1.y,
               i1.y * 1000000 AS l, (i2.y - i1.y) * 1000000 AS b,
               CAST(NULL AS BIGINT) AS f, CAST(NULL AS BIGINT) AS e
        FROM idx i1, idx i2 WHERE i1.t = 1 AND i2.t = 2
        UNION ALL
        SELECT i.t, i.d, i.y,
               (3 * i.y * 1000000 + 7 * (hw.l + hw.b)) // 10,
               ((((3 * i.y * 1000000 + 7 * (hw.l + hw.b)) // 10) - hw.l)
                 + 9 * hw.b) // 10,
               hw.l + hw.b,
               i.y * 1000000 - (hw.l + hw.b)
        FROM hw JOIN idx i ON i.t = hw.t + 1),
      lastrow AS (SELECT hw.* FROM hw, (SELECT max(t) AS n FROM idx) n
                  WHERE hw.t = n.n),
      fc AS (SELECT strftime(lastrow.d + hs.h * INTERVAL 1 DAY,
                             '%Y-%m-%d') AS ds,
                    CAST(NULL AS BIGINT) AS y,
                    CAST(NULL AS BIGINT) AS level_micro,
                    CAST(NULL AS BIGINT) AS trend_micro,
                    CAST(l + hs.h * b AS BIGINT) AS forecast_micro,
                    CAST(NULL AS BIGINT) AS err_micro
             FROM lastrow, (SELECT unnest(range(1, 8)) AS h) hs)
      SELECT ds, y, level_micro, trend_micro, forecast_micro, err_micro
      FROM (SELECT strftime(d, '%Y-%m-%d') AS ds, y, l AS level_micro,
                   b AS trend_micro, f AS forecast_micro, e AS err_micro
            FROM hw
            UNION ALL
            SELECT * FROM fc)
      ORDER BY ds
    """,

    // seasonal replay: same full-window MA trend (ROWS frame over the
    // dense daily series), per-dow integer means; DuckDB dayofweek is
    // 0-based Sunday, Spark's 1-based — the +1 aligns them
    "p_seasonal" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1),
      wt AS (
        SELECT day, y,
               count(*) OVER w7 AS wn,
               (sum(y * 1000000) OVER w7) // 7 AS t_raw
        FROM daily
        WINDOW w7 AS (ORDER BY day
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      wt2 AS (
        SELECT day, y, CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
               CASE WHEN wn = 7 THEN CAST(t_raw AS BIGINT) END AS trend_mu
        FROM wt),
      seas AS (
        SELECT dow,
               CAST(sum(y * 1000000 - trend_mu) // count(*) AS BIGINT)
                 AS seasonal_mu
        FROM wt2 WHERE trend_mu IS NOT NULL GROUP BY 1)
      SELECT strftime(CAST(w.day AS TIMESTAMP), '%Y-%m-%d') AS day,
             w.dow, w.y, w.trend_mu, s.seasonal_mu,
             w.y * 1000000 - w.trend_mu - s.seasonal_mu AS resid_mu
      FROM wt2 w JOIN seas s USING (dow)
      ORDER BY day
    """,

    "p_theil_sen" -> """
      WITH counts AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1),
      daily AS (
        SELECT CAST(date_diff('day', (SELECT min(day) FROM counts), day)
                 AS BIGINT) AS x, y
        FROM counts),
      slopes AS (
        SELECT ((b.y - a.y) * 1000000) // (b.x - a.x) AS s
        FROM daily a JOIN daily b ON a.x < b.x),
      sl AS (
        SELECT s AS slope_ppm, n_pairs FROM (
          SELECT s, row_number() OVER (ORDER BY s) AS rn,
                 count(*) OVER () AS n_pairs
          FROM slopes)
        WHERE rn = (n_pairs + 1) // 2),
      ic AS (
        SELECT r AS intercept_ppm, n_days, slope_ppm, n_pairs FROM (
          SELECT d.y * 1000000 - sl.slope_ppm * d.x AS r,
                 sl.slope_ppm, sl.n_pairs,
                 row_number() OVER (ORDER BY d.y * 1000000
                   - sl.slope_ppm * d.x) AS rn,
                 count(*) OVER () AS n_days
          FROM daily d, sl)
        WHERE rn = (n_days + 1) // 2),
      ols AS (
        SELECT CAST(floor(CAST(count(*) * sum(x * y) - sum(x) * sum(y)
                 AS DOUBLE)
               / CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT) AS ols_slope_ppm
        FROM daily)
      SELECT CAST(n_days AS BIGINT) AS n_days,
             CAST(n_pairs AS BIGINT) AS n_pairs,
             slope_ppm, intercept_ppm, ols_slope_ppm
      FROM ic, ols
    """,

    // Theil-Sen replay: same ppm pair slopes, same lower-median rank
    // selection (rank ties select the same VALUE), same OLS moments
    // AMOC change-point replay: same planted series as llm_cusum_drift,
    // prefix-sum candidates, exact micro SSE via //, ties -> earliest.
    "p_changepoint" -> """
      WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      days AS (
        SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM bnd),
      actual AS (
        SELECT day, CAST(count(*) AS BIGINT) AS n
        FROM ev WHERE event_type = 'error' GROUP BY 1),
      daily AS MATERIALIZED (
        SELECT d.day,
               CASE WHEN d.day >= DATE '2024-01-26'
                    THEN coalesce(a.n, 0) * 3
                    ELSE coalesce(a.n, 0) END AS n
        FROM days d LEFT JOIN actual a USING (day)),
      cum AS MATERIALIZED (
        SELECT day, n, sum(n) OVER w AS s1, sum(n * n) OVER w AS ss1,
               CAST(count(*) OVER w AS BIGINT) AS n1
        FROM daily
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      tot AS (SELECT max(s1) AS st, max(ss1) AS sst, max(n1) AS nt FROM cum),
      cand AS MATERIALIZED (
        SELECT day, n,
               (s1 * 1000000) // n1 AS mean_before_micro,
               ((st - s1) * 1000000) // (nt - n1) AS mean_after_micro,
               ((n1 * ss1 - s1 * s1) * 1000000) // n1
                 + (((nt - n1) * (sst - ss1) - (st - s1) * (st - s1))
                    * 1000000) // (nt - n1) AS sse_micro
        FROM cum, tot WHERE n1 < nt),
      best AS MATERIALIZED (
        SELECT min(sse_micro) AS ms FROM cand),
      bestd AS (
        SELECT min(day) AS bd FROM cand
        WHERE sse_micro = (SELECT ms FROM best))
      SELECT strftime(day, '%Y-%m-%d') AS day, n,
             CAST(mean_before_micro AS BIGINT) AS mean_before_micro,
             CAST(mean_after_micro AS BIGINT) AS mean_after_micro,
             CAST(sse_micro AS BIGINT) AS sse_micro,
             sse_micro = (SELECT ms FROM best)
               AND day = (SELECT bd FROM bestd) AS is_best
      FROM cand ORDER BY day
    """,

    "p_pettitt" -> """
      WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      days AS (
        SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM bnd),
      actual AS (
        SELECT day, CAST(count(*) AS BIGINT) AS n
        FROM ev WHERE event_type = 'error' GROUP BY 1),
      daily AS MATERIALIZED (
        SELECT d.day,
               CASE WHEN d.day >= DATE '2024-01-26'
                    THEN coalesce(a.n, 0) * 3
                    ELSE coalesce(a.n, 0) END AS y
        FROM days d LEFT JOIN actual a USING (day)),
      vt AS (
        SELECT a.day, CAST(sum(CASE WHEN a.y > b.y THEN 1
                                    WHEN a.y < b.y THEN -1
                                    ELSE 0 END) AS BIGINT) AS v
        FROM daily a JOIN daily b ON a.day <> b.day
        GROUP BY a.day),
      ut AS MATERIALIZED (
        SELECT d.day, d.y, coalesce(v.v, 0) AS v,
               CAST(sum(coalesce(v.v, 0)) OVER (ORDER BY d.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS u
        FROM daily d LEFT JOIN vt v USING (day)),
      st AS (SELECT max(abs(u)) AS k, CAST(count(*) AS BIGINT) AS n FROM ut),
      rk AS (
        SELECT day, y, u,
               row_number() OVER (ORDER BY abs(u) DESC, day) AS rnk
        FROM ut)
      SELECT strftime(r.day, '%Y-%m-%d') AS day, r.y AS n,
             CAST(r.u AS BIGINT) AS u, (r.rnk = 1) AS is_best,
             CAST(s.k AS BIGINT) AS k,
             (CAST(6 AS HUGEINT) * s.k * s.k * 1000000
               >= CAST(3688879 AS HUGEINT) * (s.n*s.n*s.n + s.n*s.n))
               AS reject_05
      FROM rk r, st s ORDER BY day
    """,

    // Replays the planted x2 drift, the dense zero-filled spine, the
    // first-7-day baseline (toward-zero micro), and the unrolled
    // closed-form pair maxima for both one-sided sums.
    "p_cusum_tabular" -> """
      WITH ev AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(floor((CASE WHEN ts >= TIMESTAMP '2024-01-26 00:00:00'
                                THEN value * 2 ELSE value END) * 100 + 0.5)
                 AS BIGINT) AS c
        FROM events),
      bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      days AS (
        SELECT CAST(u AS DATE) AS day
        FROM (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                            CAST(d1 AS TIMESTAMP),
                                            INTERVAL 1 DAY)) AS u
              FROM bnd)),
      types AS (SELECT DISTINCT event_type FROM ev),
      actual AS (
        SELECT event_type, day, CAST(sum(c) AS BIGINT) AS y
        FROM ev GROUP BY 1, 2),
      daily AS MATERIALIZED (
        SELECT t.event_type, d.day, coalesce(a.y, 0) AS y,
               CAST(row_number() OVER (PARTITION BY t.event_type
                 ORDER BY d.day) AS BIGINT) AS i,
               sum(coalesce(a.y, 0)) OVER (PARTITION BY t.event_type
                 ORDER BY d.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        FROM days d CROSS JOIN types t
        LEFT JOIN actual a
          ON a.event_type = t.event_type AND a.day = d.day),
      base AS MATERIALIZED (
        SELECT event_type,
               (sum(y) * 1000000) // count(*) AS mu0,
               ((sum(y) * 1000000) // count(*) * 50) // 1000 AS k,
               ((sum(y) * 1000000) // count(*) * 250) // 1000 AS h
        FROM daily WHERE i <= 7 GROUP BY 1)
      SELECT e.event_type, strftime(e.day, '%Y-%m-%d') AS day, e.y,
             CAST(greatest(0, max((e.p - (s.p - s.y)) * 1000000
               - (e.i - s.i + 1) * (b.mu0 + b.k)))
               AS BIGINT) AS cusum_high_micro,
             CAST(greatest(0, max((e.i - s.i + 1) * (b.mu0 - b.k)
               - (e.p - (s.p - s.y)) * 1000000)) AS BIGINT)
               AS cusum_low_micro,
             greatest(0, max((e.p - (s.p - s.y)) * 1000000
               - (e.i - s.i + 1) * (b.mu0 + b.k))) > any_value(b.h)
               AS alarm_high,
             greatest(0, max((e.i - s.i + 1) * (b.mu0 - b.k)
               - (e.p - (s.p - s.y)) * 1000000)) > any_value(b.h)
               AS alarm_low
      FROM daily e
      JOIN base b ON b.event_type = e.event_type
      JOIN daily s ON s.event_type = e.event_type AND s.i <= e.i
      GROUP BY e.event_type, e.day, e.y
      ORDER BY e.event_type, day
    """,

    // CCF replay: dense zero-filled spine with integer day index,
    // per-lag pair join + exact Pearson moments, one sqrt per lag.
    "p_ccf" -> s"""
      WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      days AS (
        SELECT CAST(u AS DATE) AS day,
               date_diff('day', d0, CAST(u AS DATE)) AS t
        FROM (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                            CAST(d1 AS TIMESTAMP),
                                            INTERVAL 1 DAY)) AS u, d0
              FROM bnd)),
      xd AS (SELECT day, CAST(count(*) AS BIGINT) AS x FROM ev
             WHERE event_type = 'click' GROUP BY 1),
      yd AS (SELECT day, CAST(count(*) AS BIGINT) AS y FROM ev
             WHERE event_type = 'purchase' GROUP BY 1),
      daily AS MATERIALIZED (
        SELECT t, coalesce(x.x, 0) AS x, coalesce(y.y, 0) AS y
        FROM days LEFT JOIN xd x USING (day) LEFT JOIN yd y USING (day)),
      lags AS (SELECT CAST(l AS INT) AS lag FROM range(-7, 8) t(l)),
      mom AS (
        SELECT l.lag, CAST(count(*) AS BIGINT) AS n,
               sum(a.x) AS sx, sum(b.y) AS sy, sum(a.x * b.y) AS sxy,
               sum(a.x * a.x) AS sxx, sum(b.y * b.y) AS syy
        FROM lags l JOIN daily a ON true JOIN daily b ON b.t = a.t + l.lag
        GROUP BY 1)
      SELECT lag, n AS n_days,
             ${round6sql(
        "CAST(n * sxy - sx * sy AS DOUBLE)" +
        " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))" +
        " * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))")} AS r
      FROM mom ORDER BY lag
    """,

    "p_mann_kendall" -> """
      WITH ev AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d FROM events),
      b AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
      gd AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))
               AS day FROM b),
      spine AS (
        SELECT t.g, CAST(gd.day AS DATE) AS d
        FROM gd, (SELECT DISTINCT g FROM ev) t),
      cnt AS (SELECT g, d, count(*) AS y FROM ev GROUP BY 1, 2),
      daily AS MATERIALIZED (
        SELECT s.g, date_diff('day', DATE '1970-01-01', s.d) AS i,
               coalesce(c.y, 0) AS y
        FROM spine s LEFT JOIN cnt c ON c.g = s.g AND c.d = s.d),
      st AS (
        SELECT a.g, sum(CASE WHEN b2.y > a.y THEN 1
                             WHEN b2.y < a.y THEN -1 ELSE 0 END) AS s_stat
        FROM daily a JOIN daily b2 ON a.g = b2.g AND a.i < b2.i
        GROUP BY 1),
      ties AS (
        SELECT g, sum(t) AS n,
               sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS tie_sum
        FROM (SELECT g, y, count(*) AS t FROM daily GROUP BY 1, 2)
        GROUP BY 1),
      j AS (
        SELECT ties.g, n, coalesce(s_stat, 0) AS s_stat,
               CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - tie_sum
                 AS var18
        FROM ties LEFT JOIN st ON st.g = ties.g)
      SELECT g AS event_type, CAST(n AS BIGINT) AS n,
             CAST(s_stat AS BIGINT) AS s_stat,
             CAST(var18 AS BIGINT) AS var18,
             CAST(CASE WHEN var18 > 0
                  THEN (CAST(s_stat AS HUGEINT) * s_stat * 18 * 1000000)
                       // var18
                  ELSE 0 END AS BIGINT) AS z2_micro,
             s_stat > 0 AS rising,
             var18 > 0 AND CAST(s_stat AS HUGEINT) * s_stat * 18 * 1000000
               >= CAST(3841458 AS HUGEINT) * var18 AS reject_05
      FROM j ORDER BY event_type
    """,

    "p_ewma_chart" -> ewmaChartOracleSql,
  )
}
