package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.llm.EventOps

/** Hand-checked semantics for the round-8 analytics batch: association
  * rules (support/confidence/lift + the Apriori prune), time-weighted
  * average (exact step-function integral), dense time-series scaffold,
  * unpivot, and group-wise OLS.
  */
class AnalyticsOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("assocRules: exact support/confidence/lift and both directions") {
    // 4 users: {a,b} {a,b} {a} {b,c}  (c is in 1/4 baskets)
    val ev = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"),  // dup event must not double-count
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "b"), (4L, "c"))
      .toDF("user_id", "event_type")
    val got = EventOps.assocRules(ev, "user_id", "event_type",
      minSupport = 0.5)
      .orderBy("antecedent", "consequent")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5),
        r.getDouble(6), r.getDouble(7), r.getDouble(8)))
    // only a (3/4) and b (3/4) are frequent at 0.5; c (1/4) pruned, so
    // the b-c basket contributes no rule. n_ab = 2.
    assert(got.toSeq === Seq(
      ("a", "b", 2L, 0.5, 0.666667, 0.888889),
      ("b", "a", 2L, 0.5, 0.666667, 0.888889)))
  }

  test("timeWeightedAvg: exact integral, single-event user drops") {
    val ev = Seq(
      // user 1: 10.0 held 1s, then 20.0 held 3s, last event open-ended
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (2L, ts("2024-01-01 00:00:01"), 1L, 20.0),
      (3L, ts("2024-01-01 00:00:04"), 1L, 99.0),
      // user 2: single event -> no interval -> absent
      (4L, ts("2024-01-01 00:00:00"), 2L, 5.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = EventOps
      .timeWeightedAvg(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 2L, 4000000L, 17.5)))
    // (10*1 + 20*3) / 4 = 17.5
  }

  test("dense time-series grid: |days| x |types| rows, gaps zero-filled") {
    val q = graft.queries.LlmSurface.queries("llm_dense_timeseries")(
      spark, "/root/testdata/sf0.001")
    val rows = q.collect()
    val nDays = rows.map(_.getString(0)).distinct.length
    val nTypes = rows.map(_.getString(1)).distinct.length
    assert(rows.length === nDays * nTypes)
    assert(rows.forall(_.getLong(2) >= 0L))
  }

  test("p_unpivot doubles rows and is a zero-shuffle Expand pre-sort") {
    val q = graft.queries.RefSurface.queries("p_unpivot")(
      spark, "/root/testdata/sf0.001")
    assert(q.count() === 400L) // 200 parts x 2 metrics
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"unpivot should plan as Expand:\n$p")
    assert(!p.contains("Join"), s"no join expected:\n$p")
  }

  test("funnel rates: hand-checked conversion table") {
    // u1 view>click>purchase, u2 view>click, u3 view, u4 click only
    // (never enters: no view)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "purchase"),
      (4L, ts("2024-01-01 11:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 11:01:00"), 2L, "click"),
      (6L, ts("2024-01-01 12:00:00"), 3L, "view"),
      (7L, ts("2024-01-01 13:00:00"), 4L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val f = EventOps.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
    val n = (1 to 3).map(k =>
      f.filter(col("reached") >= k).count())
    assert(n === Seq(3L, 2L, 1L))
    // rates derived from those counts: 2/3 then 1/2
    assert(math.abs(n(1).toDouble / n(0) - 0.666667) < 1e-3)
    assert(n(2).toDouble / n(1) === 0.5)
  }

  test("running share: cumulative contribution and the 80% boundary") {
    import org.apache.spark.sql.expressions.Window
    val rev = Seq((1L, 5000L), (2L, 3000L), (3L, 2000L))
      .toDF("l_partkey", "rev_c")
    val tot = rev.agg(sum("rev_c").as("_t"))
    val w = Window.orderBy(desc("rev_c"), col("l_partkey"))
    val got = rev.crossJoin(tot)
      .withColumn("cum_share", graft.llm.TextOps.round6(
        sum(col("rev_c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("_t")))
      .withColumn("in_top80", col("cum_share") <= 0.8)
      .orderBy(desc("rev_c"))
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      (1L, 0.5, true), (2L, 0.8, true), (3L, 1.0, false)))
  }

  test("groupwise OLS recovers an exact line per group") {
    val df = Seq(
      ("A", 1.0, 5.0), ("A", 2.0, 7.0), ("A", 3.0, 9.0),  // y = 2x + 3
      ("B", 1.0, 1.0), ("B", 2.0, 0.5), ("B", 3.0, 0.0))  // y = -.5x + 1.5
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    df.createOrReplaceTempView("_ols_in")
    // run the query body against a controlled frame via the same math
    val li = df.select(col("l_returnflag"),
      floor(col("l_quantity") * 100 + 0.5).cast("decimal(38,0)").as("x"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("decimal(38,0)")
        .as("y"))
    val m = li.groupBy("l_returnflag").agg(
      count(lit(1)).cast("decimal(38,0)").as("n_d"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    val den = (col("n_d") * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val got = m.select(col("l_returnflag"),
      ((col("n_d") * col("sxy") - col("sx") * col("sy")).cast("double")
        / den).as("slope"),
      ((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
        / den / 100.0).as("intercept"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("A", 2.0, 3.0), ("B", -0.5, 1.5)))
  }

  test("p_histogram_stats: estimates track exact counts within the " +
    "equi-depth error budget; full-domain estimate ~= corpus size") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.RefSurface.queries("p_histogram_stats")(
      spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4)))
    assert(rows.length === 8)
    val n = graft.queries.Tables(spark, dir, "lineitem").count()
    rows.foreach { case (pred, estE6, exact) =>
      val est = estE6 / 1e6
      // wide predicates: uniform-within-bucket is good to a few percent
      // of the CORPUS (each of the <= 8 partially-covered buckets can
      // err by at most its own mass); pred 7 is deliberately narrower
      // than one bucket — there the bound is one bucket's mass (n/8)
      val slack = if (pred == 7) n / 8.0 else 0.05 * n
      assert(math.abs(est - exact) <= slack,
        s"pred $pred: est $est vs exact $exact (slack $slack)")
    }
    // full-domain predicate covers every bucket fully: estimate equals
    // n up to the per-bucket rate floors — each bucket's floor'd ppm
    // rate under-counts by < 1 ppm PER CENT of width, so the total
    // shortfall is bounded by the domain span in cents (~1.05e7 e6
    // units ~= 10 rows), never proportional to n
    val (_, fullE6, fullExact) = rows.last
    assert(fullExact === n)
    assert(fullE6 <= n * 1000000L && n * 1000000L - fullE6 <= 20000000L)
  }

  test("abCuped: strongly predictive pre-period collapses the variance, " +
    "weakly predictive real data leaves it near-unchanged") {
    // hand data: 20 users; experiment metric = 2x the pre metric plus a
    // per-variant offset, so x explains almost everything and theta ~ 2
    val ev = (0 until 20).flatMap { u =>
      Seq((u.toLong, ts(s"2024-01-05 00:00:00"), (10.0 + u * 3)),
        (u.toLong, ts(s"2024-01-20 00:00:00"), (10.0 + u * 3) * 2 + u % 2))
    }.toDF("user_id", "ts", "value")
    val out = EventOps.abCuped(ev, "user_id", "ts", "value", "2024-01-16")
      .collect()
    assert(out.length === 2)
    out.foreach { r =>
      val theta = r.getLong(2)
      assert(math.abs(theta - 2000000L) < 20000L,
        s"theta should be ~2.0, got $theta micro")
      val varRaw = r.getDouble(5); val varAdj = r.getDouble(6)
      assert(varAdj < 0.01 * varRaw,
        s"predictive covariate must collapse variance: $varAdj vs $varRaw")
    }
    // real events: values are i.i.d. across the split, so the honest
    // result is theta ~ 0 and only marginal reduction — but never a
    // large INCREASE (theta is the pooled in-sample minimizer)
    val real = graft.queries.LlmSurface.queries("llm_ab_cuped")(
      spark, "/root/testdata/sf0.001").collect()
    assert(real.length === 2)
    real.foreach { r =>
      val varRaw = r.getDouble(5); val varAdj = r.getDouble(6)
      assert(varAdj < varRaw * 1.05,
        s"pooled theta must not inflate variance: $varAdj vs $varRaw")
      assert(r.getDouble(7) === floorR6(1.0 - varAdj / varRaw) ||
        math.abs(r.getDouble(7) - (1.0 - varAdj / varRaw)) < 1e-5)
    }
  }

  private def floorR6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  test("seasonalDecompose: components reassemble exactly; trend only " +
    "on full windows; flat series decomposes to zero seasonal") {
    // flat 10-events/day series: trend = 10e6 everywhere defined,
    // seasonal = 0 for every dow, residual = 0
    val flat = (1 to 14).flatMap { d =>
      (0 until 10).map(i =>
        (i.toLong, ts(f"2024-01-$d%02d 12:00:00"), 1.0))
    }.toDF("user_id", "ts", "value")
    val f = EventOps.seasonalDecompose(flat, "ts").collect()
    assert(f.length === 14)
    f.foreach { r =>
      if (!r.isNullAt(3)) {
        assert(r.getLong(3) === 10000000L)
        assert(r.getLong(4) === 0L && r.getLong(5) === 0L)
      } else assert(r.isNullAt(5), "residual undefined where trend is")
    }
    assert(f.count(!_.isNullAt(3)) === 8, "14 days -> 8 full windows")

    // real series: y*1e6 = trend + seasonal + residual wherever defined
    val real = graft.queries.LlmSurface.queries("p_seasonal")(
      spark, "/root/testdata/sf0.001").collect()
    assert(real.length === 30)
    real.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(2) * 1000000L ===
        r.getLong(3) + r.getLong(4) + r.getLong(5),
        "decomposition must reassemble exactly")
    }
  }

  test("abDiffInDiff: hand 2x2 panel nets out the pre-existing gap") {
    // treated (odd users): pre means 10,12 -> post 20,24 (delta 11)
    // control (even): pre 10,14 -> post 12,18 (delta 3); DiD = 8
    def e(u: Long, day: Int, v: Double) =
      (u, ts(f"2024-01-${day}%02d 12:00:00"), v)
    val ev = Seq(
      e(1, 5, 10.0), e(1, 20, 20.0), e(3, 5, 12.0), e(3, 20, 24.0),
      e(0, 5, 10.0), e(0, 20, 12.0), e(2, 5, 14.0), e(2, 20, 18.0))
      .toDF("user_id", "ts", "value")
    val r = EventOps.abDiffInDiff(ev, "user_id", "ts", "value",
      "2024-01-16").collect().head
    assert((0 to 3).map(r.getLong) === Seq(2L, 2L, 2L, 2L))
    assert(r.getDouble(4) === 11.0 && r.getDouble(5) === 22.0)
    assert(r.getDouble(6) === 12.0 && r.getDouble(7) === 15.0)
    assert(r.getDouble(8) === 8.0, "DiD must net out the baseline gap")
    assert(r.getDouble(9) > 0.0)
  }

  test("degreeAssortativity: star graph is exactly -1; triangle is " +
    "degree-regular (zero variance guard)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r = graft.operators.GraphMetrics.degreeAssortativity(star, "a", "b")
      .collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === -1.0, "hub-and-spoke must be -1 exactly")
  }

  test("vocabGrowth: hand Chao1/GT; monotone levels and sublinear " +
    "Heaps exponent on the real corpus") {
    // 2 docs: "a b c a" / "b d": counts a=2,b=2,c=1,d=1 -> V=4, N=6,
    // f1=2, f2=2, chao1 = 4 + 2*1/(2*3) = 4, gt = 2e6/6 = 333333
    val tiny = Seq((1L, "a b c a"), (2L, "b d")).toDF("doc_id", "text")
    val rich = graft.llm.TextOps.vocabGrowth(tiny, "doc_id", "text")
      .filter(col("part") === "richness")
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(rich("vocab") === 4L && rich("n_tokens") === 6L)
    assert(rich("f1") === 2L && rich("f2") === 2L)
    assert(rich("chao1") === 4L)
    assert(rich("gt_unseen_ppm") === 333333L)

    val real = graft.queries.LlmSurface.queries("llm_vocab_growth")(
      spark, "/root/testdata/sf0.001").collect()
    val levels = real.filter(_.getString(0) == "level")
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    Seq("n_tokens", "vocab").foreach { sym =>
      val vs = levels.filter(_._2 == sym).sortBy(_._1).map(_._3)
      vs.sliding(2).foreach { case Array(a, b) =>
        assert(b >= a, s"$sym must be non-decreasing across levels") }
    }
    // the synthetic soup corpus draws from a FIXED 31-word vocabulary,
    // fully observed even in the 1/16 subset — so the honest readout
    // is total saturation: beta = 0 exactly (more data buys no
    // vocabulary), Chao1 estimates nothing beyond what's seen, and
    // the Good-Turing unseen mass is ~0 (no singleton words survive
    // 27 939 tokens over 31 types)
    val fit = real.filter(_.getString(0) == "fit")
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(fit("beta_micro") === 0L,
      s"saturated vocabulary must fit beta = 0, got ${fit("beta_micro")}")
    val rr = real.filter(_.getString(0) == "richness")
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(rr("chao1") === rr("vocab"),
      "no unseen richness in a saturated vocabulary")
    assert(rr("gt_unseen_ppm") <= 100L,
      s"unseen mass should be ~0, got ${rr("gt_unseen_ppm")} ppm")
  }

  test("mannWhitney: hand-computed U with ties; null z on real arms") {
    // arm0 cents {1,2,3}, arm1 {2,4,5}: U1 = 7.5 (one 2-2 tie counts
    // half), so u1_x2 = 15; tie_sum = 2^3-2 = 6;
    // z = (15-9)/(2*sqrt(9/12*(7 - 6/30))) = 6/(2*sqrt(5.1))
    val ev = Seq(
      (0L, 0.01), (0L, 0.02), (0L, 0.03),
      (1L, 0.02), (1L, 0.04), (1L, 0.05))
      .toDF("user_id", "value")
    val r = EventOps.mannWhitney(ev, "user_id", "value").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getLong(2) === 15L)
    assert(r.getLong(3) === 6L)
    val zExp = (15.0 - 9.0) / (2.0 * math.sqrt(
      9.0 / 12.0 * (7.0 - 6.0 / 30.0)))
    assert(r.getDouble(4) === floorR6(zExp))

    // random real arms: the null holds
    val real = graft.queries.LlmSurface.queries("llm_ab_mannwhitney")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(math.abs(real.getDouble(4)) < 4.0,
      s"z ${real.getDouble(4)} too extreme for random arms")
  }

  test("ratioJackknife: headline ratios match direct computation; " +
    "variance positive, null z on random arms") {
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val direct = ev.filter(col("user_id").isNotNull)
      .groupBy((col("user_id") % 2).as("arm"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, x, y) => a -> (x * 1000000L) / y }.toMap
    val r = graft.queries.LlmSurface.queries("llm_ratio_jackknife")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(r.getLong(2) === direct(0L), "r0 must equal the direct ratio")
    assert(r.getLong(3) === direct(1L), "r1 must equal the direct ratio")
    assert(r.getLong(4) > 0L && r.getLong(5) > 0L,
      "jackknife variance must be positive on real data")
    assert(math.abs(r.getDouble(6)) < 4.0,
      s"z ${r.getDouble(6)} too extreme for random arms")
  }

  test("isotonicCalibrate: minimax identity reproduces textbook PAVA " +
    "pooling; real curve is monotone") {
    // bin rates .4/.2/.6 -> PAVA pools the violating first pair: .3/.3/.6
    val rows = Seq(
      (0L, 1L), (0L, 1L), (0L, 0L), (0L, 0L), (0L, 0L),
      (1L, 1L), (1L, 0L), (1L, 0L), (1L, 0L), (1L, 0L),
      (2L, 1L), (2L, 1L), (2L, 1L), (2L, 0L), (2L, 0L))
      .toDF("z", "y")
    val out = graft.llm.TextOps.isotonicCalibrate(rows, bins = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 5L, 2L, 400000L, 300000L),
      (1L, 5L, 1L, 200000L, 300000L),
      (2L, 5L, 3L, 600000L, 600000L)))

    val real = graft.queries.LlmSurface.queries("llm_isotonic")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(real.length >= 3)
    real.map(_._3).sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, "isotonic fit must be non-decreasing") }
    // the fit preserves total positive mass up to per-block floors
    val massIso = real.map { case (n, _, iso) => n * iso }.sum
    val massRaw = real.map { case (_, pos, _) => pos * 1000000L }.sum
    assert(math.abs(massIso - massRaw) <= real.length * 1000000L,
      s"pooled mass drifted: $massIso vs $massRaw")
  }

  test("theilSenDailyTrend: an endpoint outlier day leaves the robust " +
    "slope exact while dragging OLS") {
    // days 0..8: y = 10 + 2x (clean line); day 9: y = 1000 (incident).
    // All 36 clean-pair slopes are exactly 2.0; the 9 outlier pairs
    // sort to the top, so the rank-23 lower median stays 2e6 ppm.
    // Residuals at slope 2: nine at 10e6, one at 982e6 -> median 10e6.
    val rows = (0 until 10).flatMap { x =>
      val y = if (x == 9) 1000 else 10 + 2 * x
      (0 until y).map(i =>
        (i.toLong, ts(f"2024-01-${x + 1}%02d 12:00:00"), "view", 1.0))
    }.toDF("user_id", "ts", "event_type", "value")
    val r = EventOps.theilSenDailyTrend(rows, "ts").collect().head
    assert(r.getLong(0) === 10L && r.getLong(1) === 45L)
    assert(r.getLong(2) === 2000000L, "robust slope must ignore the outlier")
    assert(r.getLong(3) === 10000000L)
    assert(r.getLong(4) > 10000000L,
      s"OLS should be dragged by the endpoint outlier, got ${r.getLong(4)}")
  }

  test("survivalLogRank: hand-computed hypergeometric O/E/V; null " +
    "result on randomly assigned real arms") {
    // arm 0 (users 0,2): convert at d=1 and d=2; arm 1 (users 1,3):
    // censored at d=9. t=1: n=(2,2), d=1 -> E=0.5, V=0.25;
    // t=2: n=(1,2), d=1 -> E=1/3, V=2/9.
    def e(u: Long, day: Int, hit: Boolean) =
      (u, ts(f"2024-01-${day + 1}%02d 12:00:00"),
        if (hit) "buy" else "view", 1.0)
    val ev = Seq(
      e(0, 0, false), e(0, 1, true),
      e(2, 0, false), e(2, 2, true),
      e(1, 0, false), e(1, 9, false),
      e(3, 0, false), e(3, 9, false))
      .toDF("user_id", "ts", "event_type", "value")
    val r = EventOps.survivalLogRank(ev, "user_id", "ts",
      col("event_type") === "buy").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 500000L + 333333L)
    assert(r.getLong(3) === 250000L + 222222L)
    val diff = 2L * 1000000L - 833333L
    assert(r.getLong(4) === diff * diff / 472222L)

    // random real assignment: the null should hold comfortably
    val real = graft.queries.LlmSurface.queries("llm_survival_logrank")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(real.getLong(3) > 0)
    assert(real.getLong(4) < 3841459L,
      s"chi2 ${real.getLong(4)} signals a difference random arms can't have")
  }

  test("rakeKeyphrases: textbook deg/freq scoring on a hand example") {
    // candidates: [machine learning approach] [deep learning] [text]
    // freq/deg: machine 1/3, learning 2/5, approach 1/3, deep 1/2,
    // text 1/1 -> word micro-scores 3e6, 2.5e6, 3e6, 2e6, 1e6
    val df = Seq((1L,
      "a machine learning approach to the deep learning of text"))
      .toDF("doc_id", "text")
    val out = graft.llm.TextOps.rakeKeyphrases(df, "doc_id", "text",
      stopwords = Seq("the", "a", "of", "to", "in"), maxLen = 4, topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("machine learning approach", 1L, 8500000L),
      ("deep learning", 1L, 4500000L),
      ("text", 1L, 1000000L)))
  }

  test("kaplanMeier: hand-computed risk sets with censoring; curve " +
    "non-increasing on real events") {
    // 6 users entering day 0: conversions at d=2 (x2) and d=4;
    // censorings at d=1, d=5, d=9. Risk sets: t=2 -> 5 at risk
    // (the d=1 censoring already left), 2 events -> S = 3/5;
    // t=4 -> 3 at risk, 1 event -> S = 3/5 * 2/3 = 2/5.
    def e(u: Long, day: Int, hit: Boolean) =
      (u, ts(f"2024-01-${day + 1}%02d 12:00:00"),
        if (hit) "buy" else "view", if (hit) 99.0 else 1.0)
    val ev = Seq(
      e(1, 0, false), e(1, 2, true),
      e(2, 0, false), e(2, 5, false),
      e(3, 0, false), e(3, 2, true),
      e(4, 0, false), e(4, 1, false),
      e(5, 0, false), e(5, 4, true),
      e(6, 0, false), e(6, 9, false))
      .toDF("user_id", "ts", "event_type", "value")
    val out = EventOps.kaplanMeier(ev, "user_id", "ts",
      col("event_type") === "buy")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 5L, 2L, 600000L), (4L, 3L, 1L, 400000L)))

    // real corpus: survival is non-increasing, risk sets strictly
    // decreasing, and every step loses at least its observed events
    val real = graft.queries.LlmSurface.queries("llm_survival_km")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(real.nonEmpty)
    real.sliding(2).foreach {
      case Array((_, n1, d1, s1), (_, n2, _, s2)) =>
        assert(s2 <= s1, "S must be non-increasing")
        assert(n2 <= n1 - d1, "risk set must lose events (and censored)")
      case _ => ()
    }
  }

  test("changepointMean: clean level shift recovered with zero SSE") {
    val daily = Seq(
      ("2024-01-01", 10L), ("2024-01-02", 10L), ("2024-01-03", 10L),
      ("2024-01-04", 20L), ("2024-01-05", 20L), ("2024-01-06", 20L))
      .toDF("d", "n").select(to_date(col("d")).as("day"), col("n"))
    val got = EventOps.changepointMean(daily, "day", "n")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("mean_before_micro"),
        col("mean_after_micro"), col("sse_micro"), col("is_best"))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.length === 5) // both segments non-empty
    val best = got.filter(_._5)
    assert(best.toSeq === Seq(("2024-01-03", 10000000L, 20000000L, 0L, true)))
    // a mid-segment break must cost positive SSE
    assert(got.filter(_._1 == "2024-01-02").head._4 > 0L)
  }

  test("changepointMean: constant series ties break to the earliest day") {
    val daily = Seq(("2024-01-01", 5L), ("2024-01-02", 5L),
      ("2024-01-03", 5L)).toDF("d", "n")
      .select(to_date(col("d")).as("day"), col("n"))
    val got = EventOps.changepointMean(daily, "day", "n")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("is_best"))
      .as[(String, Boolean)].collect().toMap
    assert(got === Map("2024-01-01" -> true, "2024-01-02" -> false))
  }

  test("psiDrift: identical periods give exactly zero; a full shift " +
    "alarms past the act threshold") {
    // same multiset in both halves → every bin has cr = cc and
    // ntr = ntc, so each ln ratio is exactly 0
    val vals = (1 to 100).map(_.toDouble)
    val same = (vals.map(v => (ts("2024-01-10 10:00:00"), "m", v)) ++
      vals.map(v => (ts("2024-01-20 10:00:00"), "m", v)))
      .toDF("ts", "event_type", "value")
    val gotSame = EventOps.psiDrift(same, "event_type", "ts", "value",
      "2024-01-15", bins = 10)
      .filter(col("bin") === -1).select("psi_micro")
      .as[Long].collect()
    assert(gotSame.toSeq === Seq(0L))

    // current period entirely above the reference max → all mass in
    // the top bin, PSI far past 0.25
    val shifted = (vals.map(v => (ts("2024-01-10 10:00:00"), "m", v)) ++
      vals.map(v => (ts("2024-01-20 10:00:00"), "m", v + 1000.0)))
      .toDF("ts", "event_type", "value")
    val gotShift = EventOps.psiDrift(shifted, "event_type", "ts", "value",
      "2024-01-15", bins = 10)
      .filter(col("bin") === -1).select("psi_micro")
      .as[Long].collect().head
    assert(gotShift > 250000L, s"psi $gotShift")
  }

  test("medianCi: exact order-statistic interval on 1..100") {
    val ev = (1 to 100).map(i => (i.toLong, "m", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val got = EventOps.medianCi(ev, "event_type", "value")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    // lo = ⌊(100−19.6)/2⌋ = 40, hi = ⌈119.6/2⌉+1 = 61; lower median
    // rank 50
    assert(got.toSeq === Seq(("m", 100L, 40L, 61L, 5000L, 4000L, 6100L)))
  }

  test("entropyRate: hand bigram fold matches exactly") {
    val df = Seq((1L, "s", "a b a b")).toDF("doc_id", "source", "text")
    val got = graft.llm.TextOps.entropyRate(df, "doc_id", "source", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    def lnMu(p: Double) = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val h1 = -(2 * lnMu(2.0 / 4) + 2 * lnMu(2.0 / 4)) / 4
    val h2 = -(2 * lnMu(2.0 / 3) + 1 * lnMu(1.0 / 3)) / 3
    assert(got === (("s", 4L, 3L, h1, h2, h2 - h1)))
  }

  test("ljungBox: alternating series — exact negative r(1), replayed Q") {
    // counts 10,20,10,20,... over 12 days: mean 15, x = ∓5
    val ev = (0 until 12).flatMap { d =>
      val day = f"2024-01-${d + 1}%02d"
      Seq.fill(if (d % 2 == 0) 10 else 20)((ts(s"$day 10:00:00"), "e"))
    }.toDF("ts", "event_type")
    val got = EventOps.ljungBox(ev, "ts", maxLag = 2)
      .as[(Long, Option[Long], Option[Long], Option[Boolean])].collect()
      .map(r => r._1 -> r).toMap
    val x = (0 until 12).map(d => if (d % 2 == 0) -5L else 5L)
    val d0 = x.map(v => v * v).sum
    def r(k: Int) =
      (x.dropRight(k).zip(x.drop(k)).map { case (a, b) => a * b }.sum
        * 1000000L) / d0
    assert(got(1L)._2 === Some(r(1)) && got(2L)._2 === Some(r(2)))
    val n = 12L
    val q = (n * (n + 2) * (r(1) * r(1) / (n - 1) + r(2) * r(2) / (n - 2))
      ) / 1000000L
    assert(got(-1L)._3 === Some(q))
    // perfectly alternating data is maximally non-white
    assert(got(-1L)._4 === Some(true))
  }

  test("obfSequential: exact rational z² and crossing on a hand case") {
    // arms of 2: A = {10, 20}, B = {30, 40} cents-exact. num = 8000²,
    // brak = 4e6 ⇒ z² = 8.0 exactly; K = 1 boundary = 2601/625 = 4.1616
    val ev = Seq(
      (0L, ts("2024-01-01 10:00:00"), "m", 10.0),
      (2L, ts("2024-01-01 11:00:00"), "m", 20.0),
      (1L, ts("2024-01-01 12:00:00"), "m", 30.0),
      (3L, ts("2024-01-01 13:00:00"), "m", 40.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = EventOps.obfSequential(ev, "user_id", "event_type", "ts",
      "value", looks = 1, lookDays = 1)
      .as[(String, Long, Long, Double, Double, Boolean, Option[Long])]
      .collect()
    assert(got.toSeq === Seq(("m", 1L, 4L, 8.0, 4.1616, true, Some(1L))))
  }

  test("obfSequential: null effect never crosses the early boundaries") {
    // identical arm distributions: z² = 0 at every look
    val ev = (0 until 40).flatMap { i =>
      val day = f"2024-01-${i % 10 + 1}%02d"
      Seq((2L * i, ts(s"$day 10:00:00"), "m", 5.0 + (i % 2)),
        (2L * i + 1, ts(s"$day 11:00:00"), "m", 5.0 + (i % 2)))
    }.toDF("user_id", "ts", "event_type", "value")
    val got = EventOps.obfSequential(ev, "user_id", "event_type", "ts",
      "value", looks = 2, lookDays = 5)
      .select("cross", "first_cross_look")
      .as[(Boolean, Option[Long])].collect()
    assert(got.forall(r => !r._1 && r._2.isEmpty))
  }

  test("ccfDaily: exact 2-day shift peaks at r(2) = 1.0") {
    // clicks on days 0..9 with varying counts; purchases are the SAME
    // counts 2 days later — at lag 2 every spine pair is (x, x)
    val counts = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)((ts(f"2024-01-${d + 1}%02d 10:00:00"), "click")) ++
      Seq.fill(c)((ts(f"2024-01-${d + 3}%02d 10:00:00"), "purchase"))
    }
    val got = EventOps.ccfDaily(rows.toDF("ts", "event_type"), "ts",
      "event_type", "click", "purchase", maxLag = 3)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(2) === ((10L, 1.0)))
    assert(got.keySet === (-3 to 3).toSet)
    // off-peak lags are strictly below the perfect alignment
    assert(got.filterKeys(_ != 2).values.forall(_._2 < 1.0))
  }
}
