package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (ts, user_id,
  * event_type, value, props): tumbling/sliding event-time windows,
  * gap-based sessionization, and JSON property extraction.
  *
  * Batch-first, streaming-ready: the windowed aggregations use
  * `functions.window(ts, ...)` — the exact same expression works under
  * Structured Streaming (`readStream` → this groupBy → `writeStream`)
  * once `.withWatermark("ts", ...)` is added; sessionization's
  * lag-and-running-sum form maps to
  * `KeyValueGroupedDataset.flatMapGroupsWithState` in a stream.
  *
  * Scale: each aggregation is one hash exchange on (window, key) —
  * partial aggregation runs map-side, so 100 TB of events reduce to
  * |windows|×|keys| rows before the shuffle. Sessionization shuffles once
  * on user_id; per-user event counts are bounded in practice (and a
  * skewed power-user key can be salted by day first).
  */
object EventOps {

  /** Cross-engine-exact money sum: quantize to integer cents, sum longs,
    * un-quantize.
    */
  def centsSum(c: Column): Column =
    sum(floor(c * 100 + 0.5).cast("long")) / 100.0

  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Tumbling event-time windows per event_type: count + exact value sum.
    * Window bounds leave as formatted strings (timestamps don't cross the
    * oracle boundary raw).
    */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), centsSum(col("value")).as("value_sum"))
      .select(fmtTs(col("w.start")).as("win_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Sliding event-time windows (each event lands in width/slide
    * windows).
    */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), centsSum(col("value")).as("value_sum"))
      .select(fmtTs(col("w.start")).as("win_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Frequent sequential patterns within user sessions (X285; the
    * length-2/3 slice of GSP / PrefixSpan, Srikant & Agrawal EDBT'96)
    * — ORDERED behavior mining that [[p_assoc_rules]]' unordered
    * itemsets can't express: "view then purchase" and "purchase then
    * view" are different products, identical baskets. Patterns are
    * CONSECUTIVE event-type runs (gap ≤ `gapMinutes` between steps,
    * the same session notion as [[sessionize]]); support counts both
    * occurrences and distinct users (the dedup that stops one bot
    * loop from minting a "frequent" pattern).
    *
    * Deterministic: the per-user order is (ts, event_id) — event_id
    * tie-break because ts collides; gap comparison is timestamp +
    * INTERVAL, no epoch rounding; the top-k order
    * (n_users, n_occurrences, pattern) is total.
    *
    * Scale: two lead() columns over the user-partitioned window (no
    * global sort — partition-parallel), one combine-agg over the
    * pattern keys (pattern-vocabulary-bounded), TakeOrdered top-k.
    */
  def sequencePatterns(events: DataFrame, gapMinutes: Int = 30,
      topK: Int = 30): DataFrame = {
    require(topK >= 1, s"topK ($topK) must be >= 1")
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gap = expr(s"INTERVAL $gapMinutes MINUTES")
    val e = events
      .withColumn("_t1", lead(col("event_type"), 1).over(byUser))
      .withColumn("_s1", lead(col("ts"), 1).over(byUser))
      .withColumn("_t2", lead(col("event_type"), 2).over(byUser))
      .withColumn("_s2", lead(col("ts"), 2).over(byUser))
    val bi = e.filter(col("_s1").isNotNull && col("_s1") <= col("ts") + gap)
      .select(col("user_id"),
        concat_ws(">", col("event_type"), col("_t1")).as("pattern"),
        lit(2).as("length"))
    val tri = e.filter(col("_s1").isNotNull && col("_s2").isNotNull
        && col("_s1") <= col("ts") + gap
        && col("_s2") <= col("_s1") + gap)
      .select(col("user_id"),
        concat_ws(">", col("event_type"), col("_t1"), col("_t2"))
          .as("pattern"),
        lit(3).as("length"))
    bi.union(tri)
      .groupBy("pattern", "length")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("user_id").as("n_users"))
      .orderBy(col("n_users").desc, col("n_occurrences").desc,
        col("pattern"))
      .limit(topK)
  }

  /** Gap-based sessionization: a new session starts when the user's gap
    * since the previous event exceeds `gapMinutes`. Timestamp comparison
    * (prev + interval < ts) keeps microsecond precision — no lossy
    * epoch-second casts. Returns one row per session.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prev = lag(col("ts"), 1).over(byUser)
    val newSession =
      when(prev.isNull || col("ts") > prev + expr(s"INTERVAL $gapMinutes MINUTES"), 1)
        .otherwise(0)
    events
      .withColumn("_new", newSession)
      .withColumn("session_idx",
        sum(col("_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        fmtTs(min(col("ts"))).as("session_start"),
        fmtTs(max(col("ts"))).as("session_end"),
        centsSum(col("value")).as("value_sum"))
  }

  /** Extract an integer property from the JSON `props` column
    * (codegen'd `get_json_object`, no UDF).
    */
  def jsonIntProp(props: Column, field: String): Column =
    get_json_object(props, s"$$.$field").cast("int")

  /** Ordered funnel analysis: for each user, the earliest time of
    * `steps(0)`, then the earliest `steps(1)` STRICTLY AFTER it, and so
    * on — the standard conversion-funnel semantics (a click before the
    * first view does not count). Returns one row per user who reached
    * step 1: (userCol, t_<step>... as formatted strings, reached).
    *
    * Shape: the cascaded-conditional-min form — one filtered aggregation
    * per step plus a left join per transition, all on the user key. The
    * joined frames are per-USER aggregates (|users| rows, not |events|),
    * so each transition join is tiny relative to the event scan; at
    * 100 TB the event table is read once per step with the type filter
    * pushed to the scan. A per-user sort + state machine would read the
    * data once but serializes each user's full history through one task;
    * the cascade keeps everything partial-aggregable.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("_t1"))
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      val prev = s"_t${i + 1}"
      val next = s"_t${i + 2}"
      val stepEvents = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("_ts"))
      val carried = (1 to i + 1).map(j => s"_t$j")
      cur = cur.join(stepEvents, Seq(userCol), "left")
        .groupBy(userCol, carried: _*)
        .agg(min(when(col("_ts") > col(prev), col("_ts"))).as(next))
    }
    // ascending fold ⇒ the final expression tests the DEEPEST step first
    // (cascade means t_k set implies t_{k-1} set, so order matters)
    val reached = (1 to steps.size)
      .foldLeft(lit(0)) { (acc, k) => when(col(s"_t$k").isNotNull, lit(k)).otherwise(acc) }
    cur.select(
      col(userCol) +:
        steps.zipWithIndex.map { case (s, i) => fmtTs(col(s"_t${i + 1}")).as(s"t_$s") } :+
        reached.as("reached"): _*)
  }

  /** Top user journeys — the "most common paths" table of product
    * analytics: each session's ordered event-type sequence rendered as
    * a `>`-joined path string, counted across sessions, top-N by
    * support with deterministic (count desc, path) ordering.
    *
    * Determinism: the in-session order is the total (ts, idCol) order;
    * the sequence is materialized by sorting an array of
    * (ts, id, type) structs — struct sort = lexicographic on the total
    * key, so the path string is identical in any engine and under any
    * partitioning (the oracle spells it `string_agg(... ORDER BY)`).
    *
    * Scale: sessionization's user-keyed window, then ONE combine agg
    * per session building a bounded array (session length is bounded
    * by the gap rule in practice; a runaway session bounds at the
    * array limit long before memory), then a combine count per path —
    * |paths| ≤ |sessions| keys. No cross-session state.
    */
  def userJourneys(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, gapMinutes: Int,
      topN: Int): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(byUser)
    val newSession =
      when(prev.isNull
        || col(tsCol) > prev + expr(s"INTERVAL $gapMinutes MINUTES"), 1)
        .otherwise(0)
    val paths = events
      .withColumn("_new", newSession)
      .withColumn("_sess", sum(col("_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("_sess"))
      .agg(array_join(expr(
        s"transform(array_sort(collect_list(struct($tsCol AS t, " +
          s"$idCol AS i, $typeCol AS y))), s -> s.y)"), ">").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path"))
      .limit(topN)
  }

  /** Inter-event latency histogram in power-of-2 buckets — the
    * latency-distribution table every monitoring stack keeps, exact
    * and engine-portable: the bucket of a positive integer delay is
    * the LENGTH OF ITS BINARY STRING (Spark `bin()`, DuckDB
    * `format('{:b}')` — both render minimal binary), i.e.
    * ⌊log₂ dt⌋ + 1 computed without any floating-point log whose
    * rounding could flip a boundary. Delays in integer seconds from
    * the (ts, idCol)-ordered per-user stream; zero-second gaps land in
    * a dedicated bucket 0.
    *
    * Scale: one user-keyed lag window, one combine agg over ≤ ~40
    * bucket keys.
    */
  def latencyHistogram(events: DataFrame, userCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val dt = unix_timestamp(col(tsCol)) -
      unix_timestamp(lag(col(tsCol), 1).over(byUser))
    events
      .withColumn("_dt", dt)
      .filter(col("_dt").isNotNull)
      .withColumn("bucket",
        when(col("_dt") <= 0, lit(0))
          .otherwise(length(expr("bin(_dt)"))).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("_dt").as("min_s"), max("_dt").as("max_s"))
  }

  /** Rolling distinct engagement (DAU / trailing-7-day WAU /
    * stickiness) — the growth-metrics table. Rolling DISTINCT does not
    * decompose into daily partials (distinct isn't a monoid), so the
    * scalable exact spelling is the window-explode trick: each
    * distinct (user, day) activity row is charged to the ≤7 window
    * ends it can serve (day .. day+6), then ONE distinct-combine per
    * (window_end, user) and a count — bounded ×7 fan-out of the
    * already-collapsed activity table, no range join, no per-day
    * rescan. The oracle deliberately uses the OTHER spelling (a range
    * join `ud.day BETWEEN we.day-6 AND we.day` + count DISTINCT) —
    * the hash match proves the two equivalent.
    *
    * Leading windows (fewer than 7 days of history) count what exists
    * — the standard dashboard convention; stickiness = dau/wau,
    * round6. 100 TB note: distinct (user, day) is the one corpus-sized
    * shuffle; everything after is |days|×|active users/window| with
    * combine-style partials.
    */
  def rollingEngagement(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val ud = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("day"))
      .distinct()
    val maxDay = ud.agg(max("day").as("_dmax"))
    val wau = ud
      .select(col("_u"), explode(sequence(col("day"),
        date_add(col("day"), 6))).as("window_end"))
      .distinct()
      .crossJoin(broadcast(maxDay))
      .filter(col("window_end") <= col("_dmax"))
      .groupBy("window_end").agg(count(lit(1)).as("wau"))
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    dau.join(wau, dau("day") === wau("window_end"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        TextOps.round6(col("dau") / col("wau").cast("double"))
          .as("stickiness"))
  }

  /** Trailing-window rate anomaly detection — the ops alarm ("did
    * error volume spike today?") over daily per-type counts: each
    * (day, type) cell scores against the mean/std of its own trailing
    * `window`-day history, z-scored, flagged at |z| ≥ 3.
    *
    * Built ON the dense scaffold (gap days must be ZERO cells, not
    * absent — a rows-window over sparse days would silently stretch
    * the trailing week across gaps): the scaffold is |days|×|types|
    * metadata, so the analytic window runs over the aggregate, never
    * the corpus. Mean/var derive from exact integer sums in identical
    * double ops (var clamped at 0 before sqrt — IEEE sqrt is correctly
    * rounded, hence engine-portable); z is round6-pinned and null
    * until a full window of history exists or when std is 0.
    */
  def rateAnomaly(events: DataFrame, tsCol: String, typeCol: String,
      window: Int): DataFrame = {
    require(window > 0, s"window ($window) must be > 0")
    val ev = events
      .select(to_date(col(tsCol)).as("day"), col(typeCol).as("event_type"))
    val days = ev.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val types = ev.select("event_type").distinct()
    val actual = ev.groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    val dense = days.crossJoin(broadcast(types))
      .join(actual, Seq("day", "event_type"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-window, -1)
    val nPrev = count(lit(1)).over(w)
    val mean = sum(col("n")).over(w).cast("double") / nPrev
    val varr = greatest(
      sum(col("n") * col("n")).over(w).cast("double") / nPrev - mean * mean,
      lit(0.0))
    val z = (col("n").cast("double") - mean) / sqrt(varr)
    dense
      .withColumn("n_prev", nPrev)
      .withColumn("z", TextOps.round6(
        when(col("n_prev") === window && sqrt(varr) > 0.0, z)))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("n_prev"),
        TextOps.round6(when(col("n_prev") === window, mean)).as("mean_prev"),
        col("z"),
        (col("z").isNotNull && abs(col("z")) >= 3.0).as("is_anomaly"))
  }

  /** Time-weighted average value per user — the monitoring/billing
    * statistic for sampled state ("what was the average held value"),
    * where a value holds from its event until the next one: TWA =
    * Σ vᵢ·Δtᵢ / Σ Δtᵢ over consecutive-event intervals (each user's
    * last event opens no interval; single-event users drop out).
    *
    * Exactness: Δt in integer MICROSECONDS (the data carries sub-second
    * timestamps — second truncation would corrupt weights), values in
    * integer cents, products and sums accumulated as decimal(38,0) —
    * a year-long interval at max cents is ~10¹⁸ per term, so long sums
    * would overflow where decimals cannot; one double division at the
    * end, round6-pinned.
    *
    * Scale: one shuffle on the user key for the lead window (same
    * note as [[sessionize]]), then a partial-combining agg per user.
    */
  def timeWeightedAvg(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_dt",
        unix_micros(lead(col(tsCol), 1).over(byUser))
          - unix_micros(col(tsCol)))
      .filter(col("_dt").isNotNull)
      .withColumn("_vc",
        coalesce(floor(col(valueCol) * 100 + 0.5).cast("long"), lit(0L)))
      .groupBy(userCol)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("_dt").cast("decimal(38,0)")).as("_sdt"),
        sum(col("_vc").cast("decimal(38,0)")
          * col("_dt").cast("decimal(38,0)")).as("_svdt"))
      .select(col(userCol), col("n_intervals"),
        col("_sdt").cast("long").as("held_micros"),
        TextOps.round6(col("_svdt").cast("double")
          / (col("_sdt").cast("double") * 100.0)).as("twa"))
  }

  /** Association rules over per-user behavior baskets — the
    * market-basket / co-engagement table ("users who do A also do B"):
    * for every ordered pair of event types, support, confidence, and
    * lift, with the Apriori antimonotone prune applied as a real plan
    * step (items below minSupport are dropped BEFORE the pair join —
    * a pair can never be frequent if an item isn't, so the prune is
    * lossless for the emitted rules).
    *
    * Scale (the SON/Apriori first pass, relationalized):
    *  1. baskets collapse to distinct (user, item) in ONE combine
    *     shuffle — repeated events never cross the exchange;
    *  2. item supports are a |types|-key combine agg (model-sized);
    *  3. the candidate-pair self-join is keyed on user with both sides
    *     semi-joined to the frequent-item list (broadcast — it is at
    *     most |types| rows), and `a < b` halves the fan-out: per-user
    *     cost is C(k,2) over its own ≤|frequent| distinct items, not
    *     |events|²;
    *  4. pair counts are a combine agg on (a, b) — ≤ C(|types|,2)
    *     groups; totals attach via broadcast joins of the model-sized
    *     count tables.
    * All ratios derive from exact integer counts (round6-pinned).
    */
  def assocRules(events: DataFrame, userCol: String, typeCol: String,
      minSupport: Double): DataFrame = {
    val ut = events.select(col(userCol).as("_u"), col(typeCol).as("_i"))
      .distinct()
    val totals = ut.select(countDistinct(col("_u")).as("n_users"))
    val items = ut.groupBy("_i").agg(count(lit(1)).as("n_i"))
      .crossJoin(broadcast(totals))
      .filter(col("n_i") >= col("n_users") * minSupport)
    val freq = items.select("_i")
    val a = ut.join(broadcast(freq), "_i").select(col("_u"), col("_i").as("_a"))
    val b = ut.join(broadcast(freq), "_i").select(col("_u"), col("_i").as("_b"))
    val pairCounts = a.join(b, Seq("_u")).filter(col("_a") < col("_b"))
      .groupBy("_a", "_b").agg(count(lit(1)).as("n_ab"))
    // emit both rule directions from each unordered frequent pair
    val directed = pairCounts.select(
      col("_a").as("antecedent"), col("_b").as("consequent"), col("n_ab"))
      .unionByName(pairCounts.select(
        col("_b").as("antecedent"), col("_a").as("consequent"), col("n_ab")))
    directed
      .join(broadcast(items.select(col("_i").as("antecedent"),
        col("n_i").as("n_ante"))), "antecedent")
      .join(broadcast(items.select(col("_i").as("consequent"),
        col("n_i").as("n_cons"))), "consequent")
      .crossJoin(broadcast(totals))
      .select(col("antecedent"), col("consequent"), col("n_users"),
        col("n_ante"), col("n_cons"), col("n_ab"),
        TextOps.round6(col("n_ab") / col("n_users").cast("double"))
          .as("support"),
        TextOps.round6(col("n_ab") / col("n_ante").cast("double"))
          .as("confidence"),
        TextOps.round6(col("n_ab").cast("double")
          * col("n_users").cast("double")
          / (col("n_ante").cast("double") * col("n_cons").cast("double")))
          .as("lift"))
  }

  /** Cohort retention matrix — the product-analytics table every event
    * warehouse serves: users cohorted by first-seen day, and for each
    * (cohort_day, day_offset) the fraction of the cohort active again
    * that day.
    *
    * Scale shape (everything partial-aggregable, no windows, no per-user
    * sort):
    *  1. distinct (user, day) — the raw stream collapses to at most
    *     |users|×|days| rows in ONE combine-style shuffle; repeated
    *     events that day never cross the exchange;
    *  2. first-seen = min(day) per user — a combine agg on the same key;
    *  3. one equi-join (user) attaches the cohort to each active day —
    *     at 100 TB both sides hash-partition on user, AQE decides the
    *     strategy;
    *  4. cohort sizes and per-(cohort, offset) actives are counts over
    *     ALREADY-DISTINCT rows — plain partial-combine counts, no
    *     count_distinct expansion needed.
    * Day arithmetic is integer datediff on DATE values; the ratio is
    * round6-pinned. Output: (cohort_day string, day_offset int,
    * n_cohort, n_active, retention), offset 0 row included (=1.0 by
    * construction — a cheap self-check for the oracle compare).
    */
  /** First-order Markov transition matrix over per-user event paths —
    * the path-analysis model behind "what happens after X" dashboards
    * and the behavioral-bigram counts a next-action model trains on.
    * Each user's events are ordered by (ts, idCol) — the id tie-break
    * makes the order total, so results are deterministic and
    * engine-portable even with same-timestamp events — and a synthetic
    * `^start` state precedes each user's first event, making row
    * probabilities from `^start` the entry-point distribution. Output:
    * (prev_type, next_type, n, p) with p the row-normalized transition
    * probability, round6-pinned.
    *
    * Scale: one shuffle on user_id for the lag window (key cardinality
    * is |users| — fine-grained, no straggler; a pathological power-user
    * key salts by day first, same note as [[sessionize]]), then a
    * partial-combining count down to at most (|types|+1)·|types| rows.
    * The normalizing window runs over that MODEL-SIZED aggregate, never
    * over the corpus.
    */
  def markovTransitions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val counts = events
      .withColumn("prev_type",
        coalesce(lag(col(typeCol), 1).over(byUser), lit("^start")))
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy("prev_type")
    counts.withColumn("p",
      TextOps.round6(col("n") / sum(col("n")).over(byPrev).cast("double")))
  }

  def retentionMatrix(events: DataFrame, userCol: String, tsCol: String,
      maxOffset: Int): DataFrame = {
    require(maxOffset >= 0, s"maxOffset ($maxOffset) must be >= 0")
    val days = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_day"))
      .distinct()
    val first = days.groupBy("_u").agg(min("_day").as("_cohort"))
    val sizes = first.groupBy("_cohort")
      .agg(count(lit(1)).as("n_cohort"))
    days.join(first, "_u")
      .withColumn("day_offset", datediff(col("_day"), col("_cohort")))
      .filter(col("day_offset") <= maxOffset)
      .groupBy("_cohort", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "_cohort")
      .select(
        date_format(col("_cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_cohort"), col("n_active"),
        TextOps.round6(col("n_active") / col("n_cohort").cast("double"))
          .as("retention"))
  }

  /** Poisson-bootstrap confidence interval for the per-type mean value —
    * the production bootstrap (Chamandy et al. 2012): instead of R
    * resampling passes, each row carries R independent Poisson(1)
    * replicate weights, so ONE corpus pass computes every replicate's
    * weighted mean and the CI is a percentile over R numbers.
    *
    * Determinism: the "randomness" is md5(salt|id|rep) reduced to a
    * 48-bit integer and compared against the Poisson(1) CDF as SIX
    * INTEGER threshold literals (⌊cdf_k·2⁴⁸⌋ — the weight never touches
    * a float, and truncation at w=6 drops 1.4e-5 of the mass,
    * identically in both engines). Replicate means are exact
    * micro-unit-sum / weight-count rationals pinned round6; the
    * percentile interpolation then runs over R pinned doubles with the
    * same (quantile_cont ≡ Spark percentile) formula both engines use.
    *
    * Shape: the ×R explode collapses in the SAME stage's map-side
    * combine — the shuffle carries |types|·R partial rows, never the
    * corpus; the percentile agg runs over R rows per type. Weighted
    * sums accumulate as decimal(38,0) (micro-values × weight ≤ 6
    * overflow long sums at ~10¹⁰ rows; decimal does not).
    *
    * Output: (event_type, n, mean_full, n_reps, ci_lo, ci_mid, ci_hi)
    * at 2.5/50/97.5 percent.
    */
  def poissonBootstrapCi(events: DataFrame, idCol: String, typeCol: String,
      valueCol: String, reps: Int, salt: String): DataFrame = {
    require(reps >= 4, s"reps ($reps) must be >= 4 for a percentile CI")
    // ⌊cdf·2⁴⁸⌋ of Poisson(1) at k = 0..5; weight = #(thresholds ≤ h)
    val thresholds = Seq(103548857136060L, 207097714272121L,
      258872142840152L, 276130285696162L, 280444821410164L,
      281307728552965L)
    val base = events
      .filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(typeCol).as("event_type"), col(idCol).cast("string").as("_id"),
        floor(col(valueCol) * 1000000 + 0.5).cast("decimal(38,0)").as("_vmu"))
    val h = conv(substring(md5(concat(lit(s"$salt|"), col("_id"), lit("|"),
      col("_r").cast("string"))), 1, 12), 16, 10).cast("long")
    val w = thresholds.map(t => when(h >= t, 1L).otherwise(0L))
      .reduce(_ + _).cast("decimal(38,0)")
    val repMeans = base
      .select(col("event_type"), col("_id"), col("_vmu"),
        explode(sequence(lit(0), lit(reps - 1))).as("_r"))
      .withColumn("_w", w)
      .groupBy("event_type", "_r")
      .agg(sum(col("_w")).as("_neff"), sum(col("_w") * col("_vmu")).as("_s"))
      .filter(col("_neff") > 0)
      .withColumn("_mean_r", TextOps.round6(col("_s").cast("double")
        / col("_neff").cast("double") / 1e6))
    val ci = repMeans.groupBy("event_type")
      .agg(count(lit(1)).as("n_reps"),
        TextOps.round6(expr("percentile(_mean_r, 0.025)")).as("ci_lo"),
        TextOps.round6(expr("percentile(_mean_r, 0.5)")).as("ci_mid"),
        TextOps.round6(expr("percentile(_mean_r, 0.975)")).as("ci_hi"))
    base.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        TextOps.round6(sum(col("_vmu")).cast("double")
          / count(lit(1)).cast("double") / 1e6).as("mean_full"))
      .join(ci, "event_type")
      .select(col("event_type"), col("n"), col("mean_full"), col("n_reps"),
        col("ci_lo"), col("ci_mid"), col("ci_hi"))
  }

  /** One-sided CUSUM drift detection over a DAILY count table (Page
    * 1954): per type, S_t = max(0, S_{t−1} + (x_t − μ)) flags sustained
    * upward rate drift that a per-day z-test ([[rateAnomaly]]) dilutes —
    * ten days of +2σ never trips a daily threshold but accumulates
    * linearly in S.
    *
    * Exactness: the recursion is the textbook prefix identity
    * S_t = P_t − min(0, min_{j≤t} P_j) with P the prefix sum of
    * deviations, and deviations stay INTEGER by working in N-units
    * (dev = N·x_t − T, so μ = T/N never becomes a float inside the
    * accumulation); the only doubles are the final /N re-scale and the
    * √μ threshold, both round6-pinned, and the alarm compares the two
    * ROUNDED values so no boundary row can flip cross-engine. Overflow
    * envelope: N·x fits a long to x ~ 10¹²·days⁻¹-scale counts.
    *
    * Input must be the DENSE scaffold (gap days as ZERO rows — the
    * rateAnomaly contract): a missing day would silently splice two
    * windows. Both analytic windows run over the |days|×|types|
    * aggregate, never the event corpus.
    *
    * Output: (type, day, n, cusum_stat, threshold, alarm) where
    * cusum_stat = S_t/N in per-day row units and threshold =
    * sigmas·√μ.
    */
  def cusumDrift(daily: DataFrame, typeCol: String, dayCol: String,
      nCol: String, sigmas: Double = 4.0): DataFrame = {
    require(sigmas > 0, s"sigmas ($sigmas) must be > 0")
    val tot = daily.groupBy(col(typeCol))
      .agg(sum(col(nCol)).as("_T"), count(lit(1)).as("_N"))
    val wPre = Window.partitionBy(col(typeCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.join(broadcast(tot), typeCol)
      .withColumn("_dev", col(nCol) * col("_N") - col("_T"))
      .withColumn("_pre", sum(col("_dev")).over(wPre))
      .withColumn("_s", col("_pre")
        - least(lit(0L), min(col("_pre")).over(wPre)))
      .select(col(typeCol), col(dayCol), col(nCol),
        TextOps.round6(col("_s").cast("double") / col("_N").cast("double"))
          .as("cusum_stat"),
        TextOps.round6(lit(sigmas)
          * sqrt(col("_T").cast("double") / col("_N").cast("double")))
          .as("threshold"))
      .withColumn("alarm", col("cusum_stat") > col("threshold"))
  }

  /** U-shaped (position-based) multi-touch attribution: each
    * conversion's value credits the user's touch events in the trailing
    * `windowDays`: 40% to the first touch, 40% to the last, 20% split
    * evenly across the middle (1 touch → 100%, 2 → 50/50); conversions
    * with no in-window touch report as the "(direct)" channel, so the
    * output column sums to total conversion value (up to the documented
    * ≤ m/2 micro-unit rounding drift per conversion).
    *
    * Determinism: position comes from the (ts, touch_id) total order —
    * same-timestamp touches cannot swap cross-engine; the basis-point
    * share is double arithmetic on exact integers in one spelled order,
    * pinned to micro-units PER TOUCH, then integer-summed per channel.
    *
    * Shape: the conversion×touch pairing is a user-keyed equi-join with
    * the time filter applied on the join output (per-user fan-out =
    * that user's own activity, the sessionize skew note applies); the
    * position window is conversion-keyed; everything after is a
    * |channels|-key combine agg. The anti-join for direct conversions
    * reuses the credited conv_id set, which is conversion-sized, not
    * corpus-sized.
    */
  def attributionUShape(events: DataFrame, userCol: String, idCol: String,
      tsCol: String, typeCol: String, valueCol: String, convType: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, s"windowDays ($windowDays) must be > 0")
    val conv = events
      .filter(col(typeCol) === convType && col(userCol).isNotNull
        && col(valueCol).isNotNull)
      .select(col(userCol).as("_u"), col(idCol).as("conv_id"),
        col(tsCol).as("_cts"),
        floor(col(valueCol) * 1000000 + 0.5).cast("long").as("_vmu"))
    val touch = events
      .filter(col(typeCol) =!= convType && col(userCol).isNotNull)
      .select(col(userCol).as("_u"), col(idCol).as("touch_id"),
        col(tsCol).as("_tts"), col(typeCol).as("channel"))
    val wPos = Window.partitionBy("conv_id")
      .orderBy(col("_tts"), col("touch_id"))
    val credit = conv.join(touch, Seq("_u"))
      .filter(col("_tts") < col("_cts")
        && col("_tts") >= col("_cts") - expr(s"INTERVAL $windowDays DAYS"))
      .withColumn("_pos", row_number().over(wPos))
      .withColumn("_m", count(lit(1)).over(Window.partitionBy("conv_id")))
      .withColumn("_bp",
        when(col("_m") === 1, lit(10000.0))
          .when(col("_m") === 2, lit(5000.0))
          .when(col("_pos") === 1 || col("_pos") === col("_m"), lit(4000.0))
          .otherwise(lit(2000.0) / (col("_m") - 2).cast("double")))
      .withColumn("_cmu",
        floor(col("_vmu").cast("double") * col("_bp") / 10000.0 + 0.5)
          .cast("long"))
    val attributed = credit.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        TextOps.round6(sum(col("_cmu")).cast("double") / 1e6)
          .as("attributed_value"))
    val direct = conv
      .join(credit.select("conv_id").distinct(), Seq("conv_id"), "left_anti")
      .agg(count(lit(1)).as("n_touches"),
        TextOps.round6(coalesce(sum(col("_vmu")), lit(0L)).cast("double")
          / 1e6).as("attributed_value"))
      .withColumn("channel", lit("(direct)"))
      .select("channel", "n_touches", "attributed_value")
    attributed.unionByName(direct)
  }

  /** Welch two-sample A/B report per event type — the continuous-metric
    * counterpart of the chi-square composition audit: is variant B's
    * mean `value` different from A's, per event type, without assuming
    * equal variances (Welch 1947)? Variant = `userCol % 2` here so both
    * engines agree by parity alone; a production assignment would be
    * [[TextOps.hashBucket]] ranges, same shape.
    *
    * Numeric contract (the p_groupwise_ols argument): values quantize
    * to integer MICRO-units; all six moments (n, Σv, Σv² per variant)
    * accumulate as decimal(38,0) in ONE combine aggregate per type —
    * Σv² stays under 38 digits up to ~10¹² rows of 10⁹-micro values.
    * Mean, Welch t and Satterthwaite df are derived by double
    * arithmetic on those exact integers over the |types|-row tail, in
    * an operation order the oracle spells identically, then
    * round6-pinned. Types where either arm has < 2 samples drop (no
    * variance estimate).
    *
    * Output: (event_type, n_a, n_b, mean_a, mean_b, lift, t_stat, df).
    */
  def abWelch(events: DataFrame, userCol: String, typeCol: String,
      valueCol: String): DataFrame = {
    val ev = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select(col(typeCol).as("event_type"),
        (col(userCol) % 2).as("_v"),
        floor(col(valueCol) * 1000000 + 0.5).cast("decimal(38,0)").as("v"))
    val m = ev.groupBy("event_type").agg(
      sum(when(col("_v") === 0, 1L).otherwise(0L)).cast("decimal(38,0)")
        .as("na"),
      sum(when(col("_v") === 1, 1L).otherwise(0L)).cast("decimal(38,0)")
        .as("nb"),
      sum(when(col("_v") === 0, col("v")).otherwise(lit(0))).as("sa"),
      sum(when(col("_v") === 1, col("v")).otherwise(lit(0))).as("sb"),
      sum(when(col("_v") === 0, col("v") * col("v")).otherwise(lit(0)))
        .as("ssa"),
      sum(when(col("_v") === 1, col("v") * col("v")).otherwise(lit(0)))
        .as("ssb"))
    def meanD(s: Column, n: Column): Column =
      s.cast("double") / n.cast("double") / 1e6
    // sample variance in value² units: (n·Σv² − (Σv)²) / (n·(n−1)) / 10¹²
    def varD(n: Column, s: Column, ss: Column): Column =
      (n * ss - s * s).cast("double") /
        (n * (n - lit(1))).cast("double") / 1e12
    val ma = meanD(col("sa"), col("na"))
    val mb = meanD(col("sb"), col("nb"))
    val sea = varD(col("na"), col("sa"), col("ssa")) / col("na").cast("double")
    val seb = varD(col("nb"), col("sb"), col("ssb")) / col("nb").cast("double")
    val t = (mb - ma) / sqrt(sea + seb)
    val welchDf = (sea + seb) * (sea + seb) /
      (sea * sea / (col("na").cast("double") - 1.0)
        + seb * seb / (col("nb").cast("double") - 1.0))
    m.filter(col("na") > 1 && col("nb") > 1)
      .select(col("event_type"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        TextOps.round6(ma).as("mean_a"), TextOps.round6(mb).as("mean_b"),
        TextOps.round6((mb - ma) / ma).as("lift"),
        TextOps.round6(t).as("t_stat"),
        TextOps.round6(welchDf).as("df"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi, Walker, WSDM 2013):
    * the standard experimentation-platform companion to [[abWelch]].
    * Each user's experiment-period metric y is adjusted by their OWN
    * pre-period metric x — y′ = y − θ·(x − x̄) with the pooled
    * θ = cov(x, y)/var(x) — which removes the between-user variance
    * that x predicts without biasing the treatment contrast (x predates
    * assignment, so E[x|variant] is equal across arms). The output's
    * var_raw vs var_adj columns show the reduction the platform buys.
    *
    * Determinism discipline: per-user sums are exact micro-units
    * (longs), the θ/x̄ moments are decimal(38,0) (squares overflow
    * int64), θ and x̄ are floored to micro ONCE (double cast of exact
    * decimals — deterministic IEEE in both engines, the X197 slope
    * pattern), and every adjusted value is then pure int64 arithmetic
    * (`DIV`), so the per-variant second moments replay bit-for-bit.
    *
    * Scale shape: one combine-agg to the per-user table (|users| rows),
    * one 1-row moment aggregate broadcast back, one combine-agg to the
    * 2-row output — no windows, no per-user driver traffic.
    */
  def abCuped(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, splitDate: String): DataFrame = {
    val split = lit(splitDate).cast("timestamp")
    val micro = floor(col(valueCol) * 1000000 + 0.5).cast("long")
    val per = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select(col(userCol).as("u"), (col(userCol) % 2).as("variant"),
        when(col(tsCol) < split, micro).otherwise(0L).as("xv"),
        when(col(tsCol) >= split, micro).otherwise(0L).as("yv"))
      .groupBy("u", "variant")
      .agg(sum("xv").as("x"), sum("yv").as("y"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val theta = per.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
      .select(
        floor((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
          * 1000000.0 + 0.5).cast("long").as("theta_mu"),
        floor(col("sx").cast("double") / col("n").cast("double"))
          .cast("long").as("xbar_mu"))
    val adj = per.crossJoin(broadcast(theta))
      .select(col("variant"), col("y"),
        (col("y") - expr("(theta_mu * (x - xbar_mu)) DIV 1000000"))
          .as("ya"),
        col("theta_mu"))
    def meanD(s: Column, n: Column): Column =
      s.cast("double") / n.cast("double") / 1e6
    def varD(n: Column, s: Column, ss: Column): Column =
      (n * ss - s * s).cast("double") /
        (n * (n - lit(1))).cast("double") / 1e12
    val m = adj.groupBy("variant").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(dec(col("y"))).as("sy"), sum(dec(col("y")) * dec(col("y"))).as("syy"),
      sum(dec(col("ya"))).as("sa"),
      sum(dec(col("ya")) * dec(col("ya"))).as("saa"),
      first("theta_mu").as("theta_mu"))
    m.select(col("variant"), col("n").cast("long").as("n_users"),
        col("theta_mu"),
        TextOps.round6(meanD(col("sy"), col("n"))).as("mean_raw"),
        TextOps.round6(meanD(col("sa"), col("n"))).as("mean_adj"),
        TextOps.round6(varD(col("n"), col("sy"), col("syy"))).as("var_raw"),
        TextOps.round6(varD(col("n"), col("sa"), col("saa"))).as("var_adj"),
        TextOps.round6(lit(1.0) -
          varD(col("n"), col("sa"), col("saa"))
            / varD(col("n"), col("sy"), col("syy"))).as("var_reduction"))
      .orderBy("variant")
  }

  /** Kaplan–Meier survival estimate (Kaplan & Meier 1958) with
    * right-censoring — time-to-event analysis over user activity: each
    * user enters at their first event, "dies" at their first event
    * matching `eventCond` (observed), or is censored at their last
    * activity if it never fires. The product-limit curve
    * S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) is the estimator an activation /
    * churn / time-to-conversion readout uses when censoring makes the
    * naive ECDF wrong (censored users still contribute to risk sets
    * until they leave).
    *
    * Determinism + scale: one combine-agg over events to the per-user
    * (duration, observed) table, one duration histogram, then
    * EVERYTHING else — risk sets via a cumulative window, the
    * product-limit fold — runs over the ≤(max duration + 1)-row
    * METADATA table (a calendar-bounded window, the water-fill/Holt
    * precedent), never the corpus. The fold is the integer ppm
    * recurrence S_k = (S_{k−1} · (n_k − d_k)) div n_k, sequenced by an
    * `aggregate` HOF over the sorted step array — values stay < 2⁵³ so
    * the double spelling is exact and matches the oracle's HUGEINT
    * `//` recurrence bit-for-bit. Ties follow the standard convention:
    * deaths at t precede censorings at t (censored-at-t users count in
    * n(t)).
    */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
      eventCond: Column): DataFrame = {
    val steps = survivalSteps(events, userCol, tsCol, eventCond)
    steps
      .agg(sort_array(collect_list(
        struct(col("d"), col("n_risk"), col("c_obs")))).as("steps"))
      .select(explode(aggregate(col("steps"),
        struct(lit(1000000L).as("s"),
          array().cast("array<struct<t:bigint,n:bigint,d:bigint,s:bigint>>")
            .as("rows")),
        (acc, st) => {
          val s2 = floor(acc.getField("s").cast("double")
              * (st.getField("n_risk") - st.getField("c_obs")).cast("double")
              / st.getField("n_risk").cast("double")).cast("long")
          struct(s2.as("s"),
            concat(acc.getField("rows"), array(struct(
              st.getField("d").as("t"), st.getField("n_risk").as("n"),
              st.getField("c_obs").as("d"), s2.as("s")))).as("rows"))
        },
        acc => acc.getField("rows"))).as("r"))
      .select(col("r.t").as("t_days"), col("r.n").as("n_risk"),
        col("r.d").as("d_events"), col("r.s").as("s_ppm"))
      .orderBy("t_days")
  }

  /** Restricted mean survival time (Royston & Parmar 2013; the
    * area-under-KM readout) — the SINGLE-NUMBER survival summary the
    * curve family needs: "how many days does the average user survive
    * event-free, up to the last observed event time τ". Robust where
    * the median is undefined (S never crosses ½) and the mean is
    * uncomputable (censoring).
    *
    * Exactness: RMST(τ) = Σ_i S(t_{i−1})·(t_i − t_{i−1}) over the KM
    * step times (t_0 = 0, S(t_0) = 1) — a lag window over the
    * ALREADY-quantized s_ppm steps, so the only arithmetic is integer
    * products of ppm × day widths (no new quantization at all; the
    * result is exact GIVEN the KM ppm grid both engines share).
    * Scale shape: inherits [[kaplanMeier]]'s (everything after the
    * per-user combine agg lives on the ≤|calendar| step table).
    */
  def rmst(events: DataFrame, userCol: String, tsCol: String,
      eventCond: Column): DataFrame = {
    val km = kaplanMeier(events, userCol, tsCol, eventCond)
    val w = Window.orderBy("t_days")
    km
      .withColumn("s_prev", coalesce(lag("s_ppm", 1).over(w),
        lit(1000000L)))
      .withColumn("t_prev", coalesce(lag("t_days", 1).over(w), lit(0L)))
      .agg(max("t_days").as("tau_days"),
        sum(col("s_prev") * (col("t_days") - col("t_prev")))
          .cast("long").as("rmst_ppm_days"),
        min(col("s_ppm")).as("s_final_ppm"))
  }

  /** Shared survival step table (event times with risk sets):
    * per-user (duration, observed) from first-seen to event-or-last,
    * duration histogram, at-risk counts from the cumulative window
    * over the ≤|calendar|-row histogram — rows only at event times. */
  private def survivalSteps(events: DataFrame, userCol: String,
      tsCol: String, eventCond: Column): DataFrame = {
    val per = events.filter(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("f"),
        max(to_date(col(tsCol))).as("l"),
        min(when(eventCond, to_date(col(tsCol)))).as("pt"))
      .select(
        when(col("pt").isNotNull, datediff(col("pt"), col("f")))
          .otherwise(datediff(col("l"), col("f"))).cast("long").as("d"),
        when(col("pt").isNotNull, 1L).otherwise(0L).as("obs"))
    val hist = per.groupBy("d")
      .agg(count(lit(1)).as("c_all"), sum("obs").as("c_obs"))
    val nTot = per.agg(count(lit(1)).cast("long").as("n_tot"))
    // cumulative risk over the <=31-row duration histogram only
    val before = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cum_before", coalesce(sum("c_all").over(before), lit(0L)))
      .crossJoin(broadcast(nTot))
      .filter(col("c_obs") > 0)
      .select(col("d"), (col("n_tot") - col("cum_before")).as("n_risk"),
        col("c_obs"))
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972; Aalen 1978) — the
    * ADDITIVE survival readout next to [[kaplanMeier]]'s product one:
    * H(t) = Σ_{t_i ≤ t} d_i/n_i needs NO sequential fold (each step is
    * independent), so unlike KM it is a plain cumulative window — the
    * estimator a distributed engine should prefer when only the hazard
    * scale is needed (S̃ = e^{−H} is the caller's presentation choice;
    * exp is not correctly rounded cross-engine so it never enters the
    * frame). Per-step quantization: h = ⌊d·10⁶/n⌋ and the Poisson-type
    * variance term v = ⌊d·10⁶/n²⌋, each floored ONCE then summed —
    * error bounded by |event times|·10⁻⁶, identical in both engines.
    * Same scale shape as KM: everything after the per-user combine agg
    * lives on the duration histogram.
    */
  def nelsonAalen(events: DataFrame, userCol: String, tsCol: String,
      eventCond: Column): DataFrame = {
    val steps = survivalSteps(events, userCol, tsCol, eventCond)
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    steps
      .withColumn("h_step", expr("(c_obs * 1000000) div n_risk"))
      .withColumn("v_step",
        expr("(c_obs * 1000000) div (n_risk * n_risk)"))
      .withColumn("h_cum_micro", sum("h_step").over(w))
      .withColumn("var_cum_micro", sum("v_step").over(w))
      .select(col("d").as("t_days"), col("n_risk"),
        col("c_obs").as("d_events"), col("h_cum_micro"),
        col("var_cum_micro"))
      .orderBy("t_days")
  }

  /** Two-sample log-rank test (Mantel 1966) — the significance test
    * over [[kaplanMeier]] curves, as [[abWelch]] is to means: at each
    * observed event time the observed-vs-expected split of events
    * between arms is a hypergeometric draw; the statistic
    * (ΣO₁ − ΣE₁)²/ΣV is χ²₁ under "no difference". Arms are the
    * [[abWelch]] `user_id % 2` assignment, the event is the caller's
    * condition, censoring as in [[kaplanMeier]].
    *
    * Quantized-log-rank determinism: E₁(t) = d·n₁/n and the
    * hypergeometric V(t) = d·n₁·n₂·(n−d)/(n²·(n−1)) are floored to
    * micro PER EVENT TIME (decimal numerators — n⁴ overflows int64 at
    * scale), then summed exactly; the χ² is one integer division at
    * the end. Total quantization error ≤ |event times|·1e-6 — noted,
    * bounded, and identical in both engines.
    *
    * Scale: everything after the per-user combine-agg runs over the
    * per-variant duration histograms — calendar-bounded metadata, the
    * [[kaplanMeier]] shape.
    */
  def survivalLogRank(events: DataFrame, userCol: String, tsCol: String,
      eventCond: Column): DataFrame = {
    val per = events.filter(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("f"),
        max(to_date(col(tsCol))).as("l"),
        min(when(eventCond, to_date(col(tsCol)))).as("pt"))
      .select((col(userCol) % 2).as("v"),
        when(col("pt").isNotNull, datediff(col("pt"), col("f")))
          .otherwise(datediff(col("l"), col("f"))).cast("long").as("d"),
        when(col("pt").isNotNull, 1L).otherwise(0L).as("obs"))
    val hist = per.groupBy("d").agg(
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("a0"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("a1"),
      sum(when(col("v") === 0, col("obs")).otherwise(0L)).as("o0"),
      sum(when(col("v") === 1, col("obs")).otherwise(0L)).as("o1"))
    val nTot = per.agg(
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("nt0"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("nt1"))
    val before = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, -1)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val steps = hist
      .withColumn("cb0", coalesce(sum("a0").over(before), lit(0L)))
      .withColumn("cb1", coalesce(sum("a1").over(before), lit(0L)))
      .crossJoin(broadcast(nTot))
      .filter(col("o0") + col("o1") > 0)
      .select(col("d"),
        dec(col("nt0") - col("cb0")).as("n1"),
        dec(col("nt1") - col("cb1")).as("n2"),
        col("o0"), col("o1"))
      .select(col("d"), col("n1"), col("n2"), col("o0"), col("o1"),
        (col("n1") + col("n2")).as("n"), dec(col("o0") + col("o1")).as("dd"))
    val quant = steps.select(col("o0"),
      expr("CAST((dd * n1 * 1000000) DIV n AS DECIMAL(38,0))").as("e1_mu"),
      when(col("n") > 1,
        expr("CAST((dd * n1 * n2 * (n - dd) * 1000000)" +
          " DIV (n * n * (n - 1)) AS DECIMAL(38,0))"))
        .otherwise(lit(0).cast("decimal(38,0)")).as("v_mu"))
    // the audited arm is variant 0; O/E/V carry its totals
    quant.agg(count(lit(1)).as("n_times"),
        sum("o0").cast("long").as("o_obs"),
        sum("e1_mu").as("_e"), sum("v_mu").as("_v"))
      .select(col("n_times"), col("o_obs"),
        col("_e").cast("long").as("e_mu"),
        col("_v").cast("long").as("v_mu"),
        expr("CAST(((CAST(o_obs AS DECIMAL(38,0)) * 1000000 - _e)" +
          " * (CAST(o_obs AS DECIMAL(38,0)) * 1000000 - _e))" +
          " DIV _v AS BIGINT)").as("chi2_mu"))
  }

  /** Delete-one-bucket jackknife for a RATIO metric (Quenouille/Tukey;
    * the grouped form is how large platforms compute ratio-metric
    * variance — per-event SEs are wrong because the user, not the
    * event, is the randomization unit). Metric: Σclicks/Σviews per
    * arm. Users hash into `buckets` groups; leaving each group out
    * gives pseudo-ratios R₍b₎ = (X−X_b)/(Y−Y_b); SE² =
    * (B−1)/B · Σ(R₍b₎ − R̄)². The arm difference ships with its
    * jackknifed z.
    *
    * Determinism: pseudo-ratios floored to micro (decimal numerators),
    * R̄ floored once, SE² an exact integer `div`, the two square roots
    * IEEE doubles at the very end. B counts NON-EMPTY buckets per arm.
    * Scale: one combine-agg events → (arm, bucket) cells; all
    * jackknife arithmetic on the ≤2·`buckets`-row metadata.
    */
  def ratioJackknife(events: DataFrame, userCol: String, typeCol: String,
      numType: String, denType: String, buckets: Int): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = events.filter(col(userCol).isNotNull)
      .select((col(userCol) % 2).as("arm"),
        expr(s"CAST(conv(substring(md5(concat('rjk|', " +
          s"CAST($userCol AS STRING))), 1, 4), 16, 10) AS BIGINT)" +
          s" % $buckets").as("bkt"),
        when(col(typeCol) === numType, 1L).otherwise(0L).as("x"),
        when(col(typeCol) === denType, 1L).otherwise(0L).as("y"))
      .groupBy("arm", "bkt")
      .agg(sum("x").as("xb"), sum("y").as("yb"))
    val tot = cells.groupBy("arm")
      .agg(sum("xb").as("xt"), sum("yb").as("yt"),
        count(lit(1)).as("nb"))
    val pseudo = cells.join(tot, "arm")
      .select(col("arm"), col("nb"), col("xt"), col("yt"),
        expr("CAST((CAST(xt - xb AS DECIMAL(38,0)) * 1000000)" +
          " DIV (yt - yb) AS DECIMAL(38,0))").as("rb"))
    val perArm = pseudo
      .withColumn("rbar",
        expr("CAST(sum(rb) OVER (PARTITION BY arm) DIV nb AS DECIMAL(38,0))"))
      .groupBy("arm")
      .agg(first("nb").as("nb"), first("xt").as("xt"), first("yt").as("yt"),
        expr("CAST((CAST(sum((rb - rbar) * (rb - rbar)) AS DECIMAL(38,0))" +
          " * (first(nb) - 1)) DIV first(nb) AS DECIMAL(38,0))")
          .as("se2_mu2"))
      .select(col("arm"), col("nb").cast("long").as("n_buckets"),
        expr("CAST((CAST(xt AS DECIMAL(38,0)) * 1000000) DIV yt AS BIGINT)")
          .as("r_mu"),
        col("se2_mu2").cast("decimal(38,0)").as("se2"))
    val a0 = perArm.filter(col("arm") === 0)
      .select(col("n_buckets").as("n_buckets_0"), col("r_mu").as("r0_mu"),
        col("se2").as("se2_0"))
    val a1 = perArm.filter(col("arm") === 1)
      .select(col("n_buckets").as("n_buckets_1"), col("r_mu").as("r1_mu"),
        col("se2").as("se2_1"))
    a0.crossJoin(a1).select(
      col("n_buckets_0"), col("n_buckets_1"), col("r0_mu"), col("r1_mu"),
      col("se2_0").cast("long").as("se2_0"),
      col("se2_1").cast("long").as("se2_1"),
      TextOps.round6((col("r1_mu") - col("r0_mu")).cast("double")
        / sqrt(col("se2_0").cast("double") + col("se2_1").cast("double")))
        .as("z"))
  }

  /** Classical additive seasonal decomposition of the daily
    * event-count series (the moving-average half of STL): trend = the
    * 7-day centered moving average (defined only where the full
    * window exists), seasonal = the day-of-week mean of the detrended
    * series, residual = y − trend − seasonal. The readout that
    * separates "weekends are slow" from "something changed" before a
    * CUSUM/Holt alarm is believed.
    *
    * All integer micro-units: trend_mu = (Σ window · 10⁶) div 7,
    * seasonal_mu a per-dow integer mean of detrended values, residual
    * a subtraction. Windows run over the calendar-bounded daily table
    * only (the Holt/Theil–Sen precedent).
    */
  def seasonalDecompose(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val byDay = Window.orderBy("day").rowsBetween(-3, 3)
    val withTrend = daily
      .withColumn("_wn", count(lit(1)).over(byDay))
      .withColumn("trend_mu",
        when(col("_wn") === 7,
          expr("(sum(y * 1000000) OVER (ORDER BY day " +
            "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) DIV 7")))
      .withColumn("_det", col("y") * 1000000L - col("trend_mu"))
    val seasonal = withTrend.filter(col("trend_mu").isNotNull)
      .groupBy("dow")
      .agg(expr("CAST(sum(_det) DIV count(*) AS BIGINT)").as("seasonal_mu"))
    withTrend.join(broadcast(seasonal), "dow")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dow"), col("y"), col("trend_mu"), col("seasonal_mu"),
        (col("y") * 1000000L - col("trend_mu") - col("seasonal_mu"))
          .as("resid_mu"))
      .orderBy("day")
  }

  /** Difference-in-differences (Card & Krueger 1994 popularized) over
    * the user panel: the pre/post change in the treated arm minus the
    * pre/post change in control — the estimator for ROLLOUTS where
    * assignment is not randomized (a simple post-period diff would
    * absorb any pre-existing gap between the groups; DiD nets it
    * out under the parallel-trends assumption). Arms are `user % 2`
    * "treated"/control, periods split at `splitDate` (the CUPED
    * setup re-used).
    *
    * Per (user, period) metric = micro value sum (integer); cell
    * means and the 2×2 interaction in exact decimal moments; the
    * independent-samples SE √(Σ s²_cell/n_cell) uses one IEEE sqrt.
    * One combine-agg to the user panel, one 4-row reduce — the
    * [[abCuped]] scale shape.
    */
  def abDiffInDiff(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, splitDate: String): DataFrame = {
    val split = lit(splitDate).cast("timestamp")
    val micro = floor(col(valueCol) * 1000000 + 0.5).cast("long")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val panel = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select(col(userCol).as("u"), (col(userCol) % 2).as("treated"),
        when(col(tsCol) >= split, 1).otherwise(0).as("post"),
        micro.as("v"))
      .groupBy("u", "treated", "post")
      .agg(sum("v").as("y"))
    val cells = panel.groupBy("treated", "post")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(dec(col("y"))).as("s"),
        sum(dec(col("y")) * dec(col("y"))).as("ss"))
      .select(col("treated"), col("post"), col("n"),
        (col("s").cast("double") / col("n").cast("double") / 1e6)
          .as("mean"),
        ((col("n") * col("ss") - col("s") * col("s")).cast("double")
          / (col("n") * (col("n") - lit(1))).cast("double") / 1e12
          / col("n").cast("double")).as("semean2"))
    def cell(t: Int, p: Int, nm: String) =
      cells.filter(col("treated") === t && col("post") === p)
        .select(col("n").cast("long").as(s"n_$nm"),
          col("mean").as(s"m_$nm"), col("semean2").as(s"v_$nm"))
    val w = cell(1, 0, "t_pre").crossJoin(cell(1, 1, "t_post"))
      .crossJoin(cell(0, 0, "c_pre")).crossJoin(cell(0, 1, "c_post"))
    w.select(
      col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
      TextOps.round6(col("m_t_pre")).as("mean_t_pre"),
      TextOps.round6(col("m_t_post")).as("mean_t_post"),
      TextOps.round6(col("m_c_pre")).as("mean_c_pre"),
      TextOps.round6(col("m_c_post")).as("mean_c_post"),
      TextOps.round6((col("m_t_post") - col("m_t_pre"))
        - (col("m_c_post") - col("m_c_pre"))).as("did"),
      TextOps.round6(sqrt(col("v_t_pre") + col("v_t_post")
        + col("v_c_pre") + col("v_c_post"))).as("se"),
      TextOps.round6(((col("m_t_post") - col("m_t_pre"))
        - (col("m_c_post") - col("m_c_pre")))
        / sqrt(col("v_t_pre") + col("v_t_post")
          + col("v_c_pre") + col("v_c_post"))).as("t_stat"))
  }

  /** Mann–Whitney U test (Mann & Whitney 1947) between the two
    * [[abWelch]] arms — the nonparametric companion: rank-based, so a
    * heavy-tailed metric (the usual shape of latency/revenue values)
    * can't hand the test to its outliers the way the t-test's means
    * can.
    *
    * No corpus sort: ranks come from the VALUE HISTOGRAM — midrank(v)
    * = (#values < v) + (tied(v)+1)/2 — so the only window runs over
    * the distinct-cents table, whose size is bounded by the metric's
    * value DOMAIN, not the row count (the X218 histogram argument).
    * Everything stays integer by carrying DOUBLED ranks: r1_x2 =
    * Σ n₁(v)·(2·below(v)+n(v)+1) is the exact twice-rank-sum,
    * u1_x2 = r1_x2 − n₁(n₁+1) the exact twice-U. The normal
    * approximation's tie-corrected variance uses exact decimal
    * moments (Σ(t³−t) overflows int64 at scale) with one IEEE sqrt at
    * the end; z ships in micro.
    */
  def mannWhitney(events: DataFrame, userCol: String, valueCol: String)
      : DataFrame = {
    val hist = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select((col(userCol) % 2).as("v"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("c"))
      .groupBy("c").agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"))
    val byC = Window.orderBy("c")
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val ranked = hist
      .withColumn("t", col("n0") + col("n1"))
      .withColumn("below",
        coalesce(sum(col("n0") + col("n1"))
          .over(byC.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val m = ranked.agg(
      sum("n0").cast("long").as("na"), sum("n1").cast("long").as("nb"),
      sum(dec(col("n1")) * dec(lit(2L) * col("below") + col("t") + 1L))
        .as("r1_x2"),
      sum(dec(col("t")) * dec(col("t")) * dec(col("t")) - dec(col("t")))
        .as("ties"))
    m.select(col("na"), col("nb"),
        (col("r1_x2") - dec(col("nb")) * dec(col("nb") + 1L)).as("u1_x2"),
        col("ties"))
      .select(col("na"), col("nb"),
        col("u1_x2").cast("long").as("u1_x2"),
        col("ties").cast("long").as("tie_sum"),
        // z = (U1 − n·m/2) / sqrt(var); doubled form keeps the
        // numerator exact: (u1_x2 − na·nb) / (2·sqrt(var))
        TextOps.round6(
          (col("u1_x2").cast("double") -
            col("na").cast("double") * col("nb").cast("double"))
            / (lit(2.0) * sqrt(
              col("na").cast("double") * col("nb").cast("double") / 12.0
                * ((col("na") + col("nb") + 1).cast("double")
                  - col("ties").cast("double")
                    / ((col("na") + col("nb")).cast("double")
                      * (col("na") + col("nb") - 1).cast("double"))))))
          .as("z"))
  }

  /** Theil–Sen robust trend (Theil 1950 / Sen 1968) over the daily
    * event-count series — the estimator an ops readout wants next to
    * the OLS slope when a few outlier days (an incident, a backfill)
    * would drag least squares: the slope is the MEDIAN of all pairwise
    * day slopes (29.3% breakdown point), the intercept the median
    * residual at that slope. The OLS slope ships in the same row so
    * the robust-vs-classical gap is the readout.
    *
    * Determinism: slopes are integer ppm (`(Δy·10⁶) div Δx` — both
    * engines truncate toward zero), medians are the LOWER median by
    * rank selection (no averaging, and rank ties don't matter — the
    * selected VALUE is order-independent), OLS moments are exact
    * int64 with the established floor(double)·ppm rounding.
    *
    * Scale: ONE corpus pass to the daily table; the O(days²) pair
    * join, rank windows, and medians all run over calendar-bounded
    * metadata (the Holt/water-fill precedent — the pair join is a
    * nested loop over ≤|days|² metadata rows by design, never the
    * corpus).
    */
  def theilSenDailyTrend(events: DataFrame, tsCol: String): DataFrame = {
    val counts = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("y"))
    val fmin = counts.agg(min("day").as("d0"))
    val daily = counts.crossJoin(broadcast(fmin))
      .select(datediff(col("day"), col("d0")).cast("long").as("x"),
        col("y"))
      .localCheckpoint(eager = true)
    val slopes = daily.select(col("x").as("x1"), col("y").as("y1"))
      .join(daily.select(col("x").as("x2"), col("y").as("y2")),
        col("x1") < col("x2"))
      .select(expr("((y2 - y1) * 1000000) DIV (x2 - x1)").as("s"))
    val slope = slopes
      .withColumn("rn", row_number().over(Window.orderBy("s")))
      .crossJoin(broadcast(slopes.agg(count(lit(1)).as("n_pairs"))))
      .filter(col("rn") === expr("(n_pairs + 1) DIV 2"))
      .select(col("s").as("slope_ppm"), col("n_pairs"))
    val inter = daily.crossJoin(broadcast(slope))
      .select((col("y") * 1000000L - col("slope_ppm") * col("x")).as("r"),
        col("slope_ppm"), col("n_pairs"))
      .withColumn("rn", row_number().over(Window.orderBy("r")))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
      .filter(col("rn") === expr("(n_days + 1) DIV 2"))
      .select(col("n_days"), col("n_pairs"), col("slope_ppm"),
        col("r").as("intercept_ppm"))
    val ols = daily.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(floor((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
          * 1000000.0 + 0.5).cast("long").as("ols_slope_ppm"))
    // `daily` stays checkpointed (a ~|days|-row block): the result is
    // lazy, so freeing here would strip blocks consumers still need
    inter.crossJoin(broadcast(ols))
  }

  /** Holt linear-trend (double exponential) smoothing over the daily
    * event-count series, with an h-step-ahead forecast — the capacity /
    * ingest-volume forecast an ops team reads next to the CUSUM (X171)
    * and trailing-rate (X146) alarms: those detect level shifts, this
    * EXTRAPOLATES level + trend.
    *
    * Fixed smoothing weights α=3/10, β=1/10 in exact integer micro-units
    * (the recurrence is `div`-only, truncation toward zero in both
    * engines):
    *   l_t = (3·y_t·10⁶ + 7·(l+b)) div 10,
    *   b_t = ((l_t − l) + 9·b) div 10,  init l₁=y₁·10⁶, b₁=(y₂−y₁)·10⁶.
    * One-step forecast f_t = l+b pre-update; err_t = y_t·10⁶ − f_t is
    * the in-sample residual an α/β retune would minimize.
    *
    * Scale shape: the ONLY corpus-scale work is the daily combine-agg
    * (100 TB of events reduce map-side to |days| rows). The recurrence
    * is inherently sequential in t and runs on the CALENDAR-sized series
    * driver-side — |days| rows, corpus-independent, the same "model
    * table on the driver" budget a centroid collect has. Output dates
    * cross the engine boundary as `yyyy-MM-dd` strings.
    */
  def holtLinear(events: DataFrame, tsCol: String, horizon: Int = 7)
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events.select(to_date(col(tsCol)).as("d"))
      .groupBy("d").agg(count(lit(1)).as("y"))
      .orderBy("d")
      .select(col("d").cast("string"), col("y"))
      .as[(String, Long)].collect()
    require(daily.length >= 2, s"need >=2 days, got ${daily.length}")
    val M = 1000000L
    val out = Seq.newBuilder[(String, Option[Long], Option[Long],
      Option[Long], Option[Long], Option[Long])]
    var l = daily(0)._2 * M
    var b = (daily(1)._2 - daily(0)._2) * M
    out += ((daily(0)._1, Some(daily(0)._2), Some(l), Some(b), None, None))
    (1 until daily.length).foreach { t =>
      val (ds, y) = daily(t)
      val f = l + b
      val lNew = (3L * y * M + 7L * (l + b)) / 10L
      val bNew = ((lNew - l) + 9L * b) / 10L
      out += ((ds, Some(y), Some(lNew), Some(bNew), Some(f), Some(y * M - f)))
      l = lNew; b = bNew
    }
    val lastDay = java.time.LocalDate.parse(daily.last._1)
    (1 to horizon).foreach { h =>
      out += ((lastDay.plusDays(h.toLong).toString, None, None, None,
        Some(l + h.toLong * b), None))
    }
    out.result().toDF("ds", "y", "level_micro", "trend_micro",
      "forecast_micro", "err_micro").orderBy("ds")
  }

  /** Markov-chain removal-effect attribution (Anderl et al. 2014) — the
    * data-driven alternative to [[attributionUShape]]'s fixed 40/20/40
    * heuristic: model user journeys as a first-order Markov chain over
    * channels with absorbing `conv`/`null` states, and credit each
    * channel by how much the chain's start→conv probability DROPS when
    * that channel is removed (its transitions redirected to `null`).
    * A channel that only echoes traffic other channels already convert
    * gets near-zero credit here but full positional credit in a
    * heuristic model — that gap is the method's point.
    *
    * Journey encoding: per user ordered by (ts, id) — a total order,
    * the markovTransitions discipline — episodes SPLIT after each
    * conversion (each purchase ends its journey; the next event starts
    * a fresh one at `^start`), and an episode that ends without
    * converting closes with a `state → null` tail transition.
    *
    * Scale shape: the ONLY corpus-scale work is the two user-keyed
    * windows + one partial-combining count down to the ≤(|types|+2)²
    * transition-count table. That model-sized table (tens of rows —
    * the hashModelWeights/holtLinear collect precedent) comes to the
    * driver, where base + per-channel-removal value iterations run in
    * EXACT Long arithmetic: `rounds` sweeps of
    * `p(s) = (Σ_t ppm(s→t)·v(t)) div 10⁶` with v(conv)=10⁶, v(null)=0
    * and ppm(s→t) = n(s→t)·10⁶ div n(s·) — every op integer, so the
    * oracle replays each sweep bit-identically as unrolled CTEs.
    * Removal keeps ORIGINAL row denominators (redirect-to-null, the
    * paper's convention), i.e. rows touching the removed state drop
    * while every surviving ppm is unchanged.
    *
    * Output: one row per channel (p_conv_micro = start→conv with the
    * channel removed, removal_effect_ppm = (base−p)·10⁶ div base,
    * attribution_share = removal effect normalized over channels) plus
    * a `__BASE__` row carrying the intact chain's conversion
    * probability with null effect/share.
    */
  def markovRemovalAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, convType: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val M = 1000000L
    val tagged = events.select(col(userCol).as("_u"), col(tsCol).as("_ts"),
      col(idCol).as("_id"),
      when(col(typeCol) === convType, lit("conv")).otherwise(col(typeCol))
        .as("_st"))
    val byU = Window.partitionBy("_u").orderBy(col("_ts"), col("_id"))
    val byEpi = Window.partitionBy("_u", "_epi").orderBy(col("_ts"), col("_id"))
    val seq = tagged
      .withColumn("_epi", coalesce(
        sum(when(col("_st") === "conv", 1).otherwise(0))
          .over(byU.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .withColumn("_prev", coalesce(lag(col("_st"), 1).over(byEpi),
        lit("^start")))
      .withColumn("_isLast", lead(col("_st"), 1).over(byEpi).isNull)
    val counts = seq.select(col("_prev").as("prev"), col("_st").as("next"))
      .unionByName(seq.filter(col("_isLast") && col("_st") =!= "conv")
        .select(col("_st").as("prev"), lit("null").as("next")))
      .groupBy("prev", "next").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()

    val tot = counts.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    val ppm = counts.map { case (s, t, n) => (s, t) -> n * M / tot(s) }.toMap
    val bySrc = counts.map { case (s, t, _) => (s, t) }.groupBy(_._1)
    val transients = tot.keys.toSeq.sorted
    val channels = transients.filter(_ != "^start")

    // `rounds` exact-integer sweeps of the absorbing-chain value
    // iteration; rows touching `removed` drop, denominators stay
    def solve(removed: Option[String]): Long = {
      var p = transients.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        p = transients.map { s =>
          s -> (if (removed.contains(s)) 0L
          else bySrc(s).collect {
            case (_, t) if !removed.contains(t) =>
              ppm((s, t)) * (t match {
                case "conv" => M
                case "null" => 0L
                case other  => p(other)
              })
          }.sum / M)
        }.toMap
      }
      p("^start")
    }

    val base = solve(None)
    val removedP = channels.map(c => c -> solve(Some(c)))
    val reSum = removedP.map { case (_, pc) => (base - pc) * M / base }.sum
    val rows = removedP.map { case (c, pc) =>
      val re = (base - pc) * M / base
      (c, pc, Some(re),
        Some(math.floor(re.toDouble / reSum * 1000000.0 + 0.5) / 1000000.0))
    } :+ (("__BASE__", base, None: Option[Long], None: Option[Double]))
    rows.toDF("channel", "p_conv_micro", "removal_effect_ppm",
      "attribution_share").orderBy("channel")
  }

  /** One-pass permutation-test panel with Benjamini–Hochberg FDR
    * control (Fisher/Pitman randomization; BH 1995) — the
    * multiple-testing closure of the A/B family: abWelch tests ONE
    * metric against a t reference; a real experiment readout tests
    * every metric and must correct for running m tests at once, and
    * the t/normal CDF that p-values usually need is a transcendental
    * that is NOT bit-stable cross-engine. Permutation p-values fix
    * both at once: p = (1 + #{b : T_b ≥ T_obs}) / (B+1) is an exact
    * small-integer rational, and BH's step-up condition
    * p_(k) ≤ k·q/m becomes the pure-integer test
    * p_num·q_den·m ≤ k·(B+1) — no CDF anywhere, every comparison
    * replayable bit-for-bit.
    *
    * One corpus pass (the Chamandy one-pass-resampling discipline the
    * Poisson bootstrap established): each row fans out to the observed
    * assignment (b = 0, `user div 2` parity — the abWelch arm) plus B
    * md5-derived pseudo-assignments, and a single partial-combining
    * aggregation reduces 100 TB of events to the (metric × (B+1))
    * cell table every statistic reads. The statistic is the exact
    * integer cross-product form T = |n_B·S_A − n_A·S_B|
    * (= n_A·n_B·|mean gap|, division-free), carried in decimal(38,0)
    * so corpus size cannot overflow it. The permutation unit is the
    * USER (the ratioJackknife argument: users, not events, are
    * randomized), so all of a user's rows flip together.
    *
    * Output, one row per metric: t_obs, p_num (of B+1), p, BH rank,
    * and the step-up verdict at q = qNum/qDen.
    */
  def permutationFdr(events: DataFrame, userCol: String, typeCol: String,
      valueCol: String, perms: Int, qNum: Int = 1, qDen: Int = 10)
      : DataFrame = {
    require(perms >= 1, s"perms ($perms) must be >= 1")
    val ev = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select(col(typeCol).as("m"), col(userCol).as("u"),
        floor(col(valueCol) * 1000000 + 0.5).cast("decimal(38,0)").as("v"))
    // b = 0 is the observed assignment; b ≥ 1 re-labels each USER by
    // md5 parity — all of a user's rows flip together
    val fanned = ev.select(col("m"), col("u"), col("v"),
        explode(sequence(lit(0), lit(perms))).as("b"))
      .withColumn("arm",
        when(col("b") === 0, pmod(col("u"), lit(2)).cast("int"))
          .otherwise(conv(substring(md5(concat(lit("perm"), col("b"),
            lit("|"), col("u").cast("string"))), 1, 4), 16, 10)
            .cast("int") % 2))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = fanned.groupBy("m", "b").agg(
      dec(sum(when(col("arm") === 0, 1L).otherwise(0L))).as("na"),
      dec(sum(when(col("arm") === 1, 1L).otherwise(0L))).as("nb"),
      sum(when(col("arm") === 0, col("v")).otherwise(lit(0))).as("sa"),
      sum(when(col("arm") === 1, col("v")).otherwise(lit(0))).as("sb"))
      .withColumn("t", abs(col("nb") * col("sa") - col("na") * col("sb")))
      .select("m", "b", "t")
    val obs = cells.filter(col("b") === 0)
      .select(col("m"), col("t").as("t_obs"))
    val pnums = cells.filter(col("b") >= 1)
      .join(obs, "m")
      .groupBy("m", "t_obs")
      .agg((lit(1L) + sum(when(col("t") >= col("t_obs"), 1L)
        .otherwise(0L))).as("p_num"))
    // BH step-up on the |metrics|-row panel: rank by (p_num, m) — a
    // total order — then reject ranks ≤ max{k : p_num·q_den·mTot ≤
    // k·(B+1)·q_num}; all comparisons integer
    val byP = Window.orderBy(col("p_num"), col("m"))
    val all = Window.partitionBy()
    pnums
      .withColumn("bh_rank", row_number().over(byP))
      .withColumn("_mtot", count(lit(1)).over(all))
      .withColumn("_ok", col("p_num") * qDen * col("_mtot")
        <= col("bh_rank") * (perms + 1) * qNum)
      .withColumn("_kstar", max(when(col("_ok"), col("bh_rank"))
        .otherwise(lit(0))).over(all))
      // decimal carries the cross-product exactly at any corpus size;
      // the REPORTED statistic narrows to bigint (ANSI: loud on
      // overflow, which at 10¹⁸·micro scale means re-quantizing, not
      // silently wrapping)
      .select(col("m").as("metric"),
        col("t_obs").cast("long").as("t_obs"),
        col("p_num"),
        TextOps.round6(col("p_num") / lit((perms + 1).toDouble)).as("p"),
        col("bh_rank"), (col("bh_rank") <= col("_kstar")).as("reject"))
      .orderBy("metric")
  }

  /** Distribution-free order-statistic confidence interval for the
    * median (the classical binomial/sign-test CI; Conover's spelling)
    * — the robust companion to powerAnalysis' mean machinery: valid
    * for ANY distribution (the heavy tails llm_tail_index warns
    * about included), because it only uses ranks: the 95% CI is the
    * pair of order statistics at ranks (n ∓ z√n)/2.
    *
    * Determinism without a CDF: z = 1.96 constant-folds, and
    * `1.96·sqrt(n)` is one IEEE sqrt of an exact integer — identical
    * in both engines — floored/ceiled ONCE into integer ranks
    * (clamped to [1, n]); the three order statistics (lo, median,
    * hi) come from the cents histogram by rank walk, never a corpus
    * sort (the X218 discipline).
    *
    * Output per metric: (metric, n_obs, lo_rank, hi_rank,
    * median_cents, lo_cents, hi_cents).
    */
  def medianCi(events: DataFrame, typeCol: String, valueCol: String)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val hist = events.filter(col(valueCol).isNotNull)
      .select(col(typeCol).as("m"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("cents"))
      .groupBy("m", "cents").agg(count(lit(1)).as("n"))
    val tot = hist.groupBy("m").agg(sum("n").as("nt"))
    val ranks = tot.select(col("m"), col("nt"),
        expr("(nt + 1) div 2").as("med_rank"),
        greatest(lit(1L), floor((col("nt").cast("double")
            - lit(1.96) * sqrt(col("nt").cast("double"))) / 2.0)
          .cast("long")).as("lo_rank"),
        least(col("nt"), (ceil((col("nt").cast("double")
            + lit(1.96) * sqrt(col("nt").cast("double"))) / 2.0)
          .cast("long") + 1)).as("hi_rank"))
    val byVal = w.partitionBy("m").orderBy("cents")
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val cum = hist.withColumn("_cum", sum("n").over(byVal))
    def at(rankCol: String, out: String): DataFrame =
      cum.join(ranks.select(col("m"), col(rankCol).as("_r")), "m")
        .filter(col("_cum") >= col("_r"))
        .groupBy("m").agg(min("cents").as(out))
    ranks
      .join(at("med_rank", "median_cents"), "m")
      .join(at("lo_rank", "lo_cents"), "m")
      .join(at("hi_rank", "hi_cents"), "m")
      .select(col("m").as("metric"), col("nt").as("n_obs"),
        col("lo_rank"), col("hi_rank"), col("median_cents"),
        col("lo_cents"), col("hi_cents"))
      .orderBy("metric")
  }

  /** Ljung–Box portmanteau test for autocorrelation (Ljung & Box
    * 1978) on the daily event series — the "are days independent"
    * check the whole daily-statistics family silently assumes:
    * Theil–Sen SEs, Holt residual bands, and the per-day A/B cells
    * all treat days as exchangeable; a large Q says they are not
    * (seasonality/trend remains) and day-level inference needs the
    * seasonal adjustment first.
    *
    * Exact integer discipline: daily counts centered by the
    * truncated mean (µ = S div n, exact), autocovariances as exact
    * int64 sums, r_k quantized ONCE to ppm by `div`, and
    * Q = n(n+2)·Σ_k (r_k²/(n−k)) assembled as
    * (n·(n+2)·Σ_k (r_ppm_k² div (n−k))) div 10⁶ — micro units,
    * engine-identical. The verdict constant-folds the χ²₇ 95th
    * percentile (14.067) the way powerAnalysis folds z: Q_micro >
    * 14067000 ⇒ reject whiteness. One corpus pass to the daily
    * table; lags and moments on calendar metadata.
    *
    * Output: one row per lag (lag, r_ppm) plus a summary row
    * (lag = −1) carrying q_micro and the verdict.
    */
  def ljungBox(events: DataFrame, tsCol: String, maxLag: Int,
      chi2Micro: Long = 14067000L): DataFrame = {
    require(maxLag >= 1, s"maxLag ($maxLag) must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events.select(to_date(col(tsCol)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val spine = daily
      .crossJoin(broadcast(daily.agg(min("day").as("_d0"))))
      .select(datediff(col("day"), col("_d0")).as("t"), col("y"))
      .localCheckpoint(eager = true)
    val base = spine.agg(count(lit(1)).as("n"), sum("y").as("s"))
      .select(col("n"), expr("s div n").as("mu"))
    val centered = spine.crossJoin(broadcast(base))
      .select(col("t"), (col("y") - col("mu")).as("x"), col("n"))
      .localCheckpoint(eager = true)
    val den = centered.agg(sum(col("x") * col("x")).as("d0"),
      max("n").as("n")).localCheckpoint(eager = true)
    val lags = spark.range(1, maxLag + 1).select(col("id").as("lag"))
    val rks = lags
      .join(centered.select(col("t"), col("x")), lit(true))
      .join(centered.select((col("t")).as("t2"), col("x").as("x2")),
        col("t2") === col("t") + col("lag"))
      .groupBy("lag").agg(sum(col("x") * col("x2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), expr("(num * 1000000) div d0").as("r_ppm"),
        col("n"))
    val q = rks
      .select(col("n"), expr("(r_ppm * r_ppm) div (n - lag)").as("_c"))
      .groupBy("n").agg(sum("_c").as("_sc"))
      .select(expr("(n * (n + 2) * _sc) div 1000000").as("q_micro"))
    rks.select(col("lag"), col("r_ppm"),
        lit(null).cast("long").as("q_micro"),
        lit(null).cast("boolean").as("reject_whiteness"))
      .unionByName(q.select(lit(-1L).as("lag"),
        lit(null).cast("long").as("r_ppm"), col("q_micro"),
        (col("q_micro") > chi2Micro).as("reject_whiteness")))
      .orderBy("lag")
  }

  /** O'Brien–Fleming group-sequential A/B monitoring (O'Brien &
    * Fleming 1979; Pocock's framing of repeated significance testing)
    * — the peeking-correct companion to the fixed-horizon tests: a
    * dashboard that re-reads llm_ab_welch daily inflates false
    * positives severalfold; group-sequential boundaries spend the α
    * across K scheduled looks, OBF's z·√(K/k) shape keeping early
    * looks conservative and the final look near the fixed-horizon
    * bar.
    *
    * The whole test is EXACT RATIONAL arithmetic — no CDF, no sqrt:
    * with pooled-variance z², the crossing z²_k ≥ c²·K/k clears to
    *   Num·(n−2)·c²den·k ≥ c²num·K·n·Brak
    * where Num = (S_B·n_A − S_A·n_B)², Brak = (n_A·Q_A − S_A²)·n_B +
    * (n_B·Q_B − S_B²)·n_A, n = n_A+n_B — integer cross-multiplication
    * in decimal(38,0) (cents-quantized values keep the worst term
    * under 10³⁴), so the stop/continue decision replays bit-for-bit.
    * The displayed z² and boundary are round6 doubles derived from
    * the same exact integers. c² defaults to 2.04² = 2601/625, the
    * classical K=5 OBF final-look constant.
    *
    * One corpus pass to (metric, day, arm) cells; the K cumulative
    * looks join those cells on day ≤ cutoff (metadata-sized).
    *
    * Output per (metric, look): n_total, z2, boundary_z2, cross, and
    * first_cross_look (null when no look crosses).
    */
  def obfSequential(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, valueCol: String, looks: Int, lookDays: Int,
      c2Num: Long = 2601L, c2Den: Long = 625L): DataFrame = {
    require(looks >= 1 && lookDays >= 1, s"bad looks=$looks/$lookDays")
    val spark = events.sparkSession
    import spark.implicits._
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select(col(typeCol).as("m"), to_date(col(tsCol)).as("day"),
        pmod(col(userCol), lit(2)).as("arm"),
        floor(col(valueCol) * 100 + 0.5).cast("decimal(38,0)").as("v"))
    val cells = base.groupBy("m", "day", "arm").agg(
      dec(count(lit(1))).as("n"), sum("v").as("s"),
      sum(col("v") * col("v")).as("q"))
    val d0 = base.agg(min("day").as("d0"))
    val lookTab = spark.range(1, looks + 1).select(col("id").as("look"))
      .crossJoin(broadcast(d0))
      .select(col("look"),
        expr(s"date_add(d0, cast(look * $lookDays - 1 as int))")
          .as("cutoff"))
    val agg = broadcast(lookTab).join(cells, col("day") <= col("cutoff"))
      .groupBy("m", "look")
      .agg(
        sum(when(col("arm") === 0, col("n")).otherwise(lit(0))).as("na"),
        sum(when(col("arm") === 1, col("n")).otherwise(lit(0))).as("nb"),
        sum(when(col("arm") === 0, col("s")).otherwise(lit(0))).as("sa"),
        sum(when(col("arm") === 1, col("s")).otherwise(lit(0))).as("sb"),
        sum(when(col("arm") === 0, col("q")).otherwise(lit(0))).as("qa"),
        sum(when(col("arm") === 1, col("q")).otherwise(lit(0))).as("qb"))
    val scored = agg
      .withColumn("num",
        (col("sb") * col("na") - col("sa") * col("nb"))
          * (col("sb") * col("na") - col("sa") * col("nb")))
      .withColumn("brak",
        (col("na") * col("qa") - col("sa") * col("sa")) * col("nb")
          + (col("nb") * col("qb") - col("sb") * col("sb")) * col("na"))
      .withColumn("cross",
        col("num") * (col("na") + col("nb") - 2) * c2Den * col("look")
          >= lit(c2Num) * looks * (col("na") + col("nb")) * col("brak"))
      .withColumn("z2", TextOps.round6(
        (col("num") * (col("na") + col("nb") - 2)).cast("double")
          / ((col("na") + col("nb")) * col("brak")).cast("double")))
      .withColumn("boundary_z2", TextOps.round6(
        lit(c2Num.toDouble * looks) / (col("look") * c2Den.toDouble)))
    val byM = org.apache.spark.sql.expressions.Window.partitionBy("m")
    scored
      .withColumn("first_cross_look",
        min(when(col("cross"), col("look"))).over(byM))
      .select(col("m").as("metric"), col("look"),
        (col("na") + col("nb")).cast("long").as("n_total"),
        col("z2"), col("boundary_z2"), col("cross"),
        col("first_cross_look"))
      .orderBy("metric", "look")
  }

  /** Population Stability Index drift monitor (the credit-scoring PSI,
    * industry-standard since the FICO era; PSI = Σ (p_c − p_r)·
    * ln(p_c/p_r) over reference-derived bins) — the score/metric
    * drift alarm that complements the text-side KL/JSD drift family
    * (X59/X181): those compare CORPORA, this compares the SAME metric
    * against its own past, binned the way a model-monitoring service
    * actually does it (deciles frozen from the REFERENCE period, so a
    * shift shows up as mass leaving its reference bins; PSI < 0.1
    * stable / 0.1–0.25 watch / > 0.25 act — in micro units here).
    *
    * Exactness: bin boundaries are exact reference-period order
    * statistics from the cents histogram (rank walk, the X218/X248
    * no-corpus-sort discipline — boundary j = the ⌈j·n_r/bins⌉-th
    * smallest); proportions are add-one smoothed exact integer ppm
    * (zero-count bins stay defined); the only transcendental is one
    * ln per (metric, bin) of a ratio of four exact integers — floored
    * to micro, then each bin's contribution is
    * ((p_c − p_r)·lnr) div 10⁶. Two corpus passes (reference
    * histogram, current histogram); everything else on
    * |metrics|×|bins| metadata.
    *
    * Output: per (metric, bin) rows (lo_cents = inclusive lower
    * boundary, −1 for the first), pr_ppm, pc_ppm, psi_micro, plus a
    * bin = −1 total row per metric.
    */
  def psiDrift(events: DataFrame, typeCol: String, tsCol: String,
      valueCol: String, splitDate: String, bins: Int): DataFrame = {
    require(bins >= 2, s"bins ($bins) must be >= 2")
    val w = org.apache.spark.sql.expressions.Window
    val ev = events.filter(col(valueCol).isNotNull)
      .select(col(typeCol).as("m"),
        (to_date(col(tsCol)) <= to_date(lit(splitDate))).as("ref"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("cents"))
    val refHist = ev.filter(col("ref")).groupBy("m", "cents")
      .agg(count(lit(1)).as("n"))
    val nRef = refHist.groupBy("m").agg(sum("n").as("nr"))
    val byVal = w.partitionBy("m").orderBy("cents")
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    // boundary j (1..bins−1) = the ⌈j·n_r/bins⌉-th smallest reference
    // value; bin of v = #{boundaries ≤ v}
    val cum = refHist.withColumn("_cum", sum("n").over(byVal))
      .join(nRef, "m")
    val bounds = cum.crossJoin(
        events.sparkSession.range(1, bins).select(col("id").as("j")))
      .filter(col("_cum") >= expr("(j * nr + cast(" + bins + " as bigint) " +
        "- 1) div " + bins))
      .groupBy("m", "j").agg(min("cents").as("b"))
      .localCheckpoint(eager = true)
    // assign each (m, cents) histogram cell (both periods) to a bin
    val hist = ev.groupBy("m", "ref", "cents").agg(count(lit(1)).as("n"))
    val binned = hist.join(bounds, Seq("m"), "left")
      .groupBy("m", "ref", "cents", "n")
      .agg(sum(when(col("b") <= col("cents"), 1L).otherwise(0L)).as("bin"))
      .groupBy("m", "bin", "ref").agg(sum("n").as("cnt"))
    val totals = binned.groupBy("m", "ref").agg(sum("cnt").as("tot"))
    val spine = nRef.select("m").crossJoin(
        events.sparkSession.range(bins).select(col("id").as("bin")))
      .join(totals.filter(col("ref")).select(col("m"), col("tot").as("ntr")),
        "m")
      .join(totals.filter(!col("ref")).select(col("m"), col("tot").as("ntc")),
        "m")
    val cells = spine
      .join(binned.filter(col("ref")).select(col("m"), col("bin"),
        col("cnt").as("cr")), Seq("m", "bin"), "left")
      .join(binned.filter(!col("ref")).select(col("m"), col("bin"),
        col("cnt").as("cc")), Seq("m", "bin"), "left")
      .select(col("m"), col("bin"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cc"), lit(0L)).as("cc"),
        col("ntr"), col("ntc"))
      .withColumn("pr_ppm",
        expr(s"((cr + 1) * 1000000) div (ntr + $bins)"))
      .withColumn("pc_ppm",
        expr(s"((cc + 1) * 1000000) div (ntc + $bins)"))
      .withColumn("_lnr",
        floor(log(((col("cc") + 1) * (col("ntr") + bins)).cast("double")
            / ((col("cr") + 1) * (col("ntc") + bins)).cast("double"))
          * 1000000.0 + 0.5).cast("long"))
      .withColumn("psi_micro",
        expr("((pc_ppm - pr_ppm) * _lnr) div 1000000"))
    val lo = bounds.select(col("m"), col("j").as("bin"), col("b")
      .as("lo_cents"))
    val rows = cells
      .join(lo, Seq("m", "bin"), "left")
      .select(col("m").as("metric"), col("bin"),
        coalesce(col("lo_cents"), lit(-1L)).as("lo_cents"),
        col("pr_ppm"), col("pc_ppm"), col("psi_micro"))
    val total = cells.groupBy("m")
      .agg(sum("psi_micro").as("psi_micro"))
      .select(col("m").as("metric"), lit(-1L).as("bin"),
        lit(-1L).as("lo_cents"), lit(null).cast("long").as("pr_ppm"),
        lit(null).cast("long").as("pc_ppm"), col("psi_micro"))
    rows.unionByName(total).orderBy("metric", "bin")
  }

  /** Hill tail-index estimator (Hill 1975) per metric — the
    * heavy-tail diagnostic the moment-based family silently needs:
    * powerAnalysis and Welch assume a finite variance, and a tail
    * index α ≤ 2 means that assumption is FALSE (variance infinite;
    * means converge slowly; use Mann–Whitney / jackknife instead).
    * α̂ = k / Σ_{i≤k} ln(x₍ᵢ₎ / x₍ₖ₊₁₎) over the k largest
    * observations; small α = heavy tail, α ≈ Zipf slope⁻¹ on
    * rank-frequency data.
    *
    * No corpus sort (the X218/X226 histogram argument): the top-k+1
    * order statistics come from the per-metric cents-value HISTOGRAM
    * — one combine-agg bounded by the value domain — walked by a
    * descending cumulative window over metadata; a value tied across
    * the k-th boundary contributes exactly min(cnt, k − cum_before)
    * copies, so the "k largest with multiplicity" set is
    * deterministic. ln is micro-floored per DISTINCT value (weighted
    * by its used count), making H and α̂ exact integer arithmetic with
    * one `div` each.
    *
    * Output per metric: (metric, k, x_ref_cents, h_micro, alpha_ppm)
    * where x_ref = x₍ₖ₊₁₎ and h_micro = (Σ ln x − k·ln x_ref)·10⁶/k.
    */
  def hillTailIndex(events: DataFrame, typeCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
    val hist = events.filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(typeCol).as("m"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .groupBy("m", "cents").agg(count(lit(1)).as("n"))
    val byDesc = w.partitionBy("m").orderBy(col("cents").desc)
      .rowsBetween(w.unboundedPreceding, -1)
    val cum = hist
      .withColumn("cb", coalesce(sum("n").over(byDesc), lit(0L)))
      .withColumn("ln_mu",
        floor(log(col("cents").cast("double")) * 1000000.0 + 0.5)
          .cast("long"))
    // x_(k+1): the smallest value whose cumulative (inclusive) count
    // reaches k+1 — ties handled by multiplicity
    val ref = cum.filter(col("cb") + col("n") >= k + 1)
      .groupBy("m").agg(max("cents").as("x_ref_cents"),
        max(when(col("cb") + col("n") >= k + 1
          && col("cb") < lit(k.toLong) + 1, col("ln_mu"))).as("_lnref"))
    // top-k with multiplicity: used = min(n, k − cb) where cb < k
    val top = cum.filter(col("cb") < k)
      .select(col("m"),
        (least(col("n"), lit(k.toLong) - col("cb")) * col("ln_mu"))
          .as("_t"),
        least(col("n"), lit(k.toLong) - col("cb")).as("_u"))
      .groupBy("m").agg(sum("_t").as("_sln"), sum("_u").as("_k"))
    top.join(ref, "m")
      .filter(col("_k") === k) // metrics with ≥ k+1 positive obs only
      .select(col("m").as("metric"), col("_k").as("k"),
        col("x_ref_cents"),
        expr(s"(_sln - _k * _lnref) div _k").as("h_micro"))
      .withColumn("alpha_ppm",
        expr("CAST(1000000000000 AS BIGINT) div h_micro"))
      .orderBy("metric")
  }

  /** Experiment power analysis / sample-size calculator (the standard
    * two-sample normal-approximation formula, Lehr's rule made exact)
    * — the readout every experimentation platform shows BEFORE a test
    * runs: with the variance this metric actually has, how many users
    * per arm buy the ability to detect a `mdePct`% shift at α = 0.05,
    * power = 0.80?  n/arm = 2·(z_{α/2}+z_β)²·σ²/δ².
    *
    * CDF-free by constant folding: the only distributional inputs are
    * z_{0.025} = 1.96 and z_{0.20} = 0.84 — fixed decimals, so
    * (z_sum)² = 7.84 enters as the integer ratio 784/100 and the
    * whole formula is exact integer arithmetic over micro-unit
    * moments: n = ⌈2·784·σ²_{µ²} / (100·δ²_{µ²})⌉ with σ² the
    * sample variance from exact decimal sums and δ = mean·mdePct/100,
    * both floored once. One partial-combining aggregation to
    * |metrics| rows; everything else is arithmetic on them.
    *
    * Output per metric: n_obs, mean_micro, var_micro2, mde_micro,
    * n_required_per_arm.
    */
  def powerAnalysis(events: DataFrame, typeCol: String, valueCol: String,
      mdePct: Int): DataFrame = {
    require(mdePct >= 1 && mdePct <= 100, s"mdePct ($mdePct) out of range")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = events.filter(col(valueCol).isNotNull)
      .select(col(typeCol).as("metric"),
        floor(col(valueCol) * 1000000 + 0.5).cast("decimal(38,0)").as("v"))
      .groupBy("metric")
      .agg(dec(count(lit(1))).as("n"), sum("v").as("s"),
        sum(col("v") * col("v")).as("ss"))
    m.select(col("metric"), col("n").cast("long").as("n_obs"),
        expr("CAST(s div n AS BIGINT)").as("mean_micro"),
        // sample variance in micro² via the moment identity; one div
        expr("CAST((n * ss - s * s) div (n * (n - 1)) AS BIGINT)")
          .as("var_micro2"))
      .withColumn("mde_micro", expr(s"(mean_micro * $mdePct) div 100"))
      .withColumn("n_required_per_arm",
        expr("CAST((2 * 784 * CAST(var_micro2 AS DECIMAL(38,0)) " +
          "+ 100 * CAST(mde_micro AS DECIMAL(38,0)) * mde_micro - 1) div " +
          "(100 * CAST(mde_micro AS DECIMAL(38,0)) * mde_micro) AS BIGINT)"))
      .orderBy("metric")
  }

  /** Simpson's-paradox audit over the A/B panel (Simpson 1951; the
    * Blyth 1972 framing) — the aggregation-reversal detector every
    * experiment readout should run before trusting a pooled number:
    * when arm traffic is unevenly composed across strata, the pooled
    * arm contrast can point OPPOSITE to every stratum's contrast, and
    * a dashboard showing only the pooled row ships the wrong decision.
    *
    * Division-free and exact (the permutationFdr statistic): the arm
    * contrast in any cell is sign(n_B·S_A − n_A·S_B) =
    * sign(mean_A − mean_B), an integer cross product carried in
    * decimal(38,0) — no means, no CDFs, nothing rounded. One
    * partial-combining pass reduces the corpus to
    * (metric × stratum × arm) cells; the overall contrast sums the
    * same cells. `reversal` fires on the strict textbook pattern:
    * every informative stratum agrees on a non-zero direction and the
    * pooled contrast points the other way.
    *
    * Output per metric: overall_diff (sign-carrying bigint), n_strata,
    * n_favor_a / n_favor_b (strata with a strictly positive /
    * negative A−B contrast), reversal.
    */
  def simpsonAudit(events: DataFrame, userCol: String, typeCol: String,
      strataCol: Column, valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val ev = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select(col(typeCol).as("m"), strataCol.as("g"),
        pmod(col(userCol), lit(2)).as("arm"),
        floor(col(valueCol) * 1000000 + 0.5).cast("decimal(38,0)").as("v"))
    val cells = ev.groupBy("m", "g").agg(
      dec(sum(when(col("arm") === 0, 1L).otherwise(0L))).as("na"),
      dec(sum(when(col("arm") === 1, 1L).otherwise(0L))).as("nb"),
      sum(when(col("arm") === 0, col("v")).otherwise(lit(0))).as("sa"),
      sum(when(col("arm") === 1, col("v")).otherwise(lit(0))).as("sb"))
      .localCheckpoint(eager = true)
    val strata = cells
      .withColumn("d", col("nb") * col("sa") - col("na") * col("sb"))
      .groupBy("m").agg(count(lit(1)).as("n_strata"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("n_favor_a"),
        sum(when(col("d") < 0, 1L).otherwise(0L)).as("n_favor_b"))
    val overall = cells.groupBy("m").agg(
        sum("na").as("na"), sum("nb").as("nb"),
        sum("sa").as("sa"), sum("sb").as("sb"))
      .select(col("m"),
        (col("nb") * col("sa") - col("na") * col("sb")).cast("long")
          .as("overall_diff"))
    overall.join(strata, "m")
      .select(col("m").as("metric"), col("overall_diff"), col("n_strata"),
        col("n_favor_a"), col("n_favor_b"),
        ((col("overall_diff") > 0 && col("n_favor_a") === 0
            && col("n_favor_b") > 0)
          || (col("overall_diff") < 0 && col("n_favor_b") === 0
            && col("n_favor_a") > 0)).as("reversal"))
      .orderBy("metric")
  }

  /** Single change-point in the mean by exact least squares (the AMOC
    * case of Scott & Knott / binary segmentation; Page's offline
    * counterpart) — the "WHEN did it change" companion to
    * [[cusumDrift]]'s online "DID it change": CUSUM alarms as the
    * shift accumulates (detection delay built in), this scans every
    * candidate break b and picks the split minimizing
    * SSE₁(≤b) + SSE₂(>b), which is the maximum-likelihood break under
    * a mean shift.
    *
    * Exactness: SSE in micro-units via the moment identity
    * nΣy² − (Σy)², one integer `div n` per segment — the only
    * divisions — so every candidate's score and the argmin (ties →
    * earliest day, a total order) replay bit-identically. Input is the
    * calendar-bounded daily table; prefix sums ride ONE ordered window
    * over it and candidate scoring is pure column arithmetic on those
    * ≤|days| rows — the corpus never appears here (the caller's daily
    * aggregation is the one corpus-scale pass, as in holtLinear).
    *
    * Output, one row per candidate break (b = LAST day of the first
    * segment; both segments non-empty): day, n, segment means in
    * micro-units, sse_micro, is_best.
    */
  def changepointMean(daily: DataFrame, dayCol: String, nCol: String)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val byDay = w.orderBy(dayCol)
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val cum = daily.select(col(dayCol).as("day"), col(nCol).as("n"))
      .withColumn("s1", sum("n").over(byDay))
      .withColumn("ss1", sum(expr(s"n * n")).over(byDay))
      .withColumn("n1", count(lit(1)).over(byDay))
    val tot = cum.agg(max("s1").as("st"), max("ss1").as("sst"),
      max("n1").as("nt"))
    cum.crossJoin(broadcast(tot))
      .filter(col("n1") < col("nt")) // both segments non-empty
      .withColumn("sse_micro",
        expr("((n1 * ss1 - s1 * s1) * 1000000) div n1") +
        expr("(((nt - n1) * (sst - ss1) - (st - s1) * (st - s1)) " +
          "* 1000000) div (nt - n1)"))
      .withColumn("mean_before_micro", expr("(s1 * 1000000) div n1"))
      .withColumn("mean_after_micro",
        expr("((st - s1) * 1000000) div (nt - n1)"))
      .withColumn("_best", min(struct(col("sse_micro"), col("day")))
        .over(w.partitionBy()))
      .select(col("day"), col("n"), col("mean_before_micro"),
        col("mean_after_micro"), col("sse_micro"),
        (col("_best.sse_micro") === col("sse_micro")
          && col("_best.day") === col("day")).as("is_best"))
      .orderBy("day")
  }

  /** Tabular two-sided CUSUM monitor per event type (X290; Page
    * Biometrika 1954; the "tabular CUSUM" of Montgomery's SPC text) —
    * the MONITORING form next to [[cusumDrift]]'s retrospective
    * one-sided count CUSUM: baseline mu0 is HELD OUT (the first
    * `baseDays` days — a whole-series mean leaks the drift into the
    * target and shrinks the signal), the allowance k is explicit (the
    * ARL tuning knob), the decision interval h is a parameter, and
    * BOTH one-sided sums run (upward and downward drift). Fires on a
    * SUSTAINED small drift long before [[changepointMean]]'s
    * retrospective AMOC or a per-day z-test would: each day adds the
    * deviation beyond an allowance k to a one-sided cumulative sum
    * that resets at 0, so noise cancels but persistent drift
    * accumulates linearly.
    *
    * Closed form instead of the textbook recursion: with prefix sums
    * P over the DENSE zero-filled daily series (absent days are real
    * 0 observations for a volume monitor),
    *   S⁺_i = max(0, max_{j≤i} [(P_i−P_{j−1})·10⁶ − (i−j+1)·(μ0+k)])
    * and symmetrically S⁻ — the recursion unrolled into a
    * calendar²-bounded pair maximum, one shot in both engines, no
    * driver loop (the [[changepointMean]] prefix-sum discipline).
    *
    * Baseline μ0 = the first `baseDays` days' mean daily total
    * (micro, toward-zero); allowance k = μ0·kPermille/1000; alarm
    * threshold h = μ0·hPermille/1000. All integer micro-cents —
    * signed divisions via [[TextOps.truncDivDec]] (DuckDB `//`).
    *
    * Scale: one corpus combine-agg to |types|×|days| cells; the pair
    * max and windows run on calendar² metadata. Output per (type,
    * day): daily cents, S⁺, S⁻, and both alarm flags.
    */
  def cusumTabular(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String, baseDays: Int, kPermille: Int, hPermille: Int)
      : DataFrame = {
    require(baseDays >= 1, s"baseDays ($baseDays) must be >= 1")
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val ev = events.select(to_date(col(tsCol)).as("_day"),
      col(typeCol).as("event_type"),
      floor(col(valueCol) * 100 + 0.5).cast("long").as("_c"))
    val spine = ev.agg(min("_day").as("_a"), max("_day").as("_b"))
      .select(explode(sequence(col("_a"), col("_b"))).as("_day"))
      .crossJoin(ev.select("event_type").distinct())
    val daily = spine
      .join(ev.groupBy("event_type", "_day").agg(sum("_c").as("_y")),
        Seq("event_type", "_day"), "left")
      .select(col("event_type"), col("_day"),
        coalesce(col("_y"), lit(0L)).as("y"))
      .withColumn("i", row_number().over(
        Window.partitionBy("event_type").orderBy("_day")))
      .withColumn("p", sum("y").over(Window.partitionBy("event_type")
        .orderBy("_day").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .localCheckpoint(true) // feeds the baseline agg + both pair sides
    val base = daily.filter(col("i") <= baseDays)
      .groupBy("event_type")
      .agg(TextOps.truncDivDec(dec(sum("y")) * lit(1000000L),
        dec(count(lit(1)))).cast("long").as("mu0"))
      .select(col("event_type"), col("mu0"),
        (TextOps.truncDivDec(dec(col("mu0")) * lit(kPermille),
          dec(lit(1000L)))).cast("long").as("k"),
        (TextOps.truncDivDec(dec(col("mu0")) * lit(hPermille),
          dec(lit(1000L)))).cast("long").as("h"))
    val ends = daily.join(broadcast(base), "event_type")
    val starts = daily.select(col("event_type"), col("i").as("j"),
      (col("p") - col("y")).as("pj1"))
    ends.join(starts, "event_type")
      .filter(col("j") <= col("i"))
      .select(col("event_type"), col("_day"), col("i"), col("y"),
        col("h"),
        ((col("p") - col("pj1")) * lit(1000000L)
          - (col("i") - col("j") + 1) * (col("mu0") + col("k")))
          .as("_hi"),
        ((col("i") - col("j") + 1) * (col("mu0") - col("k"))
          - (col("p") - col("pj1")) * lit(1000000L)).as("_lo"))
      .groupBy(col("event_type"), col("_day"), col("i"), col("y"),
        col("h"))
      .agg(greatest(lit(0L), max("_hi")).as("cusum_high_micro"),
        greatest(lit(0L), max("_lo")).as("cusum_low_micro"))
      .select(col("event_type"),
        date_format(col("_day"), "yyyy-MM-dd").as("day"), col("y"),
        col("cusum_high_micro"), col("cusum_low_micro"),
        (col("cusum_high_micro") > col("h")).as("alarm_high"),
        (col("cusum_low_micro") > col("h")).as("alarm_low"))
      .orderBy("event_type", "day")
  }

  /** The UCB1 exploration bonus in micro units,
    * ⌊√(2·ln p / n)·10⁶ + 0.5⌋ — computed ONCE in this JVM and shared
    * by the Spark fold and the interpolated oracle VALUES table (the
    * SPRT folded-constant discipline: no runtime transcendental can
    * disagree across engines because neither engine evaluates one).
    */
  def ucbBonusMicro(p: Int, n: Int): Long =
    math.floor(math.sqrt(2.0 * math.log(p.toDouble) / n.toDouble)
      * 1000000.0 + 0.5).toLong

  /** Deterministic UCB1 bandit trajectory over the logged daily
    * arm-reward feed (X299; Auer, Cesa-Bianchi & Fischer MLJ 2002) —
    * the sequential DECISION readout next to [[sprtTrajectory]]'s
    * testing and [[offPolicyValue]]'s counterfactual scoring: replay
    * "what would UCB1 have played" day by day against the full-
    * information log, the audit a bandit rollout runs before going
    * live.
    *
    * Construction (all pure functions of the data):
    *  - arms = event types; the arena is a DENSE zero-filled
    *    `horizon`-day spine from the corpus min day (missing cells are
    *    real 0-reward days, and the FIXED horizon keeps the unrolled
    *    oracle well-defined on any feed);
    *  - rewards: per-cell mean value in micro, normalized to [0, 10⁶]
    *    by the global max cell mean (UCB1's [0,1] reward contract);
    *    all divisions floor on nonnegative operands (DuckDB `//`);
    *  - t = 1 seeds every arm with its day-1 reward (the standard
    *    play-each-arm-once init); t ≥ 2 plays
    *    argmax_a ⌊s_a/n_a⌋ + bonus(p, n_a) with p = |arms| + t − 2
    *    total prior plays, ties by arm name — bonus values come from
    *    [[ucbBonusMicro]], folded in the JVM and shared with the
    *    oracle as literals;
    *  - the chosen arm alone receives that day's reward.
    *
    * Scale: ONE combine-agg reduces the corpus to the |arms|×horizon
    * cell table; only that metadata table reaches the driver for the
    * 30-step fold (the Holt/Markov bounded-collect precedent — the
    * recursion has decision feedback, so each step depends on the
    * previous argmax; unrolling it as 30 tiny Spark jobs would buy
    * nothing but scheduler overhead).
    *
    * Output per play: (t, day, arm, reward_norm_micro, ucb_micro —
    * 0 for seed rows, n_after, s_after), ordered by (t, arm).
    */
  def ucbTrajectory(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String, horizon: Int = 30): DataFrame = {
    require(horizon >= 2, s"horizon ($horizon) must be >= 2")
    val spark = events.sparkSession
    import spark.implicits._
    val cells = events
      .select(col(typeCol).as("arm"), to_date(col(tsCol)).as("_day"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("_c"))
      .groupBy("arm", "_day")
      .agg(count(lit(1)).as("_n"), sum("_c").as("_s"))
    val minDay = events.agg(min(to_date(col(tsCol)))).head().getDate(0)
      .toLocalDate
    val raw = cells
      .select(col("arm"), col("_day").cast("string"), col("_n"), col("_s"))
      .as[(String, String, Long, Long)].collect()
      .map { case (a, d, n, s) =>
        val t = java.time.temporal.ChronoUnit.DAYS.between(
          minDay, java.time.LocalDate.parse(d)).toInt + 1
        (a, t) -> (s * 1000000L / n) // mean micro; n > 0 by grouping
      }.toMap
    val arms = raw.keys.map(_._1).toSeq.distinct.sorted
    // fail LOUDLY outside the contract instead of silently degrading:
    // rewards must be nonnegative (the [0, 10^6] normalization), and
    // the folded bonus table shared with the oracle covers p <= 60
    require(raw.values.forall(_ >= 0L),
      "ucbTrajectory requires nonnegative rewards (negative cell mean found)")
    require(arms.size >= 2 && arms.size + horizon - 2 <= 60,
      s"ucbTrajectory needs 2 <= arms (${arms.size}) and arms + horizon - 2 <= 60")
    val dayIdx = (1 to horizon)
    val maxMean = math.max(1L, raw.values.max)
    def rn(a: String, t: Int): Long =
      raw.get((a, t)).map(m => m * 1000000L / maxMean).getOrElse(0L)
    val out = Seq.newBuilder[(Int, String, String, Long, Long, Long, Long)]
    def dayOf(t: Int): String = minDay.plusDays(t - 1L).toString
    var st: Map[String, (Long, Long)] =
      arms.map { a =>
        val r = rn(a, 1)
        out += ((1, dayOf(1), a, r, 0L, 1L, r))
        a -> ((1L, r))
      }.toMap
    dayIdx.drop(1).foreach { t =>
      val p = arms.size + t - 2
      val scored = arms.map { a =>
        val (n, s) = st(a)
        (a, s / n + ucbBonusMicro(p, n.toInt))
      }
      val (chosen, ucb) = scored.sortBy { case (a, u) => (-u, a) }.head
      val r = rn(chosen, t)
      val (n0, s0) = st(chosen)
      st = st.updated(chosen, (n0 + 1, s0 + r))
      out += ((t, dayOf(t), chosen, r, ucb, n0 + 1, s0 + r))
    }
    out.result()
      .toDF("t", "day", "arm", "reward_norm_micro", "ucb_micro",
        "n_after", "s_after")
      .orderBy("t", "arm")
  }

  /** Daily cross-correlation function between two event-type series
    * (lead–lag analysis; Box & Jenkins ch. 11) — the "does X drive Y,
    * and with what delay" readout next to [[seasonalDecompose]]: the
    * lag maximizing r(ℓ) between, say, clicks_t and purchases_{t+ℓ}
    * is the causal-delay hypothesis a funnel team starts from.
    *
    * ONE corpus pass reduces events to two zero-filled daily series on
    * a DENSE calendar spine (absent days are real (0,0) observations —
    * dropping them biases r); each day carries an integer index t so
    * lag arithmetic is integer, and the ±maxLag pair joins + exact
    * int64 Pearson moments run on the |days|×|lags| metadata only.
    * One IEEE sqrt per lag at the very end, round6.
    *
    * Output: (lag, n_days, r) for ℓ ∈ [−maxLag, maxLag]; r(ℓ)
    * correlates x_t with y_{t+ℓ}, so a POSITIVE peak lag means x
    * leads y by ℓ days.
    */
  def ccfDaily(events: DataFrame, tsCol: String, typeCol: String,
      typeX: String, typeY: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag ($maxLag) must be >= 0")
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(to_date(col(tsCol)).as("day"),
      col(typeCol).as("et"))
    val spine = ev.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"),
        col("d0"))
      .select(col("day"), datediff(col("day"), col("d0")).as("t"))
    val daily = spine
      .join(ev.filter(col("et") === typeX).groupBy("day")
        .agg(count(lit(1)).as("_x")), Seq("day"), "left")
      .join(ev.filter(col("et") === typeY).groupBy("day")
        .agg(count(lit(1)).as("_y")), Seq("day"), "left")
      .select(col("t"), coalesce(col("_x"), lit(0L)).as("x"),
        coalesce(col("_y"), lit(0L)).as("y"))
      .localCheckpoint(eager = true)
    val lags = (-maxLag to maxLag).toDF("lag")
    // pair (x_t, y_{t+lag}): join y at index t + lag
    val moments = lags.as("l")
      .join(daily.as("a"), lit(true))
      .join(daily.as("b"), col("b.t") === col("a.t") + col("l.lag"))
      .groupBy(col("l.lag").as("lag"))
      .agg(count(lit(1)).as("n"), sum(col("a.x")).as("sx"),
        sum(col("b.y")).as("sy"),
        sum(col("a.x") * col("b.y")).as("sxy"),
        sum(col("a.x") * col("a.x")).as("sxx"),
        sum(col("b.y") * col("b.y")).as("syy"))
    moments.select(col("lag"), col("n").as("n_days"),
        TextOps.round6(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double"))
              * sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double")))).as("r"))
      .orderBy("lag")
  }

  /** MAD robust scale + robust-z outlier census (X275; Hampel 1974,
    * the median absolute deviation) — the 50%-breakdown scale
    * estimate for the regime [[hillTailIndex]] warns about: when the
    * tail index says variance is fiction, σ-based outlier rules
    * (X114) are circular — the outliers inflate the very σ that is
    * supposed to catch them. MAD shrugs off half the data being
    * corrupted; the census counts |x − med| > 3·1.4826·MAD (the
    * normal-consistency calibration) per metric.
    *
    * Sort-free and CDF-free: both the median and the MAD are LOWER
    * medians walked from value histograms (X218/X255 — the residual
    * histogram is bounded by the value domain too, since r = |c −
    * med| lives in the same cents range), and the outlier test
    * clears to the integer cross-multiplication
    * |c − med|·10⁴ > 44478·MAD — 3·1.4826 constant-folded to 44478,
    * no float boundary anywhere. MAD = 0 (more than half the mass on
    * one value) flags every off-median row — the classic MAD
    * degeneracy, surfaced honestly rather than patched.
    *
    * Scale: three corpus passes (value histogram, residual histogram,
    * census), each reducing to domain-bounded cells before any
    * exchange; medians broadcast back as 1-row-per-metric tables.
    * Output per metric: (event_type, n, median_cents, mad_cents,
    * n_outliers, outlier_ppm).
    */
  def madOutliers(events: DataFrame, typeCol: String, valueCol: String)
      : DataFrame = {
    val w = Window.partitionBy("m").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val base = events
      .filter(col(typeCol).isNotNull && col(valueCol).isNotNull)
      .select(col(typeCol).as("m"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("c"))
    def lowerMedian(df: DataFrame, vCol: String, out: String) = {
      val hist = df.groupBy(col("m"), col(vCol).as("v"))
        .agg(count(lit(1)).as("cnt"))
      hist
        .withColumn("cum", sum("cnt").over(w))
        .join(hist.groupBy("m").agg(sum("cnt").as("n")), "m")
        .filter(col("cum") >= expr("(n + 1) div 2"))
        .groupBy("m", "n").agg(min("v").as(out))
    }
    val med = lowerMedian(base, "c", "median_cents")
    val resid = base.join(broadcast(med), "m")
      .select(col("m"), abs(col("c") - col("median_cents")).as("r"))
    val mad = lowerMedian(resid, "r", "mad_cents")
      .select("m", "mad_cents")
    base.join(broadcast(med), "m").join(broadcast(mad), "m")
      .groupBy(col("m"), col("n"), col("median_cents"), col("mad_cents"))
      .agg(sum(when(abs(col("c") - col("median_cents")) * 10000
        > lit(44478L) * col("mad_cents"), 1L).otherwise(0L))
        .as("n_outliers"))
      .select(col("m").as(typeCol), col("n"), col("median_cents"),
        col("mad_cents"), col("n_outliers"),
        TextOps.round6(col("n_outliers") * lit(1000000)
          / col("n").cast("double")).as("outlier_ppm"))
      .orderBy(typeCol)
  }

  /** Interrupted time-series analysis (X274; segmented regression,
    * Wagner et al. 2002) — the causal readout for a KNOWN
    * intervention date: fit the daily series as two independent OLS
    * segments with the x-origin AT the break, so each segment's
    * intercept IS its level at the intervention and
    * level_change = post(0) − pre→0 extrapolation,
    * slope_change = post slope − pre slope — the "did the deploy
    * move the level, the trend, or neither" quantification that
    * X239's changepoint (which FINDS an unknown break) and X66's
    * CUSUM (which alarms) both stop short of.
    *
    * Exactness: the X141 group-wise-OLS contract — daily sums in
    * exact integer cents, per-segment moments in decimal(38,0), the
    * closed-form slope/intercept as ONE double division each in an
    * operation order the oracle spells identically, round6 display.
    * Centering x on the break keeps intercepts directly comparable
    * with no extrapolation arithmetic beyond the fit itself.
    *
    * Scale: one corpus pass to the daily table; both fits are one
    * combine agg over calendar-bounded metadata. Output: a single
    * row (n_pre, n_post, pre_slope, post_slope, pre_level,
    * post_level, level_change, slope_change), levels/slopes in
    * currency units (cents/100).
    */
  def interruptedTimeSeries(df: DataFrame, tsCol: String,
      valueCol: String, breakDate: String): DataFrame = {
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val daily = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(floor(col(valueCol) * 100 + 0.5).cast("long")).as("y"))
      .select(datediff(col("day"), lit(breakDate).cast("date"))
        .cast("long").as("x"), col("y"))
    val mom = daily
      .withColumn("post", col("x") >= 0)
      .groupBy("post")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n_d"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
    def seg(p: Boolean, nm: String) = {
      val den = (col("n_d") * col("sxx") - col("sx") * col("sx"))
        .cast("double")
      mom.filter(col("post") === p).select(
        col("n_d").cast("long").as(s"n_$nm"),
        ((col("n_d") * col("sxy") - col("sx") * col("sy")).cast("double")
          / den / 100.0).as(s"_sl_$nm"),
        ((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
          / den / 100.0).as(s"_lv_$nm"))
    }
    seg(p = false, "pre").crossJoin(seg(p = true, "post"))
      .select(col("n_pre"), col("n_post"),
        TextOps.round6(col("_sl_pre")).as("pre_slope"),
        TextOps.round6(col("_sl_post")).as("post_slope"),
        TextOps.round6(col("_lv_pre")).as("pre_level"),
        TextOps.round6(col("_lv_post")).as("post_level"),
        TextOps.round6(col("_lv_post") - col("_lv_pre"))
          .as("level_change"),
        TextOps.round6(col("_sl_post") - col("_sl_pre"))
          .as("slope_change"))
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 test + Mantel–Haenszel
    * pooled odds ratio (X273; Mantel & Haenszel 1959, Cochran 1954) —
    * the estimate X243's Simpson audit tells you to compute INSTEAD
    * of the pooled table: condition on the stratifier (day-of-week),
    * pool the per-stratum evidence, and the confounding that reverses
    * naive pooling cancels by construction.
    *
    * Per stratum i the 2×2 table (aᵢ = arm-1 conversions, etc.)
    * contributes exact rationals:
    *   E[aᵢ]  = n1ᵢ·m1ᵢ/nᵢ,
    *   V[aᵢ]  = n1ᵢ·n0ᵢ·m1ᵢ·m0ᵢ/(nᵢ²(nᵢ−1)),
    *   OR num = aᵢdᵢ/nᵢ,  OR den = bᵢcᵢ/nᵢ.
    * Each is floored ONCE to integer micro (the per-stratum quantize-
    * before-sum rule — summing exact rationals with different
    * denominators is not engine-portable, micro integers are), then
    * the CMH statistic χ² = (Σaᵢ·10⁶ − ΣEᵢ_micro)²/(ΣVᵢ_micro·10⁶)
    * and OR_MH = ΣORnum/ΣORden each leave via one exact decimal
    * division. The verdict compares χ²_micro against the
    * constant-folded χ²₁(0.95) = 3.841459 — no CDF at runtime (the
    * X250/X252 discipline). Degenerate strata (nᵢ ≤ 1) contribute
    * nothing, exactly as the statistic prescribes.
    *
    * Scale: one corpus pass to the (stratum × arm) cells; everything
    * after runs on ≤|strata| metadata rows. Output: per-stratum
    * detail rows plus one '__CMH__' summary row (chi2_micro, or_mh
    * round6, reject flag).
    */
  def cmhStratified(events: DataFrame, userCol: String, tsCol: String,
      successCol: Column): DataFrame = {
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val cells = events
      .filter(col(userCol).isNotNull)
      .select(dayofweek(col(tsCol)).as("stratum"),
        (col(userCol) % 2).as("arm"),
        when(successCol, 1L).otherwise(0L).as("s"))
      .groupBy("stratum")
      .agg(
        sum(when(col("arm") === 1, col("s")).otherwise(0L)).as("a"),
        sum(when(col("arm") === 1, lit(1L) - col("s")).otherwise(0L)).as("b"),
        sum(when(col("arm") === 0, col("s")).otherwise(0L)).as("c"),
        sum(when(col("arm") === 0, lit(1L) - col("s")).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .filter(col("n") > 1)
      // per-stratum micro-quantized terms, floored ONCE each
      .withColumn("e_mu", TextOps.floorDivDec(
        dec((col("a") + col("b"))) * dec(col("a") + col("c"))
          * lit(1000000), dec(col("n"))).cast("long"))
      .withColumn("v_mu", TextOps.floorDivDec(
        dec(col("a") + col("b")) * dec(col("c") + col("d"))
          * dec(col("a") + col("c")) * dec(col("b") + col("d"))
          * lit(1000000),
        dec(col("n")) * dec(col("n")) * dec(col("n") - 1)).cast("long"))
      .withColumn("orn_mu", TextOps.floorDivDec(
        dec(col("a")) * dec(col("d")) * lit(1000000), dec(col("n")))
        .cast("long"))
      .withColumn("ord_mu", TextOps.floorDivDec(
        dec(col("b")) * dec(col("c")) * lit(1000000), dec(col("n")))
        .cast("long"))
      .localCheckpoint(eager = true) // detail rows + the summary fold
    val detail = cells.select(col("stratum").cast("string").as("stratum"),
      col("a"), col("b"), col("c"), col("d"),
      col("e_mu"), col("v_mu"))
    val sums = cells.agg(sum("a").as("sa"), sum("e_mu").as("se"),
      sum("v_mu").as("sv"), sum("orn_mu").as("sorn"),
      sum("ord_mu").as("sord"))
    // chi2_micro = (sa·10⁶ − se)² div (sv·10⁶); or_mh = Σnum/Σden
    val summaryRow = sums.select(
      lit("__CMH__").as("stratum"),
      // (sa·10⁶ − se)² is chi²·10¹²; div by sv (= ΣV·10⁶) → chi²·10⁶
      TextOps.floorDivDec(
        dec(col("sa") * lit(1000000L) - col("se"))
          * dec(col("sa") * lit(1000000L) - col("se")),
        dec(col("sv"))).cast("long").as("chi2_micro"),
      // guarded: a corpus where no stratum has discordant (b, c)
      // pairs has an undefined MH odds ratio, not an error
      when(col("sord") > 0,
        TextOps.round6(col("sorn") / col("sord").cast("double")))
        .as("or_mh"))
      .withColumn("reject", col("chi2_micro") >= 3841459L)
    detail
      .select(col("stratum"), col("a"), col("b"), col("c"), col("d"),
        col("e_mu"), col("v_mu"), lit(null).cast("long").as("chi2_micro"),
        lit(null).cast("double").as("or_mh"),
        lit(null).cast("boolean").as("reject"))
      .unionAll(summaryRow.select(col("stratum"),
        lit(null).cast("long").as("a"), lit(null).cast("long").as("b"),
        lit(null).cast("long").as("c"), lit(null).cast("long").as("d"),
        lit(null).cast("long").as("e_mu"),
        lit(null).cast("long").as("v_mu"), col("chi2_micro"),
        col("or_mh"), col("reject")))
      .orderBy("stratum")
  }

  /** Wald's sequential probability ratio test (X269; Wald 1945) on a
    * daily Bernoulli rate — the FULLY-sequential companion to
    * [[obfSequential]]'s five-look boundaries: check after every day,
    * stop the moment the cumulative log-likelihood ratio leaves
    * (B, A), with α/β guaranteed by A = ln((1−β)/α), B = ln(β/(1−α))
    * regardless of when you peek. The trajectory itself is the
    * deliverable: a flat walk says "the truth sits between your
    * hypotheses, keep sampling" — the readout neither a fixed-horizon
    * test nor OBF's scheduled looks can phrase.
    *
    * CDF-free and ln-free AT RUNTIME: every logarithm — the two
    * per-trial increments ln(p₁/p₀), ln((1−p₁)/(1−p₀)) and both
    * boundaries — is CONSTANT-FOLDED on the driver to integer micro
    * (the X245 constant-folding discipline), and the SQL oracle
    * interpolates the SAME JVM-computed integers, so the engines
    * cannot disagree by construction. The daily LLR is then pure
    * integer arithmetic: k_cum·L₁ + (n_cum−k_cum)·L₀.
    *
    * Scale: one combine agg to the |days| table; cumulative windows
    * and every scenario's trajectory run on that calendar-bounded
    * metadata (the daily table is checkpointed once and shared by
    * all scenarios). Output per (scenario, day): n_cum, k_cum,
    * llr_micro, verdict — verdict per day, not sticky: the first
    * boundary crossing is visible as the first non-continue row.
    */
  def sprtTrajectory(events: DataFrame, tsCol: String, success: Column,
      scenarios: Seq[(String, Double, Double)], alpha: Double = 0.05,
      beta: Double = 0.05): DataFrame = {
    require(scenarios.nonEmpty, "need at least one scenario")
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(success, 1L).otherwise(0L)).as("k"))
      .withColumn("n_cum", sum("n").over(w))
      .withColumn("k_cum", sum("k").over(w))
      .localCheckpoint(eager = true) // shared by every scenario
    val a = sprtUpperMicro(alpha, beta)
    val b = sprtLowerMicro(alpha, beta)
    scenarios.map { case (nm, p0, p1) =>
      val (l1, l0) = sprtIncrementsMicro(p0, p1)
      cum.select(lit(nm).as("scenario"), col("day"), col("n_cum"),
          col("k_cum"),
          (col("k_cum") * l1 + (col("n_cum") - col("k_cum")) * l0)
            .as("llr_micro"))
        .withColumn("verdict",
          when(col("llr_micro") >= a, "accept_h1")
            .when(col("llr_micro") <= b, "accept_h0")
            .otherwise("continue"))
    }.reduce(_.unionAll(_)).orderBy("scenario", "day")
  }

  /** The SPRT constants, folded once on the driver so the Spark plan
    * and the SQL oracle interpolate the SAME integers.
    */
  def sprtIncrementsMicro(p0: Double, p1: Double): (Long, Long) = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"bad hypotheses: $p0 / $p1")
    (math.floor(math.log(p1 / p0) * 1e6).toLong,
      math.floor(math.log((1 - p1) / (1 - p0)) * 1e6).toLong)
  }

  def sprtUpperMicro(alpha: Double, beta: Double): Long =
    math.ceil(math.log((1 - beta) / alpha) * 1e6).toLong

  def sprtLowerMicro(alpha: Double, beta: Double): Long =
    math.floor(math.log(beta / (1 - alpha)) * 1e6).toLong

  /** Quantile treatment effects (X267; Doksum 1974 / Firpo 2007) —
    * the DISTRIBUTIONAL A/B readout: per metric, the difference
    * between the two arms' decile values, v_q(arm 1) − v_q(arm 0)
    * for q = 1..9. A mean contrast answers "did the average move"; the
    * QTE profile answers WHERE in the distribution it moved — a
    * treatment that helps the median user but hurts the tail shows a
    * sign flip across q that no single location statistic can.
    *
    * Sort-free (X218): each decile is the ⌈q·n/10⌉-th order statistic
    * walked from the per-(metric, arm) cents histogram — the integer
    * clearing 10·cum ≥ q·n, value selected by a min combine-agg over
    * the qualifying cells. Ties select the same VALUE in both
    * engines; differences are exact integer cents.
    *
    * Scale: one corpus pass to the histogram; the decile spine join
    * and the min-aggs run over (metric × arm × cells) metadata.
    * Output: (event_type, q, v0_cents, v1_cents, qte_cents) ordered.
    */
  def quantileTreatmentEffects(events: DataFrame, userCol: String,
      typeCol: String, valueCol: String): DataFrame = {
    val base = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select(col(typeCol).as("m"), (col(userCol) % 2).as("arm"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("c"))
    val hist = base.groupBy("m", "arm", "c").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("m", "arm").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, 0)
    val h = hist.withColumn("cum", sum("cnt").over(w))
    val tot = hist.groupBy("m", "arm").agg(sum("cnt").as("n"))
    val spine = events.sparkSession.sql(
      "SELECT * FROM VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9) t(q)")
    val dec9 = h.join(tot, Seq("m", "arm"))
      .join(broadcast(spine), col("cum") * 10 >= col("q") * col("n"))
      .groupBy("m", "arm", "q").agg(min("c").as("v"))
    dec9.filter(col("arm") === 0)
      .select(col("m"), col("q"), col("v").as("v0_cents"))
      .join(dec9.filter(col("arm") === 1)
        .select(col("m"), col("q"), col("v").as("v1_cents")),
        Seq("m", "q"))
      .select(col("m").as(typeCol), col("q"), col("v0_cents"),
        col("v1_cents"), (col("v1_cents") - col("v0_cents")).as("qte_cents"))
      .orderBy(typeCol, "q")
  }

  /** Robust A/B location panel (X266; Tukey 1962 trimmed/winsorized
    * means) — per (metric, arm): the mean, the 10%-TRIMMED mean
    * (drop the k = ⌊n/10⌋ smallest and largest values), and the
    * WINSORIZED mean (clamp them to the surviving order statistics) —
    * the "capped metric" production practice, sitting between the raw
    * mean the whale users own and the median that ignores magnitude
    * entirely. Reading all three per arm IS the readout: if they
    * disagree, the contrast is a tail story, not a location story.
    *
    * No corpus sort (X218): each boundary is an order statistic
    * walked from the per-(metric, arm) cents HISTOGRAM. With cum(v) =
    * #{≤ v}, cumv(v) = Σ_{≤v} cnt·v the running value mass, and v_r =
    * the rank-r statistic (min v with cum ≥ r):
    *   bottom_k = [cumv(v_k) − cnt(v_k)·v_k] + (k − below(v_k))·v_k,
    *   top_k    = [S − cumv(v_{n−k+1})] + (cum(v_{n−k+1}) − (n−k))·v_{n−k+1},
    * both exact under ties because the boundary cell contributes
    * exactly its in-range multiplicity. Trimmed sum = S − bottom −
    * top over n−2k; winsorized adds k·v_{k+1} + k·v_{n−k} back over
    * n. All integer cents; the three means leave via one
    * [[TextOps.floorDivDec]] each into micro currency units. k = 0
    * (n < 10) degrades all three to the plain mean exactly.
    *
    * Scale: one corpus pass to the histogram; the rank lookups are
    * four min_by combine-aggs over that metadata. Output per
    * (event_type, arm): n, k_trim, mean/trimmed/winsor micro.
    */
  def robustAbMeans(events: DataFrame, userCol: String, typeCol: String,
      valueCol: String): DataFrame = {
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val base = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select(col(typeCol).as("m"), (col(userCol) % 2).as("arm"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("c"))
    val hist = base.groupBy("m", "arm", "c").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("m", "arm").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, 0)
    val h = hist
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("cumv", sum(col("cnt") * col("c")).over(w))
      .localCheckpoint(eager = true) // four rank-lookup consumers
    val tot = hist.groupBy("m", "arm")
      .agg(sum("cnt").as("n"), sum(col("cnt") * col("c")).as("s"))
      .withColumn("k", expr("n DIV 10"))
    def rankRow(name: String, r: Column) =
      h.join(tot.select("m", "arm", "n", "k"), Seq("m", "arm"))
        .filter(r >= 1 && col("cum") >= r)
        .groupBy("m", "arm")
        .agg(min_by(struct(col("c"), col("cum"), col("cnt"),
          col("cumv")), col("c")).as(name))
    val joined = tot
      .join(rankRow("rk", col("k")), Seq("m", "arm"), "left")
      .join(rankRow("rk1", col("k") + 1), Seq("m", "arm"), "left")
      .join(rankRow("rnk", col("n") - col("k")), Seq("m", "arm"), "left")
      .join(rankRow("rnk1", col("n") - col("k") + 1), Seq("m", "arm"),
        "left")
    val bottom = when(col("k") === 0, lit(0L)).otherwise(
      col("rk.cumv") - col("rk.cnt") * col("rk.c")
        + (col("k") - (col("rk.cum") - col("rk.cnt"))) * col("rk.c"))
    val top = when(col("k") === 0, lit(0L)).otherwise(
      col("s") - col("rnk1.cumv")
        + (col("rnk1.cum") - (col("n") - col("k"))) * col("rnk1.c"))
    joined
      .withColumn("_bot", bottom)
      .withColumn("_top", top)
      .withColumn("_tsum", col("s") - col("_bot") - col("_top"))
      .withColumn("_wsum", col("_tsum")
        + when(col("k") === 0, lit(0L))
          .otherwise(col("k") * col("rk1.c") + col("k") * col("rnk.c")))
      .select(col("m").as(typeCol), col("arm"), col("n"),
        col("k").as("k_trim"),
        TextOps.floorDivDec(dec(col("s")) * lit(10000), dec(col("n")))
          .cast("long").as("mean_micro"),
        TextOps.floorDivDec(dec(col("_tsum")) * lit(10000),
          dec(col("n") - lit(2) * col("k"))).cast("long")
          .as("trimmed_micro"),
        TextOps.floorDivDec(dec(col("_wsum")) * lit(10000), dec(col("n")))
          .cast("long").as("winsor_micro"))
      .orderBy(typeCol, "arm")
  }

  /** Exact 1-D Wasserstein-1 (earth-mover) drift (X264; Monge 1781 /
    * the W₁ = ∫|F₁−F₂| identity) between each metric's PRE- and
    * POST-split value distributions — the magnitude-sensitive
    * companion the overlap family (PSI X249, KL/JSD) cannot be: PSI
    * saturates once bins stop overlapping ("different"), W₁ keeps
    * growing with HOW FAR the mass moved, in the metric's own units —
    * the number a "did the spend distribution shift by cents or by
    * dollars" question actually asks.
    *
    * Exactness: on integer cents the integral is a finite sum over
    * the value histogram — Σ_v |cum₁(v)·n₂ − cum₂(v)·n₁| · gap(v) in
    * decimal(38,0) (the cross-multiplied CDF difference avoids any
    * per-cell division), divided ONCE at the end by n₁·n₂·100
    * ([[TextOps.floorDivDec]]) into micro currency units. The last
    * cell needs no term: beyond the union max both CDFs are 1 and the
    * difference is exactly zero, so the lead-window null is the
    * correct boundary, not a dropped value.
    *
    * Scale: one corpus pass to the (metric, cents) histogram, whose
    * size is bounded by the value DOMAIN (X218); the cumulative and
    * lead windows run per metric over that metadata. Output per
    * metric: (event_type, n_pre, n_post, emd_micro, emd).
    */
  def emdDrift(events: DataFrame, typeCol: String, valueCol: String,
      tsCol: String, splitDate: String): DataFrame = {
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val base = events
      .filter(col(typeCol).isNotNull && col(valueCol).isNotNull)
      .select(col(typeCol).as("m"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("c"),
        (col(tsCol) >= lit(splitDate).cast("timestamp")).as("post"))
    val hist = base.groupBy("m", "c")
      .agg(sum(when(col("post"), 0L).otherwise(1L)).as("n1"),
        sum(when(col("post"), 1L).otherwise(0L)).as("n2"))
    val w = Window.partitionBy("m").orderBy("c")
    val h = hist
      .withColumn("cum1",
        sum("n1").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum2",
        sum("n2").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("gap", lead(col("c"), 1).over(w) - col("c"))
    val tot = hist.groupBy("m")
      .agg(sum("n1").as("n1t"), sum("n2").as("n2t"))
      .filter(col("n1t") > 0 && col("n2t") > 0)
    // terms aggregate separately and LEFT-join back onto the totals: a
    // single-cell histogram has no interior gap terms at all, and the
    // metric must still report W1 = 0, not vanish
    val terms = h.join(tot, "m")
      .filter(col("gap").isNotNull)
      .groupBy("m")
      .agg(sum(abs(dec(col("cum1")) * dec(col("n2t"))
        - dec(col("cum2")) * dec(col("n1t"))) * dec(col("gap")))
        .as("num"))
    tot.join(terms, Seq("m"), "left")
      .select(col("m").as(typeCol), col("n1t").as("n_pre"),
        col("n2t").as("n_post"),
        coalesce(TextOps.floorDivDec(col("num") * lit(1000000),
          dec(col("n1t")) * dec(col("n2t")) * lit(100))
          .cast("long"), lit(0L)).as("emd_micro"))
      .withColumn("emd", TextOps.round6(col("emd_micro") / 1e6))
      .orderBy(typeCol)
  }

  /** Off-policy evaluation (X261; Horvitz–Thompson / Li et al.
    * WSDM'11 lineage): estimate what a NEW deterministic policy would
    * have earned from a logged (context, action, reward) stream —
    * the counterfactual readout behind every "should we switch the
    * recommender" decision, without running the new policy.
    *
    * Construction (all from the log, all deterministic):
    *  - context = day-of-week, action = event type, reward = value in
    *    exact micro;
    *  - the TARGET policy is learned greedily on the TRAIN half of a
    *    time split (argmax train mean reward per context, mean
    *    micro-floored once, tiebreak action ASC via a rank window) —
    *    the evaluation half never touches policy selection (the
    *    X83/X187 split discipline);
    *  - Direct Method: the train-model mean of the chosen action,
    *    re-weighted by the EVAL context distribution;
    *  - IPS: Σ 1[a_i = π(x_i)]·r_i/p̂(a_i|x_i) / n over the eval
    *    half, with propensities p̂ = n_xa/n_x estimated on the TRAIN
    *    half — the logging-model discipline (a propensity model fit
    *    on separate data). Estimating p̂ on the eval half itself is
    *    the REJECTED spelling: the weights then telescope per context
    *    (n_xa rows × n_x/n_xa = n_x) and "IPS" collapses to the
    *    plug-in matched mean while SNIPS ≡ IPS exactly — machinery
    *    with no content. With train propensities, each context cell's
    *    matching rows share ONE weight, so both sums stay single
    *    exact integer divisions per cell:
    *    ips_term = trunc(S^ev_match·n^tr_x / n^tr_xa), and the SNIPS
    *    weight mass w_term = ⌊n^ev_match·n^tr_x·10⁶ / n^tr_xa⌋.
    *    Every division whose numerator carries a REWARD sum (train
    *    means, ips_term, the snips/dm/ips/dr rollups) is the
    *    toward-zero [[TextOps.truncDivDec]] — rewards may be negative
    *    and DuckDB's `//` truncates toward zero; only the count-only
    *    w_term keeps the floor spelling (counts are nonnegative,
    *    where floor ≡ trunc).
    *  - SNIPS: Σ w·r / Σ w — the self-normalized variant that trades
    *    IPS's unbiasedness for bounded variance when train and eval
    *    action mixes drift.
    *  - Doubly robust (X265; Dudík et al. ICML'11): DM plus the
    *    IPS-weighted RESIDUAL correction — per context,
    *    dr_total = n_ctx·q̂ + ⌊(S_match − n_match·q̂)·n^tr_x / n^tr_xa⌋
    *    with q̂ = the train-model mean the DM column already carries.
    *    Unbiased if EITHER the model or the propensities are right;
    *    residuals can be negative, so the division is the
    *    toward-zero [[TextOps.truncDivDec]] (DuckDB `//` semantics),
    *    not the floor variant.
    *
    * The DM-vs-IPS gap per context is the model-misfit/winner's-curse
    * readout: DM trusts train means (the argmax's own selection
    * noise), IPS trusts only logged eval rewards the target policy
    * would have kept.
    *
    * Scale: one combine agg per half to the ≤|contexts|×|actions|
    * cell table; the policy argmax, propensities, and all three
    * estimators run on that metadata. Output: one row per context
    * plus `__ALL__`, ordered by context.
    */
  def offPolicyValue(events: DataFrame, tsCol: String, actionCol: String,
      valueCol: String, splitDate: String): DataFrame = {
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val base = events
      .filter(col(actionCol).isNotNull && col(valueCol).isNotNull)
      .select(dayofweek(col(tsCol)).as("ctx"), col(actionCol).as("act"),
        floor(col(valueCol) * 1000000 + 0.5).cast("long").as("r"),
        (col(tsCol) >= lit(splitDate).cast("timestamp")).as("eval"))
    val cells = base.groupBy("ctx", "act", "eval")
      .agg(count(lit(1)).as("n"), sum("r").as("s"))
      .localCheckpoint(eager = true)
    // target policy from TRAIN cells: argmax micro-floored mean; the
    // chosen cell's own count is the propensity numerator n^tr_xa
    val byCtx = Window.partitionBy("ctx")
      .orderBy(col("mean_micro").desc, col("act"))
    val pi = cells.filter(!col("eval"))
      .withColumn("mean_micro",
        TextOps.truncDivDec(dec(col("s")), dec(col("n"))).cast("long"))
      .withColumn("_rn", row_number().over(byCtx))
      .filter(col("_rn") === 1)
      .select(col("ctx"), col("act").as("pi_act"),
        col("mean_micro").as("dm_micro"), col("n").as("n_tr_match"))
    val trainTot = cells.filter(!col("eval")).groupBy("ctx")
      .agg(sum("n").as("n_tr_ctx"))
    // eval-half cells + context totals
    val ev = cells.filter(col("eval"))
    val ctxTot = ev.groupBy("ctx").agg(sum("n").as("n_ctx"))
    val perCtx = pi
      .join(trainTot, "ctx")
      .join(ctxTot, "ctx")
      .join(ev.select(col("ctx"), col("act").as("pi_act"),
        col("n").as("n_match"), col("s").as("s_match")),
        Seq("ctx", "pi_act"), "left")
      .select(col("ctx"), col("pi_act"), col("n_ctx"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        col("dm_micro"),
        coalesce(TextOps.truncDivDec(
          dec(col("s_match")) * dec(col("n_tr_ctx")),
          dec(col("n_tr_match"))).cast("long"), lit(0L)).as("ips_term"),
        coalesce(TextOps.floorDivDec(
          dec(col("n_match")) * dec(col("n_tr_ctx")) * lit(1000000),
          dec(col("n_tr_match"))).cast("long"), lit(0L)).as("w_term"),
        // DR context total: n_ctx·q̂ + truncated residual correction
        (col("n_ctx") * col("dm_micro")
          + coalesce(TextOps.truncDivDec(
            (dec(col("s_match")) - dec(col("n_match")) * col("dm_micro"))
              * dec(col("n_tr_ctx")),
            dec(col("n_tr_match"))).cast("long"), lit(0L))).as("dr_total"))
      .localCheckpoint(eager = true) // consumed per-row and by the rollup
    def snips(ipsNum: Column, wSum: Column): Column =
      when(wSum > 0, TextOps.truncDivDec(dec(ipsNum) * lit(1000000),
        dec(wSum)).cast("long")).otherwise(lit(0L))
    val all = perCtx.agg(sum("n_ctx").as("n_eval"),
        sum("n_match").as("n_match"),
        sum(dec(col("n_ctx")) * dec(col("dm_micro"))).as("dm_num"),
        sum(col("ips_term")).as("ips_num"), sum(col("w_term")).as("w_sum"),
        sum(col("dr_total")).as("dr_num"))
      .select(lit("__ALL__").as("context"), lit("-").as("pi_action"),
        col("n_eval"), col("n_match"),
        TextOps.truncDivDec(col("dm_num"), dec(col("n_eval")))
          .cast("long").as("dm_micro"),
        TextOps.truncDivDec(dec(col("ips_num")), dec(col("n_eval")))
          .cast("long").as("ips_micro"),
        snips(col("ips_num"), col("w_sum")).as("snips_micro"),
        TextOps.truncDivDec(dec(col("dr_num")), dec(col("n_eval")))
          .cast("long").as("dr_micro"))
    val per = perCtx.select(col("ctx").cast("string").as("context"),
      col("pi_act").as("pi_action"), col("n_ctx").as("n_eval"),
      col("n_match"), col("dm_micro"),
      TextOps.truncDivDec(dec(col("ips_term")), dec(col("n_ctx")))
        .cast("long").as("ips_micro"),
      snips(col("ips_term"), col("w_term")).as("snips_micro"),
      TextOps.truncDivDec(dec(col("dr_total")), dec(col("n_ctx")))
        .cast("long").as("dr_micro"))
    per.unionAll(all).orderBy("context")
  }

  /** RFM quintile segmentation (Hughes 1994, the direct-marketing
    * classic) over an order log — per customer: Recency (days since
    * last order, measured against the corpus max date), Frequency
    * (order count), Monetary (exact cents total), each scored 1–5 by
    * corpus quintile, customers rolled up to the ≤125 (R,F,M)
    * segments a campaign plan reads (X260).
    *
    * Sort-free order statistics: each dimension's four quintile
    * boundaries come from its VALUE HISTOGRAM — boundary t_q = the
    * smallest value whose cumulative count covers ⌈q·n/5⌉, cleared to
    * the integer cross-multiplication 5·cum ≥ q·n (the X218/X226
    * no-corpus-sort argument). Scores are then VALUE-based membership
    * (1 + #{t_q below}; the WoE/X143 rule) so equal values share a
    * score regardless of partition order — an ntile spelling would
    * tie-break per engine and was rejected. Recency inverts (6 − s)
    * so 5 always reads "best". Monetary histogram cells are
    * `mBinDiv`-cent bins (score bands, the credit-scoring practice)
    * — per-customer money SUMS have no bounded natural domain, the
    * binning restores the histogram-size argument; R and F are
    * day/count domains, bounded as-is.
    *
    * Scale: one combine agg to |customers| rows, three histogram
    * combine aggs + metadata windows for the boundaries (each
    * broadcast back as a 1-row array), one combine agg to the
    * segment cells. Exact integers end to end; the only doubles are
    * the round6 display averages.
    *
    * Output: (r_score, f_score, m_score, n_customers, f_total,
    * m_cents_total, avg_orders, avg_m), ordered by the three scores.
    */
  def rfmSegments(orders: DataFrame, custCol: String, tsCol: String,
      valueCol: String, mBinDiv: Long = 1000L): DataFrame = {
    require(mBinDiv >= 1, s"mBinDiv ($mBinDiv) must be >= 1")
    val per = orders
      .filter(col(custCol).isNotNull && col(tsCol).isNotNull
        && col(valueCol).isNotNull)
      .groupBy(col(custCol).as("cust"))
      .agg(max(to_date(col(tsCol))).as("last_day"),
        count(lit(1)).as("f"),
        sum(floor(col(valueCol) * 100 + 0.5).cast("long")).as("m_cents"))
    val maxd = per.agg(max("last_day").as("d_max"))
    val rfm = per.crossJoin(broadcast(maxd))
      .select(col("cust"),
        datediff(col("d_max"), col("last_day")).cast("long").as("r_days"),
        col("f"), col("m_cents"),
        expr(s"m_cents DIV $mBinDiv").as("m_bin"))
      .localCheckpoint(eager = true) // 3 histogram consumers + scoring
    // quintile boundaries of one dimension as a sorted 4-element array
    def bounds(dim: String): DataFrame = {
      val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
      val hist = rfm.groupBy(col(dim).as("v")).agg(count(lit(1)).as("n"))
      val cum = hist.withColumn("cum", sum("n").over(w))
        .crossJoin(broadcast(hist.agg(sum("n").as("nt"))))
      cum.crossJoin(
          rfm.sparkSession.sql("SELECT * FROM VALUES (1),(2),(3),(4) t(q)"))
        .filter(col("cum") * 5 >= col("q") * col("nt"))
        .groupBy("q").agg(min("v").as("t"))
        .agg(array_sort(collect_list(col("t"))).as(s"arr_$dim"))
    }
    def score(v: Column, arr: Column): Column =
      lit(1) + size(filter(arr, t => v > t))
    val scored = rfm
      .crossJoin(broadcast(bounds("r_days")))
      .crossJoin(broadcast(bounds("f")))
      .crossJoin(broadcast(bounds("m_bin")))
      .select(col("cust"), col("f"), col("m_cents"),
        (lit(6) - score(col("r_days"), col("arr_r_days"))).as("r_score"),
        score(col("f"), col("arr_f")).as("f_score"),
        score(col("m_bin"), col("arr_m_bin")).as("m_score"))
    scored.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"), sum("f").as("f_total"),
        sum("m_cents").as("m_cents_total"))
      .select(col("r_score"), col("f_score"), col("m_score"),
        col("n_customers"), col("f_total"), col("m_cents_total"),
        TextOps.round6(col("f_total") / col("n_customers").cast("double"))
          .as("avg_orders"),
        TextOps.round6(col("m_cents_total")
          / (col("n_customers") * 100).cast("double")).as("avg_m"))
      .orderBy("r_score", "f_score", "m_score")
  }
}
