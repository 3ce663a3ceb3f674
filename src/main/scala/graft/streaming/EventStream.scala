package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event operators: the SAME windowed
  * aggregation expressions as [[graft.llm.EventOps]] composed with a
  * watermark (`readStream` → these transforms → `writeStream`), plus a
  * custom-state sessionizer via `flatMapGroupsWithState`.
  *
  * Scale/streaming design:
  *  - the tumbling/sliding aggregations are incremental: state is one row
  *    per open (window, event_type); the watermark bounds state size and
  *    admits late data up to the delay;
  *  - sessionization keys state by user_id; sessions close either by an
  *    in-batch gap or by event-time timeout when the watermark passes
  *    last-seen + gap — so state is dropped deterministically, never
  *    accumulated forever (the 100 TB failure mode of naive streaming
  *    joins).
  */
object EventStream extends Serializable {

  /** Epoch MICROseconds of a Timestamp — `getTime` alone floors to
    * milliseconds, and the events feed carries µs precision, so
    * gap/ordering decisions made at ms grain could disagree with the
    * batch operators' (and the oracle's) µs-exact comparisons on
    * boundary rows.
    */
  private[graft] def tsMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private[graft] def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Tumbling event-time window counts with a watermark — streamable
    * as-is (`outputMode("update")` or append after the watermark). The
    * value sum is [[graft.llm.EventOps.centsSum]] — integer cents, so
    * the result is bit-identical to the batch operator and the oracle
    * regardless of partitioning or batch boundaries (a raw double sum
    * is merge-order-dependent).
    */
  def tumblingCounts(events: DataFrame, width: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.llm.EventOps.centsSum(col("value")).as("value_sum"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("value_sum"))

  /** Daily approximate distinct users through a KMV sketch aggregate —
    * streaming COUNT DISTINCT with BOUNDED state.
    *
    * Exact streaming distinct keeps every key seen per window in the
    * state store: O(distinct users) per open window, the state-blowup
    * failure mode for high-cardinality keys at 100 TB. The KMV
    * aggregate (`bottomk_distinct_long`, a TypedImperativeAggregate —
    * the same buffer-serialization contract approx_count_distinct uses
    * in streaming) caps each window's state at k longs (~0.5 KB at
    * k=64) no matter how many users arrive, and unlike HLL the sketch
    * is ENGINE-INDEPENDENT: the emitted estimate is a pure function of
    * the window's user SET, so the DuckDB oracle replays the exact
    * values and streaming ≡ batch is hash-provable even for the
    * approximation. Windows whose distinct-hash set fits the sketch
    * (size < k) report exactly.
    *
    * Sentinel handling is deliberately FILTER-FREE: a `filter` between
    * `withWatermark` and the aggregation can be pushed below the
    * watermark node by the optimizer, and then the harness's far-future
    * flush rows never advance the watermark and the final windows never
    * close (observed: the last replay day went missing). Instead the
    * sentinel's hash is NULLed inside the aggregate input (null inputs
    * are skipped by the sketch) and the event count is conditional —
    * the sentinel still drives the watermark, lands in its own
    * never-finalized far-future window, and touches no real window's
    * state.
    */
  def kmvDailyUsers(events: DataFrame, watermarkDelay: String, k: Int): DataFrame = {
    val pow = s"cast(${k - 1} as double) * cast(1152921504606846976 as double)"
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("_uh", expr("cast(case when event_type = '__sentinel' then null " +
        "else conv(substring(md5(concat('kmvu|', " +
        "cast(user_id as string))), 1, 15), 16, 10) end as bigint)"))
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(sum(when(col("event_type") =!= "__sentinel", 1L).otherwise(0L))
          .as("n_events"),
        expr(s"bottomk_distinct_long(_uh, $k)").as("_kmv"))
      .select(col("w.start").as("win_start"), col("n_events"),
        expr(s"case when size(_kmv) < $k then cast(size(_kmv) as bigint) " +
          // clamp before the cast — see llm_kmv_set_ops rationale (ADVICE r9)
          s"else cast(least(floor($pow / cast(element_at(_kmv, $k) as double)), " +
          s"cast(4611686018427387904 as double)) as bigint) end")
          .as("users_est"),
        (size(col("_kmv")) === k).as("sketch_full"))
  }

  /** Count-min sketch maintained AS streaming aggregation state: each
    * event increments `depth` (row, col) cells keyed by independent
    * hashes of its user_id; the streaming `groupBy(window, r, c).count`
    * IS the distributed sketch — cell counters are pure sums, so the
    * merged cross-micro-batch state is bit-identical to the batch
    * sketch of the same multiset (order-insensitivity is what makes
    * the DuckDB oracle able to replay the ESTIMATES exactly, the same
    * property the KMV sketch above exploits for distinct counts).
    *
    * Scale contract: state per daily window is ≤ depth × width cells
    * (1024 longs at 4×256) no matter how many events or distinct users
    * arrive — the point-query answer for ANY key is then min over its
    * `depth` counters, served offline from the emitted cell table.
    * This is the bounded-state alternative to a streaming
    * `groupBy(user)` count whose state grows with key cardinality —
    * the 100 TB failure mode — at the cost of one bounded
    * `explode` (×depth) before the shuffle.
    *
    * Sentinels use the kmvDailyUsers discipline (no filter between
    * watermark and agg — the optimizer can push it below the watermark
    * node and windows never close): the sentinel maps to the single
    * cell (-1, -1), still drives the watermark in its far-future
    * window, and is dropped at readback.
    */
  def cmsDailyCells(events: DataFrame, watermarkDelay: String,
      depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("r"),
        expr(s"cast(conv(substring(md5(concat('cms$r|', " +
          s"cast(user_id as string))), 1, 15), 16, 10) as bigint) % $width")
          .as("c"))
    }
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("_cells",
        when(col("event_type") === "__sentinel",
          array(struct(lit(-1).as("r"), lit(-1L).as("c"))))
          .otherwise(array(cells: _*)))
      .select(col("ts"), explode(col("_cells")).as("cell"))
      .groupBy(window(col("ts"), "1 day").as("w"),
        col("cell.r").as("r"), col("cell.c").as("c"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("r"), col("c"), col("n"))
  }

  /** Fixed-width value histogram as streaming aggregation state — the
    * third bounded-state sketch next to [[kmvDailyUsers]] (distincts)
    * and [[cmsDailyCells]] (per-key counts): what a streaming metrics
    * service maintains to answer latency-quantile queries. State per
    * daily window is ≤ `buckets` cells no matter the traffic (a
    * streaming `percentile` would buffer every value); like the other
    * two, cell counters are pure sums, so the merged cross-micro-batch
    * state — and every quantile READ off it — is bit-identical to the
    * batch histogram of the same multiset and fully oracle-replayable.
    * Values are cent-quantized; the top bucket absorbs the tail
    * (`least(·, buckets−1)`). Quantile extraction happens at readback
    * over the per-day ≤`buckets`-row metadata (integer rank walk +
    * in-bucket interpolation, all `DIV` arithmetic).
    *
    * Sentinel discipline as in [[kmvDailyUsers]]: no filter between
    * watermark and agg; the sentinel maps to bucket −1, drives the
    * watermark from its far-future window, and drops at readback.
    */
  def valueHistDailyCells(events: DataFrame, watermarkDelay: String,
      widthCents: Long, buckets: Int): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("_b",
        when(col("event_type") === "__sentinel", lit(-1L))
          .otherwise(least(
            expr(s"CAST(floor(value * 100 + 0.5) AS BIGINT) DIV $widthCents"),
            lit(buckets - 1L))))
      .groupBy(window(col("ts"), "1 day").as("w"), col("_b").as("b"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("b"), col("n"))

  /** Deterministic bottom-k priority sample of DISTINCT users per daily
    * window — the fourth bounded-state streaming sketch next to
    * [[kmvDailyUsers]] (cardinality), [[cmsDailyCells]] (counts) and
    * [[valueHistDailyCells]] (quantiles): those answer "how many";
    * this yields MEMBERS — "give me 64 uniform random users from
    * today to spot-check" — with O(k) state per window no matter the
    * traffic.
    *
    * The trick that keeps it one bottomk_distinct_long aggregation:
    * each user packs into ONE long as `md5₃₆(user) · 2²⁴ + user_id`
    * — ordering is by the 36-bit hash first (uniform priority;
    * identical users collide to the identical packed value, so the
    * distinct-k set IS a without-replacement user sample), and the id
    * rides in the low 24 bits for exact recovery at readback (ids ≥
    * 2²⁴ raise, loudly — the pack range is a contract, not a
    * truncation). Bottom-k sets are mergeable (min-k of union =
    * min-k of min-ks, order-insensitive), so merged cross-micro-batch
    * state ≡ the batch sample of the same set, bit for bit — what
    * makes the per-member output oracle-replayable at all.
    *
    * Sentinel discipline as in [[kmvDailyUsers]]: sentinel → null
    * (skipped by the agg), no filter between watermark and agg.
    *
    * Output: (win_start, sample) with the ascending packed array;
    * callers unpack `rank = pos+1, user_id = v % 2²⁴`.
    */
  def prioritySampleDaily(events: DataFrame, watermarkDelay: String,
      k: Int): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("_pk", expr(
        "cast(case when event_type = '__sentinel' then null " +
        "when user_id < 0 or user_id >= 16777216 then " +
        "raise_error('prioritySampleDaily: user_id outside 24-bit pack range') " +
        "else conv(substring(md5(concat('psamp|', cast(user_id as string))), " +
        "1, 9), 16, 10) * 16777216 + user_id end as bigint)"))
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(expr(s"bottomk_distinct_long(_pk, $k)").as("sample"))
      .select(col("w.start").as("win_start"), col("sample"))

  /** Stream-stream click attribution: join each click to the views by
    * the SAME user that happened within `horizon` BEFORE it — the
    * canonical two-stream event-time join. Both inputs need
    * (user_id, ts, event_id).
    *
    * The time-range predicate is load-bearing for scale: with both
    * sides watermarked AND the join condition bounding click_ts to
    * [view_ts, view_ts + horizon], Structured Streaming can evict a
    * buffered view once the watermark passes view_ts + horizon and a
    * buffered click once it passes click_ts — state stays
    * O(traffic × horizon), not unbounded. An equality-only stream-
    * stream join (no range bound) buffers both streams FOREVER — the
    * 100 TB failure mode this operator exists to avoid.
    */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
      horizon: String, watermarkDelay: String): DataFrame = {
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    c.join(v,
      expr(s"user_id = v_user AND click_ts >= view_ts" +
        s" AND click_ts <= view_ts + interval $horizon"))
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /** Unattributed views: stream-stream LEFT OUTER event-time join — the
    * complement feed of [[attributeClicks]] (views that got NO click
    * within the horizon), which is what retargeting/abandonment
    * pipelines consume.
    *
    * Outer semantics are where stream-stream joins earn their state
    * machinery: a view cannot be declared click-less until the
    * watermark has passed `view_ts + horizon` (only then is "no
    * matching click will ever arrive" provable), so NULL-padded rows
    * emit on WATERMARK EXPIRY, not on arrival. The same range bound
    * that makes eviction possible makes the outer emission sound — an
    * unbounded outer join would never be allowed to emit (or evict)
    * anything. View side is the preserved (left) side.
    */
  def unattributedViews(views: DataFrame, clicks: DataFrame,
      horizon: String, watermarkDelay: String): DataFrame = {
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    v.join(c,
      expr(s"user_id = c_user AND click_ts >= view_ts" +
        s" AND click_ts <= view_ts + interval $horizon"),
      "left_outer")
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("click_id"))
  }

  /** `lastTs` is event-time epoch MICROS (see [[tsMicros]]). */
  final case class FunnelState(step: Int, lastTs: Long)
  final case class FunnelOut(
      user_id: Long,
      steps_completed: Int,
      completed: Boolean,
      last_ts: Timestamp)

  /** Streaming conversion funnel — the stateful form of
    * [[graft.llm.EventOps.funnel]]'s strict-order semantics: each user's
    * state is the furthest funnel step reached; an event advances it
    * only when it matches the NEXT expected step (out-of-order arrivals
    * of later steps are ignored, same as the batch operator's ordering
    * constraint on in-order feeds). A user that completes the final
    * step emits immediately and drops state; a user idle past
    * `idleMinutes` (by EVENT time, armed against the watermark) emits
    * partial progress and drops state — so state is one small record
    * per user currently IN the funnel, never the event history and
    * never forever (the unbounded-state failure mode).
    *
    * Input: (user_id, ts, event_type) with a watermark already applied.
    */
  def funnelProgress(
      events: Dataset[(Long, Timestamp, String)],
      steps: Seq[String],
      idleMinutes: Int): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "steps must be non-empty")
    val idleMicros = idleMinutes * 60L * 1000000L
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, String)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(s => FunnelOut(user, s.step, completed = false,
                microsTs(s.lastTs))).toList
            state.remove()
            out.iterator
          } else {
            var s = state.getOption.getOrElse(FunnelState(0, 0L))
            // STRICTLY-after advance (ts > lastTs) matches the batch
            // cascade's `min(ts > t_prev)` exactly: an event carrying the
            // SAME event time as the one that advanced the previous step
            // does not count, no matter the processing order.
            rows.toSeq.sortBy(r => tsMicros(r._2)).foreach { case (_, ts, et) =>
              val us = tsMicros(ts)
              if (s.step < steps.length && et == steps(s.step) &&
                  (s.step == 0 || us > s.lastTs))
                s = FunnelState(s.step + 1, us)
            }
            if (s.step >= steps.length) {
              state.remove()
              Iterator.single(
                FunnelOut(user, s.step, completed = true, microsTs(s.lastTs)))
            } else if (s.step > 0) {
              state.update(s)
              state.setTimeoutTimestamp(Math.floorDiv(s.lastTs + idleMicros, 1000L) + 1L)
              Iterator.empty
            } else Iterator.empty
          }
      }
  }

  /** `start`/`last` are event-time epoch MICROS; `valueCents` is the
    * exact integer-cents running sum (a double accumulator would make
    * the emitted sum depend on batch boundaries and merge order — the
    * same failure [[graft.llm.EventOps.centsSum]] exists to prevent).
    */
  final case class SessionState(start: Long, last: Long, n: Long, valueCents: Long)
  final case class SessionOut(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      value_sum: Double)

  /** Gap-based streaming sessionization: one state entry per live user,
    * closed by an observed gap or by event-time timeout once the
    * watermark passes (last event + gap). Batch semantics match
    * [[graft.llm.EventOps.sessionize]] for in-order feeds: gap
    * comparisons run on epoch micros (full event-time precision) and
    * the value sum accumulates integer cents, so a session's row is
    * byte-identical to the batch operator's for the same events.
    *
    * Input needs columns (user_id long, ts timestamp, value double) and a
    * watermark already applied when used in a stream.
    */
  def sessionize(
      events: Dataset[(Long, Timestamp, Double)],
      gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

    def close(user: Long, s: SessionState): SessionOut =
      SessionOut(user, microsTs(s.start), microsTs(s.last), s.n, s.valueCents / 100.0)

    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, Double)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: emit + drop
            val out = state.getOption.map(close(user, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(r => tsMicros(r._2))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { case (_, ts, v) =>
              val t = tsMicros(ts)
              cur match {
                case Some(s) if t - s.last <= gapMicros =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1,
                    s.valueCents + cents(v)))
                case Some(s) =>
                  closed ::= close(user, s)
                  cur = Some(SessionState(t, t, 1L, cents(v)))
                case None =>
                  cur = Some(SessionState(t, t, 1L, cents(v)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(Math.floorDiv(s.last + gapMicros, 1000L) + 1L)
            }
            closed.reverse.iterator
          }
      }
  }

  /** Streaming tabular CUSUM monitor (X297) — the streaming form of
    * [[graft.llm.EventOps.cusumTabular]], composed on the maintained-
    * state foreachBatch pattern: per micro-batch, daily cents totals
    * aggregate DISTRIBUTED (one combine agg), and the sequential S±
    * fold runs per type INSIDE a flatMap on executors (r12: the
    * former driver-side fold collected the calendar-sized series —
    * bounded, but still a driver loop; now nothing event- or
    * calendar-sized ever reaches the driver, and types fold in
    * parallel). The recursion
    * S⁺_d = max(0, S⁺_{d−1} + y_d·10⁶ − (μ0+k)) is carried ACROSS
    * batches in a tiny state table, so each batch does O(new days)
    * work — the true monitoring deployment shape, where the batch
    * operator's closed form would re-scan history every day.
    *
    * Baseline discipline: μ0 fixes after the first `baseDays` CLOSED
    * days; earlier days are buffered in state and emitted (replayed
    * through the fold) the moment the baseline completes, so the
    * emitted stream is row-identical to the batch operator. Absent
    * (type, day) cells are real zero observations: each batch
    * advances a dense day range `lastDay+1 .. batchMax` for every
    * known type (a type first seen later backfills zeros from the
    * global min day). Batches must arrive in event-time order with
    * day-aligned boundaries — the replay harness contract.
    *
    * Output rows append to `outDir`: (event_type, day, y,
    * cusum_high_micro, cusum_low_micro, alarm_high, alarm_low).
    */
  /** Per-type fold input: the type's carried state (None for a type
    * first seen this batch), its buffered pre-baseline days, its batch
    * day series, the global metadata (last/min day from the state), and
    * the batch's day range — everything one executor task needs to walk
    * the type's dense day range. All fields are calendar-bounded. */
  private[graft] case class CusumFoldIn(
      event_type: String, n_closed: Option[Int], base_sum: Option[Long],
      s_hi: Option[Long], s_lo: Option[Long],
      g_last: Option[String], g_min: Option[String],
      ds: Option[Seq[(String, Long)]], bs: Option[Seq[(String, Long)]],
      bmin: String, bmax: String)

  /** Tagged fold output: kind "o" = emitted monitor row, "s" = the
    * type's new state row, "b" = a buffered pre-baseline day. One
    * flatMap emission feeds all three sinks. */
  private[graft] case class CusumFoldOut(
      kind: String, event_type: String, day: String, y: Long,
      hi: Long, lo: Long, alarm_hi: Boolean, alarm_lo: Boolean,
      n_closed: Int, base_sum: Long, s_hi: Long, s_lo: Long,
      last_day: String, min_day: String)

  /** The sequential S± walk for ONE event type — runs on an executor
    * inside the fold flatMap, never on the driver. Mirrors
    * [[graft.llm.EventOps.cusumTabular]]'s semantics exactly: first
    * `baseDays` CLOSED days freeze the baseline (earlier days buffer
    * and replay through the fold the moment it completes); absent
    * days in the dense range are real zero observations. */
  private[graft] def cusumFoldType(in: CusumFoldIn, baseDays: Int,
      kPermille: Long, hPermille: Long): Seq[CusumFoldOut] = {
    import java.time.LocalDate
    val known = in.n_closed.isDefined
    var nc = in.n_closed.getOrElse(0)
    var baseSum = in.base_sum.getOrElse(0L)
    var sHi = in.s_hi.getOrElse(0L)
    var sLo = in.s_lo.getOrElse(0L)
    var b = in.bs.getOrElse(Seq.empty).sortBy(_._1).toVector
    val byDay = in.ds.getOrElse(Seq.empty).toMap
    val minDay = in.g_min.getOrElse(in.bmin)
    val rangeStart = in.g_last
      .map(l => LocalDate.parse(l).plusDays(1))
      .getOrElse(LocalDate.parse(in.bmin))
    val rangeEnd = LocalDate.parse(in.bmax)
    val out = Seq.newBuilder[CusumFoldOut]
    def emit(day: String, y: Long): Unit = {
      // baseline is complete here, so mu0/k/h derive from the frozen sum
      val mu0 = baseSum * 1000000L / baseDays
      val k = mu0 * kPermille / 1000L
      val h = mu0 * hPermille / 1000L
      val nHi = math.max(0L, sHi + y * 1000000L - (mu0 + k))
      val nLo = math.max(0L, sLo + (mu0 - k) - y * 1000000L)
      out += CusumFoldOut("o", in.event_type, day, y, nHi, nLo,
        nHi > h, nLo > h, 0, 0L, 0L, 0L, "", "")
      sHi = nHi; sLo = nLo
    }
    // a type first seen now backfills zeros from the corpus min day
    var d = if (known) rangeStart else LocalDate.parse(minDay)
    while (!d.isAfter(rangeEnd)) {
      val day = d.toString
      val y = byDay.getOrElse(day, 0L)
      if (nc < baseDays) {
        b = b :+ ((day, y)); baseSum += y; nc += 1
        if (nc == baseDays) {
          // baseline complete: replay the buffer through the fold
          b.foreach { case (bd, by) => emit(bd, by) }
          b = Vector.empty
        }
      } else emit(day, y)
      d = d.plusDays(1)
    }
    b.foreach { case (bd, by) =>
      out += CusumFoldOut("b", in.event_type, bd, by, 0L, 0L, false,
        false, 0, 0L, 0L, 0L, "", "")
    }
    out += CusumFoldOut("s", in.event_type, "", 0L, 0L, 0L, false,
      false, nc, baseSum, sHi, sLo, in.bmax, minDay)
    out.result()
  }

  def cusumMonitor(events: DataFrame, stateDir: String, outDir: String,
      baseDays: Int = 7, kPermille: Long = 50L, hPermille: Long = 250L,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w0 = events.writeStream.outputMode("append")
    // A caller-pinned checkpoint makes the monitor RESTARTABLE: a new
    // invocation with the same dir resumes from the offset log, and a
    // batch whose commit marker is missing (crash between the batch's
    // foreachBatch body and the commit write) is REPLAYED. The body
    // below is replay-idempotent: the summary overwrite pins
    // last_day = bmax, so a replayed batch's walk range
    // (last_day+1 .. bmax) is empty — no monitor row re-appends, and
    // the state/buffer rewrites are byte-identical no-ops
    // (StreamCrashRecoverySpec kills the commit marker and proves the
    // restarted stream still hash-matches the batch-mode oracle).
    val w = checkpointDir.fold(w0)(d => w0.option("checkpointLocation", d))
    w
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val sumPath = s"$stateDir/summary"
        val bufPath = s"$stateDir/buffer"
        // ONE distributed combine agg reduces the batch to its
        // calendar-sized daily cells — everything after runs on
        // |types| × |days| metadata, still distributed: the per-type
        // sequential S± walk happens in a flatMap on executors (one
        // task per type group), NOT in a driver-side loop; the only
        // driver action in this path is the boolean isEmpty probe.
        val daily = batch
          .select(col("event_type"),
            to_date(col("ts")).cast("string").as("day"),
            floor(col("value") * 100 + 0.5).cast("long").as("c"))
          .groupBy("event_type", "day").agg(sum("c").as("y"))
          .localCheckpoint(true)
        if (!daily.isEmpty) {
          val havePrev = new java.io.File(sumPath).exists()
          val prev =
            if (havePrev) s.read.parquet(sumPath)
            else s.emptyDataset[(String, Int, Long, Long, Long, String,
              String)].toDF("event_type", "n_closed", "base_sum",
              "s_hi", "s_lo", "last_day", "min_day")
          val prevBuf =
            if (havePrev) s.read.parquet(bufPath)
            else s.emptyDataset[(String, String, Long)]
              .toDF("event_type", "day", "y")
          // global metadata (1 row each, broadcast onto every type):
          // the batch's day range and the state's carried last/min day
          val range = daily
            .agg(min("day").as("bmin"), max("day").as("bmax"))
          val meta = prev
            .agg(max("last_day").as("g_last"), min("min_day").as("g_min"))
          val dSer = daily.groupBy("event_type")
            .agg(collect_list(struct(col("day").as("_1"),
              col("y").as("_2"))).as("ds"))
          val bSer = prevBuf.groupBy("event_type")
            .agg(collect_list(struct(col("day").as("_1"),
              col("y").as("_2"))).as("bs"))
          val types = prev.select("event_type")
            .union(daily.select("event_type")).distinct()
          val folded = types
            .join(prev, Seq("event_type"), "left")
            .join(dSer, Seq("event_type"), "left")
            .join(bSer, Seq("event_type"), "left")
            .crossJoin(broadcast(meta))
            .crossJoin(broadcast(range))
            .select(col("event_type"), col("n_closed"), col("base_sum"),
              col("s_hi"), col("s_lo"), col("g_last"), col("g_min"),
              col("ds"), col("bs"), col("bmin"), col("bmax"))
            .as[CusumFoldIn]
            .flatMap(cusumFoldType(_, baseDays, kPermille, hPermille))
            // materialize BEFORE the writes: the state/buffer
            // overwrites target the very paths the plan reads
            .localCheckpoint(true)
          folded.filter(col("kind") === "o")
            .select(col("event_type"), col("day"), col("y"),
              col("hi").as("cusum_high_micro"),
              col("lo").as("cusum_low_micro"),
              col("alarm_hi").as("alarm_high"),
              col("alarm_lo").as("alarm_low"))
            .coalesce(1).write.mode("append").parquet(outDir)
          folded.filter(col("kind") === "s")
            .select(col("event_type"), col("n_closed"), col("base_sum"),
              col("s_hi"), col("s_lo"), col("last_day"), col("min_day"))
            .coalesce(1).write.mode("overwrite").parquet(sumPath)
          folded.filter(col("kind") === "b")
            .select(col("event_type"), col("day"), col("y"))
            .coalesce(1).write.mode("overwrite").parquet(bufPath)
        }
        ()
      }
      .start()
  }
}
