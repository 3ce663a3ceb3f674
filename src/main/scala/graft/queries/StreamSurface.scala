package graft.queries

import java.io.File
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llm.TextOps
import graft.streaming.{DocStream, EventStream, StreamHarness, UpsertSink}

/** Oracle-grade CORRECTNESS entries for the Structured Streaming surface
  * (X17/X18/X45/X63/X80/X87/X101/X113/X122 — previously unit-only).
  *
  * Each query REPLAYS sf-table data through the real streaming runtime
  * via [[StreamHarness]] (file-source micro-batches in event-time order,
  * watermarks advancing batch by batch, state eviction and event-time
  * timeouts firing), writes the streamed output to parquet, and returns
  * a readback of what was written. The DuckDB oracle recomputes the
  * expected result in SQL from the same tables — so a green row proves
  * the streaming path reproduces the BATCH semantics end-to-end, which
  * is exactly the incremental-build-equals-backfill guarantee a
  * production pipeline needs.
  *
  * Batch boundaries: events replay in six 5-day micro-batches (documents
  * in five doc_id ranges), so sessions/funnels/windows genuinely span
  * batches and cross-batch state is exercised, while per-key event-time
  * order across batches matches the batch operators' ORDER BY — the
  * condition under which streaming ≡ batch holds (late data beyond the
  * watermark is the one divergence streaming permits by design).
  *
  * Determinism notes baked into the ops (not worked around here):
  * sessionize/funnel state carries epoch-MICROS and integer cents;
  * tumbling sums integer cents; funnel advances on STRICTLY-greater
  * event time. Queries whose within-stream dedup keeps "first arrival"
  * (curate, dedupAgainstBase) return arrival-independent projections
  * (the sha + quality, both identical across copies of the same text).
  */
object StreamSurface {

  /** Replay scratch (staged inputs, sink outputs, checkpoints) lives on
    * tmpfs: a replay's wall-clock is dominated by per-trigger commit
    * fsyncs (file-source log, state checkpoint, sink manifest — every
    * micro-batch, every query), which are pure harness overhead and
    * disappear on memory-backed files. Falls back to /tmp when the
    * machine has no /dev/shm. Production checkpoints of course stay on
    * durable storage — this is the REPLAY harness, whose durability
    * story is "restage and rerun".
    */
  private val scratchRoot =
    if (new File("/dev/shm").isDirectory) "/dev/shm/graft_stream"
    else "/tmp/graft_stream"

  private def tmpBase(dir: String, q: String): String =
    s"$scratchRoot/${new File(dir).getName}/$q"

  /** 5-day micro-batches of the events table, in event-time order. The
    * bucket count derives from the table's actual date span (one-row
    * scalar agg — the legitimate collect pattern), so a wider feed can
    * never be silently truncated to a hardcoded window.
    *
    * Batch-count sizing was MEASURED r10, both directions: fewer,
    * larger batches (8-day) cut per-trigger state-commit overhead but
    * made the stream-stream joins SLOWER (9.2 s vs 6.8 s on
    * stream_unattributed) — a range-condition join probes every
    * in-state row per key, so doubling the rows resident per batch
    * grows join work quadratically within the horizon while commits
    * shrink only linearly. 5-day buckets sit on the right side of that
    * trade at replay volume; the real overhead wins were tmpfs scratch
    * and replay-sized state partitioning (StreamHarness).
    */
  private def eventBatches(s: SparkSession, dir: String): Seq[DataFrame] = {
    val ev = Tables.events(s, dir)
    val (lo, hi) = {
      val r = ev.agg(min(to_date(col("ts"))), max(to_date(col("ts")))).head()
      (r.getDate(0), r.getDate(1))
    }
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(lo.toLocalDate, hi.toLocalDate) + 1
    val nBuckets = ((nDays + 4) / 5).toInt
    val bucket = floor(datediff(to_date(col("ts")), lit(lo.toString).cast("date")) / 5)
    (0 until nBuckets).map(i => ev.filter(bucket === i))
  }

  /** One single-row far-future batch: advances the watermark (first
    * sentinel) and then executes under it so timers fire (second).
    * Every column is overridden, types taken from the real frame.
    */
  private def sentinelOf(df: DataFrame, tsLit: String,
      overrides: Map[String, Column]): DataFrame =
    df.limit(1).select(df.schema.fields.map { f =>
      overrides.getOrElse(f.name, lit(null)).cast(f.dataType).as(f.name)
    }: _*)

  private def eventSentinel(ev: DataFrame, tsLit: String): DataFrame =
    sentinelOf(ev, tsLit, Map(
      "event_id" -> lit(-1L), "ts" -> lit(tsLit),
      "user_id" -> lit(-1L), "event_type" -> lit("__sentinel"),
      "value" -> lit(0.0), "props" -> lit("")))

  /** Shared staged-input dirs: the three batch derivations are pure
    * functions of the sf dir, so every query replaying the same shape
    * reads the same staged files (staged once per JVM via
    * [[StreamHarness.stageCached]]). Sharing is safe: the input dir is
    * read-only to the streams and each query's file-source progress
    * lives in its own checkpoint.
    */
  private def stagedEventsWithSentinels(s: SparkSession,
      dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val in = tmpBase(dir, "_in_events_sentinel")
    val schema = StreamHarness.stageCached({
      val ev = Tables.events(s, dir)
      eventBatches(s, dir) ++ Seq(
        eventSentinel(ev, "2030-01-01 00:00:00"),
        eventSentinel(ev, "2030-01-02 00:00:00"))
    }, in)
    (in, schema)
  }

  private def stagedEvents(s: SparkSession,
      dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val in = tmpBase(dir, "_in_events")
    (in, StreamHarness.stageCached(eventBatches(s, dir), in))
  }

  /** Events replay whose two sentinel batches each carry BOTH a "view"
    * and a "click" row (user_id −1): a query that filters the source
    * into separate view/click branches assigns its watermarks AFTER
    * those filters, so a sentinel must survive BOTH filters or the
    * joint watermark (the min across watermark operators) never
    * advances and outer/timeout state never flushes.
    */
  private def stagedEventsWithPairSentinels(s: SparkSession,
      dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val in = tmpBase(dir, "_in_events_pair_sentinel")
    val schema = StreamHarness.stageCached({
      val ev = Tables.events(s, dir)
      def pair(tsLit: String) = sentinelOf(ev, tsLit, Map(
        "event_id" -> lit(-1L), "ts" -> lit(tsLit),
        "user_id" -> lit(-1L), "event_type" -> lit("view"),
        "value" -> lit(0.0), "props" -> lit("")))
        .unionByName(sentinelOf(ev, tsLit, Map(
          "event_id" -> lit(-2L), "ts" -> lit(tsLit),
          "user_id" -> lit(-1L), "event_type" -> lit("click"),
          "value" -> lit(0.0), "props" -> lit(""))))
      eventBatches(s, dir) ++ Seq(
        pair("2030-01-01 00:00:00"), pair("2030-01-02 00:00:00"))
    }, in)
    (in, schema)
  }

  private def stagedDocs(s: SparkSession,
      dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val in = tmpBase(dir, "_in_docs")
    (in, StreamHarness.stageCached(docBatches(s, dir), in))
  }

  /** Three doc_id-RANGE micro-batches (ascending, so the cross-batch
    * keep-first winner is the global min doc_id — the batch rule). The
    * synthetic ts column exists only to carry the watermark. Three (was
    * five pre-r10) keeps cross-batch dedup state exercised — batch 2's
    * duplicates still probe batch 0/1 state — at the minimum trigger
    * count that still crosses a boundary twice.
    */
  private def docBatches(s: SparkSession, dir: String): Seq[DataFrame] = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"),
        (lit("2024-01-01 00:00:00").cast("timestamp")
          + make_dt_interval(lit(0), lit(0), lit(0), col("doc_id").cast("double"))).as("ts"),
        col("text"))
    val maxId = d.agg(max("doc_id")).head.getLong(0)
    val per = maxId / 3 + 1
    (0 until 3).map(i => d.filter(col("doc_id") >= i * per && col("doc_id") < (i + 1) * per))
  }

  /** docBatches plus the `source` column — its own staging dir so the
    * shared `_in_docs` schema (and every cached consumer) is
    * untouched. Same doc_id-range batch rule. */
  private def stagedDocsWithSource(s: SparkSession,
      dir: String): (String, org.apache.spark.sql.types.StructType) = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"),
        (lit("2024-01-01 00:00:00").cast("timestamp")
          + make_dt_interval(lit(0), lit(0), lit(0),
            col("doc_id").cast("double"))).as("ts"),
        col("text"), col("source"))
    val maxId = d.agg(max("doc_id")).head.getLong(0)
    val per = maxId / 3 + 1
    val batches = (0 until 3).map(i =>
      d.filter(col("doc_id") >= i * per && col("doc_id") < (i + 1) * per))
    val in = tmpBase(dir, "_in_docs_src")
    (in, StreamHarness.stageCached(batches, in))
  }

  private val tsFmt = "yyyy-MM-dd HH:mm:ss"

  // ========================================================================
  // Queries
  // ========================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- X17: tumbling windows as an append-mode stream ------------------
    // Windows finalize only once the watermark passes their end; the two
    // sentinel batches flush the tail. Green ⇒ identical rows to the
    // batch llm_event_windows (same oracle SQL).
    "stream_event_windows" -> ((s, dir) => {
      val base = tmpBase(dir, "windows")
      val (in, schema) = stagedEventsWithSentinels(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        EventStream.tumblingCounts(src, "1 hour", "10 minutes")
      }
      s.read.parquet(s"$base/out")
        .filter(col("event_type") =!= "__sentinel")
        .select(date_format(col("win_start"), tsFmt).as("win_start"),
          col("event_type"), col("n"), col("value_sum"))
        .orderBy("win_start", "event_type")
    }),

    // ---- streaming approximate distinct: KMV state per daily window ------
    // COUNT DISTINCT over an unbounded key space with O(k) state per
    // window (EventStream.kmvDailyUsers). The estimate itself is
    // oracle-checked bit-for-bit — possible only because the KMV sketch
    // is a pure function of each window's user set (the X102-r9
    // property), unlike HLL state. Small days (< k distinct) come back
    // exact; full-sketch days exercise the estimator.
    "stream_kmv_users" -> ((s, dir) => {
      val base = tmpBase(dir, "kmvusers")
      val (in, schema) = stagedEventsWithSentinels(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        EventStream.kmvDailyUsers(src, "10 minutes", k = 64)
      }
      s.read.parquet(s"$base/out")
        .select(date_format(col("win_start"), tsFmt).as("win_start"),
          col("n_events"), col("users_est"), col("sketch_full"))
        .orderBy("win_start")
    }),

    // ---- streaming priority sample: bounded-state member sampling --------
    // The fourth bounded-state sketch yields MEMBERS, not counts: a
    // deterministic without-replacement sample of 64 distinct users
    // per daily window via bottom-k over md5-packed longs (hash in
    // the high bits = uniform priority, user_id in the low 24 = exact
    // recovery). Min-k merge is order-insensitive, so streaming state
    // ≡ the batch sample bit-for-bit — the per-member rows hash-match
    // the batch replay. Sentinel window unpacks to zero rows.
    "stream_priority_sample" -> ((s, dir) => {
      val base = tmpBase(dir, "psamp")
      val (in, schema) = stagedEventsWithSentinels(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        EventStream.prioritySampleDaily(src, "10 minutes", k = 64)
      }
      s.read.parquet(s"$base/out")
        .select(date_format(col("win_start"), tsFmt).as("win_start"),
          posexplode(col("sample")).as(Seq("_pos", "_v")))
        .select(col("win_start"), (col("_pos") + 1).as("rank"),
          (col("_v") % 16777216).as("user_id"))
        .orderBy("win_start", "rank")
    }),

    // ---- streaming count-min sketch: bounded-state per-key counts --------
    // The stream maintains ONLY the depth x width cell table per daily
    // window (EventStream.cmsDailyCells); the per-user point estimates
    // for a fixed 32-user panel are served at readback as min over each
    // user's depth cells (absent cell = 0). Cell counters are pure sums
    // so streaming state == batch sketch bit-for-bit, which is what
    // lets the oracle replay the ESTIMATES, overcounts and all. day_n
    // comes from the sketch itself (row 0 sums to the day's traffic).
    "stream_cms_users" -> ((s, dir) => {
      val depth = 4; val width = 256
      val base = tmpBase(dir, "cmsusers")
      val (in, schema) = stagedEventsWithSentinels(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        EventStream.cmsDailyCells(src, "10 minutes", depth, width)
      }
      val cells = s.read.parquet(s"$base/out").filter(col("r") >= 0)
      val days = cells.select("win_start").distinct()
      val dayN = cells.filter(col("r") === 0)
        .groupBy("win_start").agg(sum("n").cast("long").as("day_n"))
      val panelCells = s.range(0, 32).select(col("id").as("user_id"))
        .select(col("user_id"), explode(array((0 until depth).map { r =>
          struct(lit(r).as("r"),
            expr(s"cast(conv(substring(md5(concat('cms$r|', " +
              s"cast(user_id as string))), 1, 15), 16, 10) as bigint) % $width")
              .as("c"))
        }: _*)).as("cell"))
        .select(col("user_id"), col("cell.r").as("r"), col("cell.c").as("c"))
      // panel x days is model-sized (128 x |days|); the corpus-sized
      // cell table joins it by (win_start, r, c) equi-key.
      days.crossJoin(broadcast(panelCells))
        .join(cells, Seq("win_start", "r", "c"), "left")
        .na.fill(0L, Seq("n"))
        .groupBy("win_start", "user_id").agg(min("n").cast("long").as("est_n"))
        .join(broadcast(dayN), "win_start")
        .select(date_format(col("win_start"), tsFmt).as("win_start"),
          col("user_id"), col("est_n"), col("day_n"),
          TextOps.round6(col("est_n").cast("double") / col("day_n"))
            .as("est_share"))
        .orderBy("win_start", "user_id")
    }),

    // ---- streaming latency quantiles: fixed histogram as agg state -------
    // The third bounded-state streaming sketch (KMV distincts, CMS
    // counts, now quantiles): the stream maintains ONLY the <=64-cell
    // per-day histogram (EventStream.valueHistDailyCells); p50/p95 are
    // extracted at readback by an all-integer rank walk over the
    // per-day metadata. Sums are order-insensitive, so the estimates
    // replay bit-for-bit in the oracle.
    "stream_value_quantiles" -> ((s, dir) => {
      val W = 800L
      val base = tmpBase(dir, "valquant")
      val (in, schema) = stagedEventsWithSentinels(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        EventStream.valueHistDailyCells(src, "10 minutes", W, 64)
      }
      val cells = s.read.parquet(s"$base/out").filter(col("b") >= 0)
      val byB = Window.partitionBy("win_start").orderBy("b")
      val cum = cells
        .withColumn("cum", sum("n").over(byB))
        .withColumn("tot", sum("n").over(Window.partitionBy("win_start")))
      def qext(p: Int) = cum
        .filter(col("cum") >= expr(s"($p * tot + 99) DIV 100"))
        .withColumn("_rn", row_number().over(byB))
        .filter(col("_rn") === 1)
        .select(col("win_start"), col("tot"),
          (col("b") * W + expr(
            s"(((($p * tot + 99) DIV 100) - (cum - n)) * $W) DIV n"))
            .as(s"p${p}_cents"))
      qext(50).join(qext(95).drop("tot"), "win_start")
        .select(date_format(col("win_start"), tsFmt).as("win_start"),
          col("tot").cast("long").as("n_events"),
          col("p50_cents").cast("long"), col("p95_cents").cast("long"))
        .orderBy("win_start")
    }),

    // ---- X45: gap sessionization via flatMapGroupsWithState --------------
    // Sessions close mid-stream by in-batch gap or event-time timeout;
    // the sentinels flush still-open ones. session_idx is re-derived at
    // readback (sessions are disjoint per user, so ordering by start
    // time reproduces the batch index) — the oracle is llm_sessionize's
    // SQL verbatim.
    "stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      val base = tmpBase(dir, "sessionize")
      val (in, schema) = stagedEventsWithSentinels(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        EventStream.sessionize(
          src.withWatermark("ts", "10 minutes")
            .select(col("user_id"), col("ts"), col("value"))
            .as[(Long, java.sql.Timestamp, Double)],
          gapMinutes = 30)
      }
      s.read.parquet(s"$base/out")
        .filter(col("user_id") >= 0)
        .withColumn("session_idx",
          row_number().over(
            Window.partitionBy("user_id").orderBy("session_start")).cast("long"))
        .select(col("user_id"), col("session_idx"), col("n_events"),
          date_format(col("session_start"), tsFmt).as("session_start"),
          date_format(col("session_end"), tsFmt).as("session_end"),
          col("value_sum"))
        .orderBy("user_id", "session_idx")
    }),

    // ---- native session_window: the BUILT-IN session mechanism -----------
    // Same 30-minute gap sessions as stream_sessionize, via Spark's
    // session_window aggregation instead of flatMapGroupsWithState —
    // the two mechanisms the engine offers for the same semantics,
    // both proven against ONE oracle (sessionizeSql). min/max ts
    // inside the agg give exact session bounds (session_window's own
    // `end` is last-event + gap). Merge boundary: session_window
    // merges on a STRICT < gap where the lag rule uses <=; they
    // diverge only at an exactly-30:00.000000 inter-event gap, absent
    // from the data at every sf (checked). Sentinels are their own
    // (negative-user) sessions — different group keys, so no in-agg
    // masking is needed; they still drive the watermark that flushes
    // every real session.
    "stream_session_native" -> ((s, dir) => {
      val base = tmpBase(dir, "sessnative")
      val (in, schema) = stagedEventsWithSentinels(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        src.withWatermark("ts", "10 minutes")
          .groupBy(session_window(col("ts"), "30 minutes").as("w"),
            col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"),
            min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
          .drop("w")
      }
      s.read.parquet(s"$base/out")
        .filter(col("user_id") >= 0)
        .withColumn("session_idx", row_number().over(
          Window.partitionBy("user_id").orderBy("first_ts")).cast("long"))
        .select(col("user_id"), col("session_idx"), col("n_events"),
          date_format(col("first_ts"), tsFmt).as("session_start"),
          date_format(col("last_ts"), tsFmt).as("session_end"),
          (col("cents") / 100.0).as("value_sum"))
        .orderBy("user_id", "session_idx")
    }),

    // ---- X113: stateful conversion funnel ---------------------------------
    // idleMinutes is set beyond the replay's span so no mid-stream
    // timeout fires (the batch cascade has no idle concept); the
    // sentinels flush everyone still in the funnel. A user who COMPLETES
    // mid-stream drops state and may legitimately re-enter — readback
    // keeps each user's FIRST attempt (min last_ts), which is exactly
    // the batch cascade's earliest chain.
    "stream_funnel" -> ((s, dir) => {
      import s.implicits._
      val base = tmpBase(dir, "funnel")
      val (in, schema) = stagedEventsWithSentinels(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        EventStream.funnelProgress(
          src.withWatermark("ts", "10 minutes")
            .select(col("user_id"), col("ts"), col("event_type"))
            .as[(Long, java.sql.Timestamp, String)],
          steps = Seq("view", "click", "purchase"),
          idleMinutes = 200000)
      }
      s.read.parquet(s"$base/out")
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(min_by(
          struct(col("steps_completed"), col("completed"), col("last_ts")),
          col("last_ts")).as("_f"))
        .select(col("user_id"),
          col("_f.steps_completed").as("steps_completed"),
          col("_f.completed").as("completed"),
          date_format(col("_f.last_ts"), tsFmt).as("t_reached"))
        .orderBy("user_id")
    }),

    // ---- X101: stream-stream click attribution ----------------------------
    // Inner event-time range join: pairs emit as both sides arrive, so
    // no sentinel flush is needed; state evicts behind the watermark.
    // Green ⇒ the streamed pair set equals the plain SQL join.
    "stream_click_attribution" -> ((s, dir) => {
      val base = tmpBase(dir, "attrib")
      val (in, schema) = stagedEvents(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        EventStream.attributeClicks(
          src.filter(col("event_type") === "view"),
          src.filter(col("event_type") === "click"),
          horizon = "30 minutes", watermarkDelay = "10 minutes")
      }
      s.read.parquet(s"$base/out")
        .select(col("user_id"), col("click_id"),
          date_format(col("click_ts"), tsFmt).as("click_ts"),
          col("view_id"), date_format(col("view_ts"), tsFmt).as("view_ts"))
        .orderBy("click_id", "view_id")
    }),

    // ---- X131: stream-stream LEFT OUTER join (unattributed views) --------
    // A view is provably click-less only once the watermark passes
    // view_ts + horizon, so NULL-padded rows emit on WATERMARK EXPIRY —
    // the semantics the sentinel pairs exist to flush. Green ⇒ the
    // streamed outer row set (matches on arrival + null-padded views on
    // expiry) equals the plain SQL LEFT JOIN.
    "stream_unattributed" -> ((s, dir) => {
      val base = tmpBase(dir, "unattrib")
      val (in, schema) = stagedEventsWithPairSentinels(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        EventStream.unattributedViews(
          src.filter(col("event_type") === "view"),
          src.filter(col("event_type") === "click"),
          horizon = "30 minutes", watermarkDelay = "10 minutes")
      }
      s.read.parquet(s"$base/out")
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("view_id"),
          date_format(col("view_ts"), tsFmt).as("view_ts"),
          col("click_id"))
        .orderBy("view_id", "click_id")
    }),

    // ---- X63: streaming curation (quality gate + watermarked dedup) ------
    // The within-stream dedup keeps the first ARRIVAL of each sha; the
    // projection is arrival-independent (all copies share text ⇒ sha and
    // quality), so the streamed keep-set is deterministic and equals the
    // batch policy's distinct-sha keep-set.
    "stream_curate" -> ((s, dir) => {
      val base = tmpBase(dir, "curate")
      val (in, schema) = stagedDocs(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        DocStream.curate(src, LlmSurface.stopwords, minQuality = 0.3, "365 days")
          .select("content_sha", "quality")
      }
      s.read.parquet(s"$base/out").orderBy("content_sha")
    }),

    // ---- X80: stateless streaming classifier inference --------------------
    // The map-literal fold (no state, no shuffle) replayed over the real
    // corpus; oracle = the batch llm_classifier SQL verbatim, proving
    // the two inference spellings agree row-for-row through a real
    // streaming run, not just in a unit.
    "stream_classify" -> ((s, dir) => {
      import s.implicits._
      val base = tmpBase(dir, "classify")
      val (in, schema) = stagedDocs(s, dir)
      val wmap = TextOps.hashModelWeights(s, 1024, "wgt")
        .as[(Int, Int)].collect().map { case (b, w) => b -> w.toLong }.toMap
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        DocStream.classify(src, wmap, 1024, "feat")
          .select("doc_id", "n_tokens", "score", "label")
      }
      s.read.parquet(s"$base/out").orderBy("doc_id")
    }),

    // ---- X207: streaming multi-pattern blocklist screen ------------------
    // The Aho–Corasick scan (X199) composed into a micro-batch plan:
    // stateless broadcast-automaton mapPartitions per batch, per-doc hit
    // rows to the sink, aggregated after replay. Green ⇒ identical
    // totals to the batch position-scan oracle — replay order and batch
    // boundaries cannot move a per-doc count.
    "stream_blocklist" -> ((s, dir) => {
      import s.implicits._
      val base = tmpBase(dir, "blocklist")
      val (in, schema) = stagedDocs(s, dir)
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        DocStream.blocklistScreen(src, LlmSurface.BlocklistPanel)
      }
      val pats = broadcast(LlmSurface.BlocklistPanel.zipWithIndex
        .map { case (p, i) => (i, p) }.toDF("pat_id", "pat"))
      s.read.parquet(s"$base/out")
        .join(pats, "pat_id")
        .groupBy("pat")
        .agg(count(lit(1)).as("n_docs"), sum("hits").as("total_hits"))
        .orderBy("pat")
    }),

    // ---- X87: stream dedup against a static base corpus -------------------
    // Stream-static left-anti join (stateless) then within-stream dedup;
    // base = the even-doc_id half's sha table. Projection to the sha
    // keeps the result arrival-independent.
    "stream_dedup_base" -> ((s, dir) => {
      val base = tmpBase(dir, "dedup_base")
      val (in, schema) = stagedDocs(s, dir)
      val baseShas = Tables(s, dir, "documents")
        .filter(col("doc_id") % 2 === 0)
        .select(sha2(col("text"), 256).as("content_sha"))
      StreamHarness.run(s, in, schema, s"$base/out") { src =>
        DocStream.dedupAgainstBase(src, baseShas, "365 days")
          .select("content_sha")
      }
      s.read.parquet(s"$base/out").orderBy("content_sha")
    }),

    // ---- X122: ingest with a growing sha index ----------------------------
    // foreachBatch: within-batch min_by keep-first, anti-join against
    // the index built by all PREVIOUS batches, append novel docs+shas.
    // doc_id-ascending batches make the cross-batch winner the global
    // min doc_id — i.e. the batch keep-first rule, which the oracle
    // recomputes directly.
    "stream_ingest_index" -> ((s, dir) => {
      val base = tmpBase(dir, "ingest")
      val (in, schema) = stagedDocs(s, dir)
      StreamHarness.deleteRecursively(new File(s"$base/corpus"))
      StreamHarness.deleteRecursively(new File(s"$base/index"))
      StreamHarness.runQuery(s, in, schema) { src =>
        DocStream.ingestWithGrowingIndex(src, s"$base/corpus", s"$base/index")
      }
      s.read.parquet(s"$base/corpus")
        .select("doc_id", "content_sha")
        .orderBy("doc_id")
    }),

    // ---- X287: streaming ExactSubstr excision maintenance ------------------
    // The K-gram postings probe (llm_suffix_incremental's machinery)
    // composed with the growing-index foreachBatch pattern: per batch,
    // probe the maintained postings by gram hash, emit newly-duplicated
    // positions (incl. RETROACTIVE flags on earlier batches' positions),
    // append the batch postings. Readback is the stateless islands
    // merge of the accumulated flag set into maximal spans — the oracle
    // is the full-rebuild dup-span algorithm over the whole corpus, so
    // a dropped retro flag, a double emission, or a span fused across a
    // batch boundary all hash-mismatch.
    "stream_suffix_excise" -> ((s, dir) => {
      val base = tmpBase(dir, "suffix_excise")
      val (in, schema) = stagedDocs(s, dir)
      StreamHarness.deleteRecursively(new File(s"$base/postings"))
      StreamHarness.deleteRecursively(new File(s"$base/flags"))
      StreamHarness.runQuery(s, in, schema) { src =>
        DocStream.exciseWithGrowingPostings(
          src.withColumn("text",
            when(col("doc_id") % 25 === 0,
              concat(col("text"), lit(" " + LlmSurface.Boilerplate)))
              .otherwise(col("text"))),
          s"$base/postings", s"$base/flags", spanTokens = 10)
      }
      val byDoc = Window.partitionBy("doc").orderBy("pos")
      s.read.parquet(s"$base/flags")
        .select("doc", "pos").distinct()
        .withColumn("_isl", col("pos") - row_number().over(byDoc))
        .groupBy("doc", "_isl")
        .agg(min("pos").as("span_start"),
          (max("pos") - min("pos") + 10).cast("long").as("span_tokens"))
        .select(col("doc").as("doc_id"), col("span_start"),
          col("span_tokens"))
        .orderBy("doc_id", "span_start")
    }),

    // ---- X331: prequential draft-acceptance maintenance --------------------
    // Test-then-train (Dawid's prequential principle): per batch,
    // score the batch's bigrams against the draft trained on the
    // PREFIX, then merge the batch's counts — the honest out-of-sample
    // acceptance the batch llm_spec_accept's same-corpus fit can only
    // upper-bound. The oracle recomputes each batch's prefix draft
    // directly from the doc_id-range batch rule.
    "stream_spec_accept" -> ((s, dir) => {
      val base = tmpBase(dir, "spec_accept")
      val (in, schema) = stagedDocs(s, dir)
      StreamHarness.deleteRecursively(new File(s"$base/counts"))
      StreamHarness.deleteRecursively(new File(s"$base/out"))
      StreamHarness.runQuery(s, in, schema) { src =>
        DocStream.prequentialSpecAccept(src, s"$base/counts", s"$base/out")
      }
      // distinct folds at-least-once re-emission (identical rows)
      s.read.parquet(s"$base/out").distinct()
        .withColumn("accept_micro",
          when(col("n_bigrams") > 0,
            expr("(n_accepted * 1000000) div n_bigrams")).otherwise(lit(0L)))
        .orderBy("batch_id")
    }),

    // ---- X341: streaming Chao1 vocabulary-saturation monitor ---------------
    // The crawl-scheduler question asked online: after each batch,
    // how much vocabulary does the corpus-so-far still hide? Emits
    // the cumulative Chao1 row per batch (X340 arithmetic over the
    // maintained word-count state); the oracle recomputes each
    // prefix from the doc_id-range batch rule.
    // ---- X362: streaming temperature-mix rebalancer (21st stream query) ---
    // The live mixture desk: every crawl batch merges its per-source
    // token counts into state and re-emits the full alpha={1, 1/2}
    // ppm allocation (each column sums to 1e6 exactly, same
    // largest-remainder order as the batch llm_temperature_mix).
    // Oracle recomputes each prefix from the doc_id-range batch rule.
    "stream_mix_monitor" -> ((s, dir) => {
      val base = tmpBase(dir, "mix_monitor")
      val (in, schema) = stagedDocsWithSource(s, dir)
      StreamHarness.deleteRecursively(new File(s"$base/counts"))
      StreamHarness.deleteRecursively(new File(s"$base/out"))
      StreamHarness.runQuery(s, in, schema) { src =>
        DocStream.mixMonitor(src, s"$base/counts", s"$base/out")
      }
      s.read.parquet(s"$base/out").distinct()
        .orderBy("batch_id", "source")
    }),

    "stream_vocab_saturation" -> ((s, dir) => {
      val base = tmpBase(dir, "vocab_sat")
      val (in, schema) = stagedDocs(s, dir)
      StreamHarness.deleteRecursively(new File(s"$base/counts"))
      StreamHarness.deleteRecursively(new File(s"$base/out"))
      StreamHarness.runQuery(s, in, schema) { src =>
        DocStream.vocabSaturationMonitor(src, s"$base/counts",
          s"$base/out")
      }
      s.read.parquet(s"$base/out").distinct().orderBy("batch_id")
    }),

    // ---- X334: streaming KS distribution-drift monitor ---------------------
    // Batch 0's quality histogram freezes as the reference; every
    // batch emits one exact two-sample KS row against it — the
    // distribution complement to stream_cusum's mean monitor (a
    // quality shift with unchanged mean trips reject_05 here and
    // nothing there). Oracle replays each batch's histogram from the
    // doc_id-range rule through the identical cross-multiplied
    // arithmetic.
    "stream_ks_monitor" -> ((s, dir) => {
      val base = tmpBase(dir, "ks_monitor")
      val (in, schema) = stagedDocs(s, dir)
      StreamHarness.deleteRecursively(new File(s"$base/ref"))
      StreamHarness.deleteRecursively(new File(s"$base/out"))
      StreamHarness.runQuery(s, in, schema) { src =>
        DocStream.ksMonitor(src, s"$base/ref", s"$base/out",
          LlmSurface.stopwords)
      }
      s.read.parquet(s"$base/out").distinct().orderBy("batch_id")
    }),

    // ---- X297: streaming tabular CUSUM monitor -----------------------------
    // The monitoring deployment shape of p_cusum_tabular: per batch,
    // ONE distributed daily combine agg; the calendar-sized series
    // folds through carried (S+, S-) state, with pre-baseline days
    // buffered and replayed the moment the 7-day baseline freezes —
    // so the emitted stream is row-identical to the batch operator
    // (same planted x2 drift, same oracle SQL, hash-proven).
    "stream_cusum" -> ((s, dir) => {
      val base = tmpBase(dir, "cusum")
      val (in, schema) = stagedEvents(s, dir)
      StreamHarness.deleteRecursively(new File(s"$base/state"))
      StreamHarness.deleteRecursively(new File(s"$base/out"))
      StreamHarness.runQuery(s, in, schema) { src =>
        EventStream.cusumMonitor(
          src.withColumn("value",
            when(col("ts") >= lit("2024-01-26").cast("timestamp"),
              col("value") * 2).otherwise(col("value"))),
          s"$base/state", s"$base/out")
      }
      // distinct: the monitor is at-least-once (flags append BEFORE the
      // state overwrite, the exciseWithGrowingPostings crash ordering) —
      // a retried batch re-emits exact-duplicate rows, which this folds
      s.read.parquet(s"$base/out").distinct()
        .orderBy("event_type", "day")
    }),

    // ---- X122b: streaming MERGE into a versioned snapshot ------------------
    // foreachBatch upsert over six event batches; the final snapshot
    // must hold each user's LATEST event (event-time, event_id
    // tie-break) — recomputed by the oracle as one window over the raw
    // table. Reads back through latestVersionDir, i.e. the _SUCCESS-
    // guarded version-selection path is part of what's verified.
    "stream_upsert_snapshot" -> ((s, dir) => {
      val base = tmpBase(dir, "upsert")
      val (in, schema) = stagedEvents(s, dir)
      StreamHarness.deleteRecursively(new File(s"$base/versions"))
      StreamHarness.runQuery(s, in, schema) { src =>
        UpsertSink.runUpsert(src, "user_id", "ts", s"$base/versions")
      }
      val latest = UpsertSink.latestVersionDir(s, s"$base/versions")
        .getOrElse(sys.error("upsert replay published no complete version"))
      s.read.parquet(latest)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), date_format(col("ts"), tsFmt).as("ts"))
        .orderBy("user_id")
    }),

    // ---- X113b: time-travel read of a non-latest snapshot version ----------
    // Reads v3 — the snapshot after micro-batches 0..3 of the 5-day
    // replay, i.e. the first 20 days — and the oracle recomputes
    // latest-per-key over exactly that event-time PREFIX. Green proves
    // each published version is a consistent point-in-time snapshot
    // (the time-travel contract), not just that the final version is
    // right: an off-by-one batch boundary, a merge that leaked later
    // events backward, or a version that merged a partial batch all
    // hash-mismatch here.
    "stream_time_travel" -> ((s, dir) => {
      val base = tmpBase(dir, "timetravel")
      val (in, schema) = stagedEvents(s, dir)
      StreamHarness.deleteRecursively(new File(s"$base/versions"))
      StreamHarness.runQuery(s, in, schema) { src =>
        UpsertSink.runUpsert(src, "user_id", "ts", s"$base/versions")
      }
      // v3 = the first four 5-day batches (20 days) — a PARTIAL
      // point-in-time snapshot probed mid-chain
      val v3 = s"$base/versions/v3"
      require(new File(v3, "_SUCCESS").isFile,
        s"time-travel target $v3 was not published complete")
      s.read.parquet(v3)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), date_format(col("ts"), tsFmt).as("ts"))
        .orderBy("user_id")
    })
  )

  // ========================================================================
  // DuckDB oracles — each recomputes the BATCH semantics from the raw
  // tables; a hash match proves the streaming replay reproduced them.
  // ========================================================================

  private val sessionizeSql = """
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
    """

  def oracleSql: Map[String, String] = Map(

    "stream_event_windows" -> """
      SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 * 1000000 AS BIGINT)),
                      '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type,
             count(*) AS n,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS value_sum
      FROM events
      GROUP BY 1, 2 ORDER BY 1, 2
    """,

    // Batch replay of the daily KMV sketch: k smallest distinct user
    // hashes per UTC day, same estimator arithmetic — bit-equality here
    // proves the STREAMING sketch state (merged across micro-batches)
    // equals the batch sketch of the same set.
    "stream_kmv_users" -> """
      WITH uh AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST('0x' || substr(md5('kmvu|' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        FROM events),
      dh AS (SELECT DISTINCT d, h FROM uh),
      rk AS (SELECT d, h,
                    row_number() OVER (PARTITION BY d ORDER BY h) AS rn
             FROM dh),
      sk AS (SELECT d, list(h ORDER BY h) AS kmv
             FROM rk WHERE rn <= 64 GROUP BY d),
      ev AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n_events
             FROM events GROUP BY 1)
      SELECT strftime(CAST(ev.d AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS win_start,
             ev.n_events,
             CASE WHEN len(kmv) < 64 THEN CAST(len(kmv) AS BIGINT)
                  ELSE CAST(least(floor(CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                                  / CAST(kmv[64] AS DOUBLE)), CAST(4611686018427387904 AS DOUBLE)) AS BIGINT) END AS users_est,
             (len(kmv) = 64) AS sketch_full
      FROM ev JOIN sk ON ev.d = sk.d
      ORDER BY win_start
    """,

    // Batch replay of the daily priority sample: the k smallest
    // distinct packed (hash·2²⁴ + user_id) values per UTC day —
    // bit-equality proves the merged streaming bottom-k state equals
    // the batch sample of the same user set, member by member.
    "stream_priority_sample" -> """
      WITH pk AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST('0x' || substr(md5('psamp|' || CAST(user_id AS VARCHAR)),
                 1, 9) AS BIGINT) * 16777216 + user_id AS v
        FROM events),
      dv AS (SELECT DISTINCT d, v FROM pk),
      rk AS (SELECT d, v,
                    row_number() OVER (PARTITION BY d ORDER BY v) AS rank
             FROM dv)
      SELECT strftime(CAST(d AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS win_start,
             CAST(rank AS INT) AS rank,
             v % 16777216 AS user_id
      FROM rk WHERE rank <= 64
      ORDER BY win_start, rank
    """,

    // Batch replay of the daily count-min sketch: identical per-row
    // hashes, identical cell counts (sums are order-insensitive), so
    // the panel point estimates — including any collision overcounts —
    // match the streaming sketch exactly.
    "stream_cms_users" -> """
      WITH rws AS (SELECT unnest(range(0, 4)) AS r),
      cells AS (
        SELECT CAST(ts AS DATE) AS d, rws.r AS r,
               CAST('0x' || substr(md5('cms' || CAST(rws.r AS VARCHAR) || '|'
                 || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 256 AS c
        FROM events CROSS JOIN rws),
      cc AS (SELECT d, r, c, count(*) AS n FROM cells GROUP BY 1, 2, 3),
      dayn AS (SELECT d, CAST(sum(n) AS BIGINT) AS day_n FROM cc
               WHERE r = 0 GROUP BY 1),
      panel AS (SELECT unnest(range(0, 32)) AS user_id),
      pc AS (
        SELECT panel.user_id, rws.r AS r,
               CAST('0x' || substr(md5('cms' || CAST(rws.r AS VARCHAR) || '|'
                 || CAST(panel.user_id AS VARCHAR)), 1, 15) AS BIGINT) % 256 AS c
        FROM panel CROSS JOIN rws),
      est AS (
        SELECT days.d, pc.user_id,
               CAST(min(coalesce(cc.n, 0)) AS BIGINT) AS est_n
        FROM (SELECT DISTINCT d FROM cc) days
        CROSS JOIN pc
        LEFT JOIN cc ON cc.d = days.d AND cc.r = pc.r AND cc.c = pc.c
        GROUP BY 1, 2)
      SELECT strftime(CAST(est.d AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS win_start,
             est.user_id, est.est_n, dayn.day_n,
             floor(CAST(est.est_n AS DOUBLE) / dayn.day_n * 1000000.0 + 0.5)
               / 1000000.0 AS est_share
      FROM est JOIN dayn ON est.d = dayn.d
      ORDER BY win_start, user_id
    """,

    // Batch replay of the daily value histogram + the identical integer
    // rank walk: sums are order-insensitive, so the streaming cells and
    // every quantile read off them match bit-for-bit.
    "stream_value_quantiles" -> """
      WITH h AS (
        SELECT CAST(ts AS DATE) AS d,
               least(CAST(floor(value * 100 + 0.5) AS BIGINT) // 800, 63) AS b,
               count(*) AS n
        FROM events GROUP BY 1, 2),
      c AS (SELECT d, b, n,
                   sum(n) OVER (PARTITION BY d ORDER BY b) AS cum,
                   sum(n) OVER (PARTITION BY d) AS tot FROM h),
      r50 AS (
        SELECT d, b, n, cum, tot,
               row_number() OVER (PARTITION BY d ORDER BY b) AS rn
        FROM c WHERE cum >= (50 * tot + 99) // 100),
      e50 AS (
        SELECT d, tot,
               b * 800 + (((((50 * tot + 99) // 100)) - (cum - n)) * 800) // n
                 AS p50_cents
        FROM r50 WHERE rn = 1),
      r95 AS (
        SELECT d, b, n, cum, tot,
               row_number() OVER (PARTITION BY d ORDER BY b) AS rn
        FROM c WHERE cum >= (95 * tot + 99) // 100),
      e95 AS (
        SELECT d,
               b * 800 + (((((95 * tot + 99) // 100)) - (cum - n)) * 800) // n
                 AS p95_cents
        FROM r95 WHERE rn = 1)
      SELECT strftime(CAST(e50.d AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
               AS win_start,
             CAST(e50.tot AS BIGINT) AS n_events,
             CAST(p50_cents AS BIGINT) AS p50_cents,
             CAST(p95_cents AS BIGINT) AS p95_cents
      FROM e50 JOIN e95 USING (d)
      ORDER BY win_start
    """,

    "stream_sessionize" -> sessionizeSql,

    // identical sessions from the NATIVE session_window aggregation
    // (strict-< merge vs the lag rule's <= differs only at an exactly
    // 30:00.000000 gap, absent from the data at every sf - checked)
    "stream_session_native" -> sessionizeSql,

    "stream_funnel" -> """
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
             CAST(CASE WHEN t3 IS NOT NULL THEN 3
                       WHEN t2 IS NOT NULL THEN 2
                       ELSE 1 END AS INTEGER) AS steps_completed,
             (t3 IS NOT NULL) AS completed,
             strftime(coalesce(t3, t2, t1), '%Y-%m-%d %H:%M:%S') AS t_reached
      FROM s3 ORDER BY user_id
    """,

    "stream_click_attribution" -> """
      SELECT c.user_id,
             c.event_id AS click_id,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
             v.event_id AS view_id,
             strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
      FROM events c JOIN events v
        ON c.user_id = v.user_id
       AND c.event_type = 'click' AND v.event_type = 'view'
       AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
      ORDER BY click_id, view_id
    """,

    "stream_unattributed" -> """
      SELECT v.user_id,
             v.event_id AS view_id,
             strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
             c.event_id AS click_id
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON v.user_id = c.user_id
       AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
      ORDER BY view_id, click_id
    """,

    "stream_curate" -> s"""
      WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
      q AS (SELECT sha256(text) AS content_sha, ${LlmSurface.qualitySqlCol} AS quality
            FROM d)
      SELECT DISTINCT content_sha, quality
      FROM q WHERE quality >= 0.3
      ORDER BY content_sha
    """,

    // Same independent position-scan algorithm as llm_blocklist's
    // oracle, aggregated per pattern only (batches carry no source).
    "stream_blocklist" -> {
      val patRows = LlmSurface.BlocklistPanel.map(p => s"('$p')").mkString(", ")
      s"""
      WITH pats(pat) AS (VALUES $patRows),
      pos AS (SELECT doc_id, text,
                     unnest(range(1, len(text) + 1)) AS i
              FROM documents),
      hits AS (
        SELECT p.pat, pos.doc_id, count(*) AS hits
        FROM pos, pats p
        WHERE substr(pos.text, CAST(pos.i AS INTEGER), len(p.pat)) = p.pat
        GROUP BY 1, 2)
      SELECT pat, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(hits) AS BIGINT) AS total_hits
      FROM hits GROUP BY pat
      ORDER BY pat
    """
    },

    "stream_classify" -> """
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
      sc AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(c * wt) AS BIGINT) AS st
        FROM fc JOIN m USING (b) GROUP BY doc_id)
      SELECT doc_id, n_tokens,
             floor((st / (n_tokens * 1000.0)) * 1000000.0 + 0.5) / 1000000.0 AS score,
             CASE WHEN st >= 0 THEN 'keep' ELSE 'drop' END AS label
      FROM sc ORDER BY doc_id
    """,

    "stream_dedup_base" -> """
      SELECT DISTINCT sha256(text) AS content_sha
      FROM documents
      WHERE sha256(text) NOT IN
            (SELECT sha256(text) FROM documents WHERE doc_id % 2 = 0)
      ORDER BY content_sha
    """,

    "stream_ingest_index" -> """
      SELECT doc_id, content_sha FROM (
        SELECT doc_id, sha256(text) AS content_sha,
               row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        FROM documents)
      WHERE rn = 1 ORDER BY doc_id
    """,

    // Replays the prequential loop from the doc_id-range batch rule
    // (batch = doc_id // (max(doc_id)//3 + 1)): per batch k >= 1, the
    // draft is the prefix's bigram argmax, acceptance is the batch's
    // joined share; batch 0 is the zero row.
    "stream_spec_accept" -> """
      WITH per AS (SELECT max(doc_id) // 3 + 1 AS p FROM documents),
      tok AS (
        SELECT doc_id, doc_id // p AS b,
               generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents), per),
      big AS MATERIALIZED (
        SELECT b, prev, w FROM (
          SELECT b, w, lag(w) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS prev
          FROM tok)
        WHERE prev IS NOT NULL),
      d1 AS (
        SELECT prev, w AS guess FROM (
          SELECT prev, w, row_number() OVER (PARTITION BY prev
                   ORDER BY count(*) DESC, w) AS rn
          FROM big WHERE b < 1 GROUP BY prev, w) WHERE rn = 1),
      a1 AS (
        SELECT count(*) AS n,
               coalesce(sum(CASE WHEN w = guess THEN 1 ELSE 0 END), 0) AS a
        FROM big LEFT JOIN d1 USING (prev) WHERE b = 1),
      d2 AS (
        SELECT prev, w AS guess FROM (
          SELECT prev, w, row_number() OVER (PARTITION BY prev
                   ORDER BY count(*) DESC, w) AS rn
          FROM big WHERE b < 2 GROUP BY prev, w) WHERE rn = 1),
      a2 AS (
        SELECT count(*) AS n,
               coalesce(sum(CASE WHEN w = guess THEN 1 ELSE 0 END), 0) AS a
        FROM big LEFT JOIN d2 USING (prev) WHERE b = 2),
      u AS (
        SELECT 0 AS bid, CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS a
        UNION ALL SELECT 1, n, a FROM a1
        UNION ALL SELECT 2, n, a FROM a2)
      SELECT CAST(bid AS BIGINT) AS batch_id, CAST(n AS BIGINT) AS n_bigrams,
             CAST(a AS BIGINT) AS n_accepted,
             CAST(CASE WHEN n > 0 THEN (a * 1000000) // n ELSE 0 END
               AS BIGINT) AS accept_micro
      FROM u ORDER BY batch_id
    """,

    "stream_ks_monitor" -> ksMonitorOracleSql,

    // Replays each batch PREFIX's word counts from the doc_id-range
    // rule through the X340 Chao1 arithmetic.
    "stream_mix_monitor" -> """
      WITH per AS (SELECT max(doc_id) // 3 + 1 AS p FROM documents),
      base AS MATERIALIZED (
        SELECT ks.k, d.source AS h,
               CAST(count(*) AS BIGINT) AS nd,
               CAST(sum(len(string_split(d.text, ' '))) AS HUGEINT) AS tk
        FROM documents d, per,
             (SELECT unnest(generate_series(0, 2)) AS k) ks
        WHERE d.doc_id // per.p <= ks.k
        GROUP BY 1, 2),
      s0 AS (SELECT k, h, nd, tk, tk * 1000000000000 AS x,
               CAST(floor(sqrt(CAST(tk * 1000000000000 AS DOUBLE)))
                 AS HUGEINT) AS r0
             FROM base),
      s1 AS (SELECT k, h, nd, tk, x,
               CASE WHEN (r0 + 1) * (r0 + 1) <= x THEN r0 + 1
                    ELSE r0 END AS r1
             FROM s0),
      sh AS MATERIALIZED (
        SELECT k, h, nd, tk,
               CASE WHEN r1 * r1 > x THEN r1 - 1 ELSE r1 END AS shq
        FROM s1),
      ap AS (
        SELECT k, h, q + CASE WHEN
                 row_number() OVER (PARTITION BY k ORDER BY rem DESC, h)
                 <= 1000000 - sum(q) OVER (PARTITION BY k)
               THEN 1 ELSE 0 END AS a
        FROM (SELECT k, h,
                (1000000 * tk) // (sum(tk) OVER (PARTITION BY k)) AS q,
                (1000000 * tk) % (sum(tk) OVER (PARTITION BY k)) AS rem
              FROM sh)),
      aq AS (
        SELECT k, h, q + CASE WHEN
                 row_number() OVER (PARTITION BY k ORDER BY rem DESC, h)
                 <= 1000000 - sum(q) OVER (PARTITION BY k)
               THEN 1 ELSE 0 END AS a
        FROM (SELECT k, h,
                (1000000 * shq) // (sum(shq) OVER (PARTITION BY k)) AS q,
                (1000000 * shq) % (sum(shq) OVER (PARTITION BY k)) AS rem
              FROM sh))
      SELECT CAST(sh.k AS BIGINT) AS batch_id, sh.h AS source,
             sh.nd AS n_docs, CAST(sh.tk AS BIGINT) AS n_tokens,
             CAST(ap.a AS BIGINT) AS alloc_prop,
             CAST(aq.a AS BIGINT) AS alloc_temp
      FROM sh JOIN ap ON ap.k = sh.k AND ap.h = sh.h
      JOIN aq ON aq.k = sh.k AND aq.h = sh.h
      ORDER BY batch_id, source
    """,

    "stream_vocab_saturation" -> """
      WITH per AS (SELECT max(doc_id) // 3 + 1 AS p FROM documents),
      tok AS (
        SELECT doc_id // p AS b, unnest(string_split(text, ' ')) AS w
        FROM documents, per),
      rows_ AS (
        SELECT k, s_obs, f1, f2,
               CASE WHEN f2 > 0 THEN s_obs + (f1 * f1) // (2 * f2)
                    ELSE s_obs + (f1 * (f1 - 1)) // 2 END AS s_est
        FROM (
          SELECT k, count(*) AS s_obs,
                 sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
                 sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
          FROM (
            SELECT ks.k, t.w, count(*) AS c
            FROM tok t, (SELECT unnest(generate_series(0, 2)) AS k) ks
            WHERE t.b <= ks.k
            GROUP BY 1, 2)
          GROUP BY 1))
      SELECT CAST(k AS BIGINT) AS batch_id, CAST(s_obs AS BIGINT) AS s_obs,
             CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
             CAST(s_est AS BIGINT) AS s_est,
             CAST((s_obs * 1000000) // greatest(s_est, 1) AS BIGINT)
               AS coverage_micro
      FROM rows_ ORDER BY batch_id
    """,

    // Full-rebuild oracle for the streamed incremental excision: the
    // L-gram islands algorithm over the whole (augmented) corpus,
    // oblivious to the batch split — same SQL family as the batch
    // llm_suffix_incremental oracle.
    "stream_suffix_excise" -> s"""
      WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 25 = 0
                    THEN text || ' ${LlmSurface.Boilerplate}'
                    ELSE text END AS text
        FROM documents),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM aug),
      sp AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos,
               md5(array_to_string(ws[CAST(i AS INTEGER):CAST(i AS INTEGER) + 9], ' ')) AS h
        FROM (SELECT doc_id, ws,
                     unnest(range(1, greatest(CAST(len(ws) AS BIGINT) - 8, 1))) AS i
              FROM w)),
      g AS (SELECT h FROM sp GROUP BY h HAVING count(*) >= 2),
      f AS (SELECT DISTINCT doc_id, pos FROM sp JOIN g USING (h)),
      isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM f)
      SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
             CAST(max(pos) - min(pos) + 10 AS BIGINT) AS span_tokens
      FROM isl
      GROUP BY doc_id, grp
      ORDER BY doc_id, span_start
    """,

    // The streamed monitor must reproduce the BATCH tabular CUSUM
    // bit for bit — same planted drift, same arithmetic — so the
    // oracle IS the batch query's oracle, shared by reference.
    "stream_cusum" -> LlmSurface.oracleSql("p_cusum_tabular"),

    "stream_upsert_snapshot" -> """
      SELECT user_id, event_id, event_type, value,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1 ORDER BY user_id
    """,

    "stream_time_travel" -> """
      WITH pre AS (
        SELECT * FROM events
        WHERE CAST(ts AS DATE) <
              (SELECT min(CAST(ts AS DATE)) FROM events) + INTERVAL 20 DAY)
      SELECT user_id, event_id, event_type, value,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM pre)
      WHERE rn = 1 ORDER BY user_id
    """
  )

  /** X334 KS monitor oracle: each batch's quality histogram from the
    * doc_id-range rule, full-outer value join against the batch-0
    * reference, KsTest.ks2's cross-multiplied arithmetic per batch
    * (batch 0 scores 0 against itself). `lazy` — referenced above. */
  private lazy val ksMonitorOracleSql: String = {
    val branches = (0 to 2).map { k =>
      s"""c$k AS (
        SELECT coalesce(a.s, b.s) AS s, coalesce(a.c, 0) AS c1,
               coalesce(b.c, 0) AS c2
        FROM h0 a FULL OUTER JOIN h$k b ON b.s = a.s),
      cum$k AS (
        SELECT s, sum(c1) OVER (ORDER BY s) AS f1,
               sum(c2) OVER (ORDER BY s) AS f2
        FROM c$k),
      n$k AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM c$k),
      b$k AS (
        SELECT dd AS d_num FROM (
          SELECT s, abs(f1 * n2 - f2 * n1) AS dd FROM cum$k, n$k)
        ORDER BY dd DESC, s LIMIT 1),
      r$k AS (
        SELECT CAST($k AS BIGINT) AS batch_id,
               CAST(n1 AS BIGINT) AS n_ref, CAST(n2 AS BIGINT) AS n_batch,
               CAST(d_num AS BIGINT) AS d_num,
               CAST(CASE WHEN n1 > 0 AND n2 > 0
                         THEN (d_num * 1000000) // (n1 * n2)
                         ELSE 0 END AS BIGINT) AS ks_micro,
               (n1 > 0 AND n2 > 0
                AND CAST(d_num AS HUGEINT) * d_num * 1000000
                    >= CAST(1844164 AS HUGEINT) * n1 * n2 * (n1 + n2))
                 AS reject_05
        FROM b$k, n$k)"""
    }.mkString(",\n      ")
    val hists = (0 to 2).map(k =>
      s"""h$k AS MATERIALIZED (
        SELECT s, count(*) AS c FROM q WHERE b = $k GROUP BY 1)""")
      .mkString(",\n      ")
    s"""
      WITH per AS (SELECT max(doc_id) // 3 + 1 AS p FROM documents),
      q AS (
        SELECT doc_id // p AS b,
               CAST(floor((${LlmSurface.qualitySqlCol}) * 1000000.0)
                 AS BIGINT) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents), per),
      $hists,
      $branches
      SELECT * FROM (
        SELECT * FROM r0 UNION ALL SELECT * FROM r1
        UNION ALL SELECT * FROM r2)
      ORDER BY batch_id
    """
  }
}
