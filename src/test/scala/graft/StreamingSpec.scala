package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream

/** Proves the event operators really run under Structured Streaming:
  * windowed aggregation with a watermark, and custom-state gap
  * sessionization via flatMapGroupsWithState (in-batch close + event-time
  * timeout close).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window aggregation runs as a stream with watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStream.tumblingCounts(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("update").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:15:00"), "click", 1.0),
        (2L, ts("2024-01-01 10:45:00"), "click", 2.0),
        (3L, ts("2024-01-01 11:05:00"), "view", 3.0))
      q.processAllAvailable()
      val got = spark.table("tumbling_test")
        .select("win_start", "event_type", "n")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got === Set(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 11:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("priority sample: cross-batch bottom-k state equals the batch " +
    "sample, members exactly recoverable") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF()
      .toDF("user_id", "ts", "event_type", "value")
    val q = EventStream.prioritySampleDaily(events, "2 hours", k = 3)
      .writeStream.format("memory").queryName("psamp_test")
      .outputMode("update").start()
    try {
      // 8 distinct users split across TWO micro-batches (repeats in
      // both) — the merged min-k must equal the batch sample
      input.addData((0L to 4L).map(u =>
        (u, ts("2024-01-01 10:00:00"), "click", 1.0)): _*)
      q.processAllAvailable()
      input.addData((3L to 7L).map(u =>
        (u, ts("2024-01-01 11:00:00"), "view", 1.0)): _*)
      q.processAllAvailable()
      val sample = spark.table("psamp_test")
        .orderBy(org.apache.spark.sql.functions.col("win_start").desc)
        .select("sample").as[Seq[Long]].collect().head
      // batch replay: same packing, brute-force sort, first 3
      val expected = (0L to 7L).map { u =>
        val h = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"psamp|$u".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(9), 16)
        h * 16777216L + u
      }.sorted.take(3)
      assert(sample === expected)
      // low 24 bits recover the ids exactly
      assert(sample.map(_ % 16777216L).toSet.subsetOf((0L to 7L).toSet))
    } finally q.stop()
  }

  test("stream-stream click attribution joins within the horizon only") {
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val q = EventStream.attributeClicks(
      views.toDF().toDF("user_id", "ts", "event_id"),
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      horizon = "30 minutes", watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("attrib_test")
      .outputMode("append").start()
    try {
      views.addData(
        (1L, ts("2024-01-01 10:00:00"), 100L),
        (1L, ts("2024-01-01 10:20:00"), 101L), // second view, also in horizon
        (2L, ts("2024-01-01 10:00:00"), 102L))
      clicks.addData(
        (1L, ts("2024-01-01 10:25:00"), 200L), // 25 min after 100, 5 after 101
        (2L, ts("2024-01-01 11:30:00"), 201L)) // 90 min after 102: outside
      q.processAllAvailable()
      val got = spark.table("attrib_test")
        .select("user_id", "click_id", "view_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 200L, 100L), (1L, 200L, 101L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER: click-less view emits null-padded on watermark expiry") {
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val q = EventStream.unattributedViews(
      views.toDF().toDF("user_id", "ts", "event_id"),
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      horizon = "30 minutes", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("unattrib_test")
      .outputMode("append").start()
    try {
      views.addData(
        (1L, ts("2024-01-01 10:00:00"), 100L), // will get a click
        (2L, ts("2024-01-01 10:00:00"), 101L)) // never clicked
      clicks.addData((1L, ts("2024-01-01 10:05:00"), 200L))
      q.processAllAvailable()
      // matched row emits on arrival; view 101 must NOT have emitted yet
      // (the watermark hasn't proven no click can come)
      val early = spark.table("unattrib_test")
        .select("view_id").as[Long].collect().toSet
      assert(early === Set(100L), s"only the matched view may emit early: $early")
      // advance the watermark past 10:30 + 10 min on BOTH sides, then
      // execute a batch under it so the expiry fires
      views.addData((9L, ts("2024-01-01 12:00:00"), 900L))
      clicks.addData((9L, ts("2024-01-01 12:00:00"), 901L))
      q.processAllAvailable()
      views.addData((9L, ts("2024-01-01 13:00:00"), 902L))
      clicks.addData((9L, ts("2024-01-01 13:00:00"), 903L))
      q.processAllAvailable()
      val rows = spark.table("unattrib_test")
        .filter(org.apache.spark.sql.functions.col("view_id") === 101L)
        .select("user_id", "view_id", "click_id")
        .collect()
      assert(rows.length === 1, "expired click-less view must emit exactly once")
      assert(rows.head.isNullAt(2), "expired view must be null-padded")
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark keyed on content hash") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = input.toDF().toDF("ts", "text")
      .withWatermark("ts", "1 hour")
      .withColumn("content_sha", org.apache.spark.sql.functions.sha2(
        org.apache.spark.sql.functions.col("text"), 256))
      .dropDuplicatesWithinWatermark("content_sha")
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "doc one"),
        (ts("2024-01-01 10:05:00"), "doc one"), // dup within watermark -> dropped
        (ts("2024-01-01 10:10:00"), "doc two"))
      q.processAllAvailable()
      val texts = spark.table("dedup_test").select("text").as[String].collect().toSeq
      assert(texts.sorted === Seq("doc one", "doc two"))
    } finally q.stop()
  }

  test("streaming curation: quality filter + watermarked dedup + stable hash split") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val stops = Seq("the", "a", "of", "to", "in")
    val rich = "the quick brown fox jumps over a lazy dog in the misty morning light today"
    val q = graft.streaming.DocStream.curate(docs, stops, minQuality = 0.3, "1 hour")
      .writeStream.format("memory").queryName("curate_test")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), rich),
        (2L, ts("2024-01-01 10:01:00"), rich), // exact dup -> dropped
        (3L, ts("2024-01-01 10:02:00"), "tiny tiny tiny tiny")) // low quality
      q.processAllAvailable()
      val got = spark.table("curate_test")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(got.keySet === Set(1L))
      // split must equal the BATCH hashBucket assignment for the same id
      val batchSplit = Seq(1L).toDF("doc_id")
        .select(org.apache.spark.sql.functions.when(
          graft.llm.TextOps.hashBucket(org.apache.spark.sql.functions.col("doc_id"), "split") < 80, "train")
          .when(graft.llm.TextOps.hashBucket(org.apache.spark.sql.functions.col("doc_id"), "split") < 90, "val")
          .otherwise("test")).as[String].head()
      assert(got(1L) === batchSplit)
    } finally q.stop()
  }

  test("streaming classify matches the batch join-form scorer on the real corpus") {
    // Two spellings of the same inference: batch = explode -> weight
    // table join -> per-doc agg; streaming = map-literal fold over the
    // in-row word array (stateless). Same md5 bucketing by construction
    // (TextOps.featureBucket); this pins the rest — weights, integer
    // logit, label rule — row-for-row on sf0.001 documents.
    import org.apache.spark.sql.functions._
    import graft.llm.TextOps
    val corpus = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val model = TextOps.hashModelWeights(spark, 256, "wgt")
    val wmap = model.as[(Int, Int)].collect().map { case (b, w) => b -> w.toLong }.toMap

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStream
      .classify(input.toDF().toDF("doc_id", "text"), wmap, 256, "feat")
      .writeStream.format("memory").queryName("classify_parity")
      .outputMode("append").start()
    try {
      input.addData(corpus)
      q.processAllAvailable()
      val streamed = spark.table("classify_parity")
        .select("doc_id", "n_tokens", "score", "label")
        .as[(Long, Long, Double, String)].collect().toSet
      val batch = TextOps.linearScore(
        TextOps.hashedFeatures(corpus.toDF("doc_id", "text"), "doc_id", "text", 256, "feat"),
        model.toDF("b", "wt"))
        .as[(Long, Long, Double, String)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("classify rejects a partial model (uncovered feature buckets fail fast)") {
    // The batch linearScore inner-joins the weight table — an uncovered
    // bucket silently drops out of n_tokens and the logit there, while
    // the streaming coalesce-to-0 would still count the token. Rather
    // than diverge, an incomplete model must be rejected at entry.
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val partial = Map(0 -> 5L, 1 -> -3L) // buckets 2..7 missing
    val e = intercept[IllegalArgumentException] {
      graft.streaming.DocStream.classify(docs, partial, 8, "feat")
    }
    assert(e.getMessage.contains("cover every bucket"))
  }

  test("streaming curate matches the batch policy keep-set on the real corpus") {
    // THE backfill guarantee: replaying a corpus through DocStream.curate
    // must keep exactly the documents the batch spelling of the same
    // policy keeps (quality >= 0.3, exact-content dedup, hash split).
    // Both paths share TextOps.qualityScore / hashBucket by construction;
    // this pins the remaining glue (threshold, sha dedup, split ranges)
    // end-to-end on sf0.001 documents. The one documented divergence:
    // WITHIN a duplicate group the stream keeps the first ARRIVAL and the
    // batch keep-first rule picks min doc_id, so doc-level fields are
    // compared on singleton groups only and dedup is compared at
    // content_sha granularity.
    import org.apache.spark.sql.functions._
    import graft.llm.TextOps
    val stops = Seq("the", "a", "of", "to", "in")
    val corpus = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = graft.streaming.DocStream.curate(docs, stops, minQuality = 0.3, "1 hour")
      .writeStream.format("memory").queryName("curate_parity")
      .outputMode("append").start()
    try {
      input.addData(corpus.map { case (id, text) =>
        (id, ts("2024-01-01 10:00:00"), text)
      })
      q.processAllAvailable()
      val streamed = spark.table("curate_parity")
        .select("content_sha", "doc_id", "quality", "split")
        .as[(String, Long, Double, String)].collect()

      val batch = corpus.toDF("doc_id", "text")
        .withColumn("_w", TextOps.words(col("text")))
        .withColumn("quality", TextOps.qualityScore(col("_w"), stops))
        .filter(col("quality") >= 0.3)
        .withColumn("content_sha", sha2(col("text"), 256))
        .groupBy("content_sha")
        .agg(min_by(struct(col("doc_id"), col("quality")), col("doc_id")).as("_f"),
          count(lit(1)).as("n_copies"))
        .select(col("content_sha"), col("_f.doc_id").as("doc_id"),
          col("_f.quality").as("quality"), col("n_copies"))
        .withColumn("split",
          when(TextOps.hashBucket(col("doc_id"), "split") < 80, "train")
            .when(TextOps.hashBucket(col("doc_id"), "split") < 90, "val")
            .otherwise("test"))
        .as[(String, Long, Double, Long, String)].collect()

      assert(streamed.nonEmpty && streamed.length < corpus.length,
        "parity input must exercise both the quality filter and the dedup")
      assert(streamed.map(_._1).toSet === batch.map(_._1).toSet,
        "kept content-sha sets must be identical")
      val streamSingletons = streamed.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      for ((sha, id, quality, nCopies, split) <- batch if nCopies == 1)
        assert(streamSingletons(sha) === ((id, quality, split)),
          s"doc $id diverged between batch and stream")
    } finally q.stop()
  }

  test("streaming incremental dedup: anti-join vs static base, then in-stream dedup") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val base = Seq("known base document").toDF("text")
      .withColumn("content_sha", org.apache.spark.sql.functions.sha2(
        org.apache.spark.sql.functions.col("text"), 256))
    val q = graft.streaming.DocStream.dedupAgainstBase(
      input.toDF().toDF("doc_id", "ts", "text"), base, "1 hour")
      .writeStream.format("memory").queryName("incdedup_test")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "known base document"),   // in base -> dropped
        (2L, ts("2024-01-01 10:01:00"), "fresh document content"),
        (3L, ts("2024-01-01 10:02:00"), "fresh document content"), // in-stream dup -> dropped
        (4L, ts("2024-01-01 10:03:00"), "another new one"))
      q.processAllAvailable()
      val got = spark.table("incdedup_test").select("doc_id")
        .as[Long].collect().toSet
      assert(got === Set(2L, 4L))
    } finally q.stop()
  }

  test("streaming funnel: completion emits and drops state, idle user emits partial on timeout") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = EventStream.funnelProgress(
      input.toDS().toDF("user_id", "ts", "event_type")
        .withWatermark("ts", "0 seconds")
        .as[(Long, Timestamp, String)],
      steps = Seq("view", "cart", "buy"), idleMinutes = 30)
    val q = out.writeStream.format("memory").queryName("funnel_test")
      .outputMode("append").start()
    try {
      // user 1 completes in order (a stray repeat "view" is ignored);
      // user 2 jumps straight to "buy" — strict order: no progress, no
      // state; user 3 reaches "cart" then goes idle
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "view"),
        (1L, ts("2024-01-01 10:01:00"), "view"),
        (1L, ts("2024-01-01 10:02:00"), "cart"),
        (1L, ts("2024-01-01 10:03:00"), "buy"),
        (2L, ts("2024-01-01 10:00:00"), "buy"),
        (3L, ts("2024-01-01 10:00:00"), "view"),
        (3L, ts("2024-01-01 10:04:00"), "cart"))
      q.processAllAvailable()
      val afterBatch1 = spark.table("funnel_test")
        .as[EventStream.FunnelOut].collect().toSeq
      assert(afterBatch1.map(f => (f.user_id, f.steps_completed, f.completed))
        === Seq((1L, 3, true)))
      assert(afterBatch1.head.last_ts === ts("2024-01-01 10:03:00"))

      // advance the watermark past 10:04 + 30min, then one more batch so
      // user 3's armed timeout fires: partial progress (2 steps) emits
      input.addData((9L, ts("2024-01-01 11:00:00"), "view"))
      q.processAllAvailable()
      input.addData((9L, ts("2024-01-01 11:01:00"), "cart"))
      q.processAllAvailable()
      val all = spark.table("funnel_test")
        .as[EventStream.FunnelOut].collect().toSeq
      assert(all.filter(_.user_id == 3L)
        .map(f => (f.steps_completed, f.completed)) === Seq((2, false)))
      // user 2 never entered the funnel: nothing emitted, no state held
      assert(!all.exists(_.user_id == 2L))
    } finally q.stop()
  }

  test("streaming sessionization: in-batch gap close and event-time timeout close") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val sessions = EventStream.sessionize(
      input.toDS().toDF("user_id", "ts", "value")
        .withWatermark("ts", "0 seconds")
        .as[(Long, Timestamp, Double)],
      gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      // batch 1: two sessions' worth of events for user 7 — the first
      // closes IN BATCH because the gap to the third event exceeds 30min
      input.addData(
        (7L, ts("2024-01-01 10:00:00"), 1.0),
        (7L, ts("2024-01-01 10:10:00"), 2.0),
        (7L, ts("2024-01-01 12:00:00"), 4.0))
      q.processAllAvailable()
      val afterBatch1 = spark.table("session_test")
        .as[EventStream.SessionOut].collect().toSeq
      assert(afterBatch1.map(s => (s.user_id, s.n_events, s.value_sum)) === Seq((7L, 2L, 3.0)))
      assert(afterBatch1.head.session_start === ts("2024-01-01 10:00:00"))
      assert(afterBatch1.head.session_end === ts("2024-01-01 10:10:00"))

      // batch 2 advances the watermark far past 12:00 + 30min; the open
      // session for user 7 must close by EVENT-TIME TIMEOUT
      input.addData((8L, ts("2024-01-01 15:00:00"), 9.0))
      q.processAllAvailable()
      // one more batch so the timeout (armed against the new watermark) fires
      input.addData((8L, ts("2024-01-01 15:01:00"), 1.0))
      q.processAllAvailable()
      val all = spark.table("session_test")
        .as[EventStream.SessionOut].collect().toSeq
      val user7 = all.filter(_.user_id == 7L).sortBy(_.session_start.getTime)
      assert(user7.map(s => (s.n_events, s.value_sum)) === Seq((2L, 3.0), (1L, 4.0)))
    } finally q.stop()
  }
}
