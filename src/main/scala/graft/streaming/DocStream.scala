package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Streaming form of the training-data curation pipeline: the SAME
  * narrow Column expressions as the batch `llm_curation_pipeline`
  * (quality score → threshold → deterministic hash split) applied to a
  * document stream, with exact content dedup bounded by a watermark.
  *
  * Every stage except the dedup is stateless (pure projection/filter —
  * streams unchanged); the dedup uses `dropDuplicatesWithinWatermark`
  * keyed on the content sha, so its state holds only hashes newer than
  * the watermark delay instead of growing with the corpus — the
  * streaming analogue of the batch keep-first rule, where "first" is
  * arrival order within the dedup horizon.
  *
  * The hash split ([[TextOps.hashBucket]]) is a pure function of doc_id,
  * so a document's train/val/test membership is identical in the batch
  * and streaming paths — REQUIRED for an incremental corpus build to
  * agree with its backfill.
  */
object DocStream {

  /** Input needs (doc_id, ts timestamp, text); emits the curated stream
    * with `quality` and `split` columns attached.
    */
  def curate(
      docs: DataFrame,
      stopwords: Seq[String],
      minQuality: Double,
      watermarkDelay: String): DataFrame = {
    val d = docs
      .withWatermark("ts", watermarkDelay)
      .withColumn("_w", TextOps.words(col("text")))
    d.withColumn("quality", TextOps.qualityScore(col("_w"), stopwords))
      .filter(col("quality") >= minQuality)
      .withColumn("content_sha", sha2(col("text"), 256))
      .dropDuplicatesWithinWatermark("content_sha")
      .withColumn("split",
        when(TextOps.hashBucket(col("doc_id"), "split") < 80, "train")
          .when(TextOps.hashBucket(col("doc_id"), "split") < 90, "val")
          .otherwise("test"))
      .drop("_w")
  }

  /** STATELESS streaming classifier inference — the streaming form of
    * the batch `TextOps.hashedFeatures` + `linearScore` pair: instead of
    * explode → weight-table join → per-doc aggregation (a stateful
    * streaming agg), the model ships as a MAP LITERAL and the logit
    * folds over the in-row word array — a pure projection, so the
    * stream needs no watermark, no state store, and no shuffle. This is
    * the right inference shape whenever the model fits in the plan
    * (feature hashing guarantees a fixed bucket count, so it always
    * does); bucketing reuses [[TextOps.featureBucket]], making the two
    * paths agree token-for-token (StreamingSpec pins the parity).
    *
    * `weights` must cover every bucket in [0, numBuckets) — true of any
    * trained hashed model, and ENFORCED here: a partial model would
    * silently diverge from the batch path (the batch `linearScore`
    * inner-joins the weight table, dropping uncovered buckets from
    * `n_tokens` and the logit, while this coalesce-to-0 would still
    * count the token), so it fails fast instead.
    * Output mirrors the batch scorer: (doc_id, n_tokens, score, label),
    * with the label compared on the exact INTEGER logit.
    */
  def classify(docs: DataFrame, weights: Map[Int, Long], numBuckets: Int,
      salt: String): DataFrame = {
    require((0 until numBuckets).forall(weights.contains),
      s"weights must cover every bucket in [0, $numBuckets) — missing " +
        (0 until numBuckets).filterNot(weights.contains).take(5).mkString(","))
    val wmap = typedLit(weights)
    docs
      .withColumn("_w", TextOps.words(col("text")))
      .withColumn("n_tokens", size(col("_w")).cast("long"))
      .withColumn("_st",
        aggregate(
          transform(col("_w"),
            w => coalesce(
              element_at(wmap, TextOps.featureBucket(w, numBuckets, salt)),
              lit(0L))),
          lit(0L), (acc, x) => acc + x))
      .withColumn("score",
        TextOps.round6(col("_st") / (col("n_tokens") * 1000.0)))
      .withColumn("label",
        when(col("_st") >= 0, "keep").otherwise("drop"))
      .drop("_w", "_st")
  }

  /** Streaming multi-pattern blocklist screen — the Aho–Corasick scan
    * (X199) composed into a micro-batch plan. Stateless: the broadcast
    * automaton is applied per batch via the same typed `mapPartitions`
    * the batch operator uses (per-row work is O(|text|), no state store,
    * no shuffle inside the stream), emitting one (doc_id, pat_id, hits)
    * row per matched pattern. The caller aggregates the sink parquet
    * after replay — in production the same output feeds a `foreachBatch`
    * MERGE into the screening ledger.
    */
  def blocklistScreen(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      graft.operators.AhoCorasick.build(patterns))
    val nPat = patterns.length
    docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = bc.value
        it.flatMap { case (id, text) =>
          val counts = ac.countAll(if (text == null) "" else text, nPat)
          Iterator.range(0, nPat).filter(counts(_) > 0L)
            .map(p => (id, p, counts(p)))
        }
      }
      .toDF("doc_id", "pat_id", "hits")
  }

  /** Streaming incremental dedup against a STATIC base corpus — the
    * streaming analogue of [[TextOps.incrementalDedup]]'s exact stage:
    * tonight's document stream is checked against the existing corpus's
    * content-sha table with a stream-static LEFT ANTI join (supported
    * stateless by Structured Streaming: the static side is re-planned
    * per micro-batch, no streaming state at all), then deduped within
    * the stream itself by `dropDuplicatesWithinWatermark`.
    *
    * `baseShas` must carry a `content_sha` column (e.g. the persisted
    * signature/sha table the batch pipeline maintains). Order matters:
    * anti-join FIRST so base-known documents never enter the
    * within-stream dedup state.
    */
  def dedupAgainstBase(
      docs: DataFrame,
      baseShas: DataFrame,
      watermarkDelay: String): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .withColumn("content_sha", sha2(col("text"), 256))
      .join(baseShas.select("content_sha"), Seq("content_sha"), "left_anti")
      .dropDuplicatesWithinWatermark("content_sha")

  /** The COMPLETE streaming-ingest loop with a GROWING index —
    * [[dedupAgainstBase]] checks against a static snapshot; this closes
    * the loop: per micro-batch, (1) within-batch keep-first on the
    * content sha (`min_by` combine, never a window), (2) anti-join
    * against the sha index accumulated by ALL previous batches, (3)
    * append the novel documents to the corpus sink and their shas to
    * the index. Tonight's batch dedupes against everything ever
    * ingested, including earlier tonight.
    *
    * Failure ordering is deliberate: corpus append happens BEFORE index
    * append, so a crash between the two re-emits the batch's novel docs
    * on retry (at-least-once, dedupable downstream by the same sha)
    * rather than silently losing them (the index-first order drops
    * data). Exactly-once needs a transactional table format holding
    * both writes; this is the honest filesystem spelling.
    *
    * Scale: the index read is a columnar scan of ONE narrow sha column;
    * at corpus scale the anti-join hash-partitions both sides on the
    * sha (near-unique, skew-free), and the index directory is exactly
    * what [[graft.operators.Compaction]] exists to fold.
    */
  def ingestWithGrowingIndex(docs: DataFrame, corpusDir: String,
      indexDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val payload = batch.columns
        val keyed = batch
          .withColumn("content_sha", sha2(col("text"), 256))
          .groupBy("content_sha")
          .agg(min_by(struct(payload.map(col): _*), col("doc_id")).as("_p"))
          .select(col("content_sha") +: payload.map(c => col(s"_p.`$c`")): _*)
        val novel =
          if (new java.io.File(indexDir).exists())
            keyed.join(s.read.parquet(indexDir).select("content_sha"),
              Seq("content_sha"), "left_anti")
          else keyed
        val pinned = novel.localCheckpoint(true) // one computation, two writes
        pinned.write.mode("append").parquet(corpusDir)
        pinned.select("content_sha").write.mode("append").parquet(indexDir)
        ()
      }
      .start()

  /** Streaming ExactSubstr excision maintenance (X287) — the streaming
    * form of [[graft.operators.SuffixArray.incrementalDupSpans]]'s
    * K-gram postings probe, composed with the [[ingestWithGrowingIndex]]
    * maintained-index pattern: per micro-batch, the batch's `spanTokens`-
    * gram postings probe the GROWING postings index by gram hash
    * (equi-join, never a corpus rescan) and emit newly-duplicated
    * flagged positions — including RETROACTIVE flags on earlier-batch
    * positions whose gram this batch just made duplicated.
    *
    * Exactly-once emission is structural, no dedup state needed: a
    * position is emitted when its gram's duplicate status FLIPS —
    * batch positions of any now-duplicated gram, plus index positions
    * of grams at prior count exactly 1 (count ≥ 2 means those index
    * positions were already emitted when the second copy arrived).
    * The union of emissions over all batches is therefore exactly the
    * batch algorithm's flag set, which is what the oracle hash-checks
    * (after the stateless islands merge at readback).
    *
    * Failure ordering mirrors [[ingestWithGrowingIndex]]: flags append
    * BEFORE postings, so a crash between the writes re-emits (at-least-
    * once, dedupable by (doc, pos)) instead of losing flags — if the
    * postings landed first, the retry's probe would see prior count 2
    * and silently skip the retro emission.
    *
    * Scale: per batch the work is the batch shingle explode + two
    * gram-keyed combine aggs + two hash equi-joins into the index; the
    * index is append-only (doc, pos, h) — in production a bucketed-by-h
    * table the probe co-locates with, and the directory fan-in is what
    * [[graft.operators.Compaction]] folds.
    */
  def exciseWithGrowingPostings(docs: DataFrame, postingsDir: String,
      flagsDir: String, spanTokens: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val post = batch
          .select(col("doc_id").cast("long").as("doc"),
            posexplode(TextOps.shinglesFromWords(
              TextOps.words(col("text")), spanTokens)).as(Seq("_p", "_s")))
          .select(col("doc"), (col("_p") + 1).cast("int").as("pos"),
            md5(col("_s")).as("h"))
          .localCheckpoint(true) // feeds counts, probe, and the append
        val batchCnt = post.groupBy("h").agg(count(lit(1)).as("_nn"))
        val flagged =
          if (new java.io.File(postingsDir).exists()) {
            val idx = s.read.parquet(postingsDir)
            val idxCnt = idx.groupBy("h").agg(count(lit(1)).as("_nb"))
            val j = batchCnt.join(idxCnt, Seq("h"), "left")
              .select(col("h"), col("_nn"),
                coalesce(col("_nb"), lit(0L)).as("_nb"))
              .localCheckpoint(true) // two consumers below
            val fromBatch = post
              .join(j.filter(col("_nn") + col("_nb") >= 2).select("h"), "h")
              .select("doc", "pos")
            val retro = idx
              .join(j.filter(col("_nb") === 1 && col("_nn") >= 1)
                .select("h"), "h")
              .select("doc", "pos")
            fromBatch.union(retro)
          } else {
            post.join(batchCnt.filter(col("_nn") >= 2).select("h"), "h")
              .select("doc", "pos")
          }
        flagged.write.mode("append").parquet(flagsDir)
        post.select("doc", "pos", "h").write.mode("append")
          .parquet(postingsDir)
        ()
      }
      .start()

  /** Prequential (test-then-train) speculative-acceptance maintenance
    * (X331; Dawid's prequential principle — the streaming form of the
    * batch `llm_spec_accept`): per micro-batch, (1) SCORE the batch's
    * bigrams against the greedy draft built from all PREVIOUS batches'
    * counts (test), then (2) merge the batch's bigram counts into the
    * maintained state (train). The emitted per-batch acceptance is
    * therefore honest out-of-sample — the number the batch form's
    * same-corpus fit can only upper-bound.
    *
    * Batch 0 has no draft and emits a zero row (kept, so the output
    * row set is batch-stable). Failure ordering: the score row appends
    * BEFORE the counts (at-least-once; a retried batch re-emits an
    * IDENTICAL row, folded by the readback's distinct — the
    * counts-first order would silently train on the scoring batch).
    *
    * Scale: state is the (prev, w, c) bigram table — vocabulary-
    * squared-bounded in principle, Heaps-law in practice — read as a
    * columnar scan and merged by one combine agg per batch; the draft
    * argmax is one combine-min over it; scoring is a vocab-sized LEFT
    * equi-join on prev — bigrams whose prev the prefix never saw count
    * as misses (guess null ≠ w), keeping the rate an honest
    * out-of-sample estimate rather than one conditioned on
    * draft-covered prefixes. The append-dir fan-in is Compaction's job.
    */
  def prequentialSpecAccept(docs: DataFrame, countsDir: String,
      outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val s = batch.sparkSession
        import org.apache.spark.sql.expressions.Window
        val bg = batch
          .select(col("doc_id"),
            posexplode(TextOps.words(col("text"))).as(Seq("pos", "w")))
          .withColumn("prev", lag("w", 1).over(
            Window.partitionBy("doc_id").orderBy("pos")))
          .filter(col("prev").isNotNull)
          .select("prev", "w")
          .localCheckpoint(true) // scoring AND the state merge
        val scored =
          if (new java.io.File(countsDir).exists()) {
            val counts = s.read.parquet(countsDir)
              .groupBy("prev", "w").agg(sum("c").as("c"))
            val draft = counts.groupBy("prev")
              .agg(min(struct((-col("c")).as("nc"), col("w").as("g")))
                .as("b"))
              .select(col("prev"), col("b.g").as("guess"))
            // LEFT join: a bigram whose prev the prefix never saw is
            // a draft MISS (guess null ≠ w), not a dropped trial — an
            // inner join would bias the acceptance rate upward by
            // conditioning on draft-covered prefixes only
            bg.join(draft, Seq("prev"), "left")
              .agg(count(lit(1)).as("n_bigrams"),
                sum(when(col("w") === col("guess"), 1L).otherwise(0L))
                  .as("n_accepted"))
          } else {
            s.range(1).select(lit(0L).as("n_bigrams"),
              lit(0L).as("n_accepted"))
          }
        scored.select(lit(bid).as("batch_id"), col("n_bigrams"),
            col("n_accepted"))
          .write.mode("append").parquet(outDir)
        bg.groupBy("prev", "w").agg(count(lit(1)).as("c"))
          .write.mode("append").parquet(countsDir)
        ()
      }
      .start()

  /** Streaming Chao1 vocabulary-saturation monitor (X341) — the
    * crawl-scheduler question asked ONLINE: after each ingested
    * batch, how much vocabulary does the corpus-so-far still hide?
    * Per micro-batch: merge the batch's word counts into the
    * maintained (w, c) state, emit the cumulative frequency-of-
    * frequency Chao1 row (s_obs, f1, f2, s_est, coverage — the X340
    * arithmetic), then append the batch counts. Emission precedes
    * the counts append: a retried batch recomputes the identical
    * cumulative row from the unchanged prior state (readback
    * distinct folds it); counts-first would double-count the batch
    * on retry. State is the Heaps-law vocabulary table, merged by
    * one combine agg per batch; Compaction folds the append dirs.
    */
  def vocabSaturationMonitor(docs: DataFrame, countsDir: String,
      outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val s = batch.sparkSession
        val wc = batch
          .select(explode(TextOps.words(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
          .localCheckpoint(true) // the cumulative merge AND the append
        val combined =
          (if (new java.io.File(countsDir).exists())
            s.read.parquet(countsDir).unionByName(wc)
          else wc)
            .groupBy("w").agg(sum("c").as("c"))
        combined
          .agg(count(lit(1)).as("s_obs"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
            sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
          .withColumn("s_est",
            when(col("f2") > 0,
              col("s_obs") + expr("(f1 * f1) div (2 * f2)"))
              .otherwise(col("s_obs") + expr("(f1 * (f1 - 1)) div 2")))
          .select(lit(bid).as("batch_id"), col("s_obs"), col("f1"),
            col("f2"), col("s_est"),
            expr("(s_obs * 1000000) div greatest(s_est, 1)")
              .as("coverage_micro"))
          .write.mode("append").parquet(outDir)
        wc.write.mode("append").parquet(countsDir)
        ()
      }
      .start()

  /** Streaming temperature-mix rebalancer (X362, the 21st stream
    * query) — the live form of `TextOps.temperatureMix`: as crawl
    * batches land, per-source token counts accumulate in a state
    * table and every batch emits the FULL refreshed allocation
    * (α = 1 proportional and α = ½ temperature ppm seats, each
    * apportioned by the shared largest-remainder total order, each
    * summing to 10⁶ exactly). The readout a continuously-ingesting
    * curation pipeline actually wants: "with tonight's crawl merged,
    * what are the sampling weights NOW?"
    *
    * Same merge → emit → train ordering as [[vocabSaturationMonitor]]
    * (the allocation reflects state INCLUDING the batch; the delta
    * appends after the emit). State = one (source, n_docs, tokens)
    * row per source — source-domain sized; per batch one combine agg,
    * the rest is metadata arithmetic.
    */
  def mixMonitor(docs: DataFrame, countsDir: String, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val s = batch.sparkSession
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast("decimal(38,0)")
        val wc = batch
          .select(col("source").as("h"),
            size(TextOps.words(col("text"))).cast("long").as("t"))
          .groupBy("h").agg(count(lit(1)).as("nd"), sum("t").as("tk"))
          .localCheckpoint(true) // the cumulative merge AND the append
        val merged =
          (if (new java.io.File(countsDir).exists())
            s.read.parquet(countsDir).unionByName(wc)
          else wc)
            .groupBy("h").agg(sum("nd").as("nd"), sum("tk").as("tk"))
            .localCheckpoint(true) // two share projections + the join
        val prop = TextOps.largestRemainder(
          merged.select(col("h"), dec(col("tk")).as("share")),
          1000000, "alloc_prop")
        val temp = TextOps.largestRemainder(
          merged.select(col("h"),
            TextOps.isqrtDec(dec(col("tk")) * lit(1000000000000L))
              .as("share")),
          1000000, "alloc_temp")
        merged.join(prop, "h").join(temp, "h")
          .select(lit(bid).as("batch_id"), col("h").as("source"),
            col("nd").as("n_docs"), col("tk").cast("long").as("n_tokens"),
            col("alloc_prop"), col("alloc_temp"))
          .write.mode("append").parquet(outDir)
        wc.write.mode("append").parquet(countsDir)
        ()
      }
      .start()

  /** Streaming KS drift monitor (X334) — the DISTRIBUTION complement
    * to [[EventStream]]'s CUSUM mean monitor: batch 0's quality
    * histogram freezes as the reference; every batch (batch 0
    * included — it scores an exact 0 against itself) emits one
    * [[graft.operators.KsTest.ks2]] row against it, so a shifted
    * quality distribution in tonight's crawl trips `reject_05` even
    * when its MEAN is unchanged (the case CUSUM is blind to).
    *
    * Crash ordering: the reference write precedes the out append; a
    * retry of batch 0 re-reads the now-frozen reference and re-emits
    * the identical zero row (folded by readback distinct). State is
    * one value-domain-sized histogram; per batch one combine agg, one
    * full-outer value join, one value-domain window.
    */
  def ksMonitor(docs: DataFrame, refDir: String, outDir: String,
      stopwords: Seq[String], checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w0 = docs.writeStream.outputMode("append")
    // Caller-pinned checkpoint = restartable monitor. Replay contract
    // (proven by StreamCrashRecoverySpec, which deletes the commit
    // marker and restarts): the reference freeze is append-guarded by
    // the refDir existence probe, so a replayed batch 0 re-READS the
    // frozen reference instead of re-freezing; the out append is
    // at-least-once — a replayed batch re-emits its IDENTICAL KS row
    // (same batch_id, same integers), folded by readback distinct.
    val w = checkpointDir.fold(w0)(d => w0.option("checkpointLocation", d))
    w
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val s = batch.sparkSession
        val h = batch
          .select(TextOps.words(col("text")).as("_w"))
          .select(floor(TextOps.qualityScore(col("_w"), stopwords)
            * 1000000.0).cast("long").as("s"))
          .groupBy("s").agg(count(lit(1)).as("c"))
          .localCheckpoint(true) // the KS join + maybe the ref write
        val ref =
          if (new java.io.File(refDir).exists()) s.read.parquet(refDir)
          else { h.write.mode("append").parquet(refDir); h }
        val counts = ref.select(col("s"), col("c").as("c1"))
          .join(h.select(col("s"), col("c").as("c2")), Seq("s"),
            "full_outer")
          .select(col("s"), coalesce(col("c1"), lit(0L)).as("c1"),
            coalesce(col("c2"), lit(0L)).as("c2"))
        graft.operators.KsTest.ks2(counts)
          .select(lit(bid).as("batch_id"), col("n1").as("n_ref"),
            col("n2").as("n_batch"), col("d_num"), col("ks_micro"),
            col("reject_05"))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
  }
}
