package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{EvalOps, EventOps, FeatureOps, Multimodal, TextOps, VectorOps}

/** Text slice of [[LlmSurface]] — text analysis, tokenization, language modeling, corpus curation.
  *
  * r14 mechanical split, ZERO behavior change: query lambdas and their
  * DuckDB oracle SQL only. Every shared helper, constant, and CTE
  * generator stays in [[LlmSurface]] (reached via the wildcard import
  * below, which inner-scope-shadows functions._ exactly like the
  * original enclosing-object scope did).
  */
private[queries] object LlmTextQueries {

  import LlmSurface._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- per-document text statistics ------------------------------------
    "llm_text_stats" -> ((s, dir) => {
      TextOps.textStats(Tables(s, dir, "documents"), "doc_id", "text", stopwords)
        .orderBy("doc_id")
    }),

    // ---- Shannon word entropy (gibberish / boilerplate signal) -----------
    // Integer micro-nat quantization per term BEFORE the per-doc sum
    // (X61 trick) makes the float math partition- and engine-proof.
    "llm_entropy" -> ((s, dir) => {
      TextOps.wordEntropy(Tables(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("doc", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- cross-source n-gram overlap matrix ------------------------------
    // Corpus analytics for mixture design: how much distinct-5-gram
    // content do sources (here: lang subsets) share? The gram join's
    // fan-out per gram is bounded by |sources| (distinct (source, gram)
    // rows), never corpus size; output is |sources|² rows.
    // ---- inverted index (posting lists) ----------------------------------
    // The retrieval artifact behind BM25/decontamination: per word, df +
    // total tf + "doc:tf,…" postings. The cap that keeps stopword lists
    // from going corpus-sized is SCALE-RELATIVE (df ≤ 80% of n_docs) —
    // a fixed cap would flip classes as the corpus grows; the count() is
    // the legitimate 1-value scalar the tfidf query also uses.
    "llm_inverted_index" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val maxDf = (docs.count() * 8 / 10).toInt
      TextOps.invertedIndex(docs, "doc_id", "text", maxDf).orderBy("word")
    }),

    // ---- quality-threshold sweep (calibration curve) ---------------------
    // What fraction of docs/tokens survives each quality threshold? The
    // curve a curation rollout reads before picking its cutoff. The
    // cumulative runs over the ≤1001-row milli-quality histogram — the
    // same bounded single-partition window the token-budget op justifies;
    // the corpus itself never sorts globally.
    "llm_threshold_sweep" -> ((s, dir) => {
      val win = org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("_w"))
        .select(col("doc_id"),
          size(col("_w")).cast("long").as("n_tokens"),
          floor(TextOps.qualityScore(col("_w"), stopwords) * 1000)
            .cast("long").as("threshold_mq"))
      val hist = d.groupBy("threshold_mq")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("_bt"))
      val cum = win.orderBy(col("threshold_mq").desc)
        .rowsBetween(win.unboundedPreceding, 0)
      val tot = hist.agg(sum("n_docs").cast("long").as("_td"),
        sum("_bt").cast("long").as("_tt"))
      hist
        .withColumn("n_docs_kept", sum("n_docs").over(cum).cast("long"))
        .withColumn("n_tokens_kept", sum("_bt").over(cum).cast("long"))
        .crossJoin(broadcast(tot))
        .select(col("threshold_mq"), col("n_docs").cast("long").as("n_docs"),
          col("n_docs_kept"), col("n_tokens_kept"),
          TextOps.round6(col("n_docs_kept") / col("_td").cast("double")).as("doc_frac"),
          TextOps.round6(col("n_tokens_kept") / col("_tt").cast("double")).as("token_frac"))
        .orderBy("threshold_mq")
    }),

    // ---- multi-epoch shuffle plan (reproducible permutations) ------------
    // Per (epoch, doc): shard + within-shard sort key, pure md5 of
    // (epoch, id) — different permutation per epoch, reproducible under
    // retry, no global sort anywhere. The loader artifact next to
    // llm_seq_manifest.
    "llm_epoch_shuffle" -> ((s, dir) => {
      TextOps.epochShufflePlan(Tables(s, dir, "documents"), "doc_id",
          epochs = 3, shards = 8)
        .orderBy("epoch", "doc_id")
    }),

    // ---- length-bucketed inference batching (padding economics) ----------
    // Power-of-two length buckets (integer bit-length — exact in both
    // engines), md5-deterministic batch assignment, per-batch pad-to-max
    // waste. No windows, no global order: the scalable trade vs a
    // sorted batcher is bounded <2x in-bucket spread.
    "llm_length_batches" -> ((s, dir) => {
      TextOps.lengthBucketBatches(Tables(s, dir, "documents"),
          "doc_id", "text", batchSize = 16)
        .orderBy("len_bucket", "batch_idx")
    }),

    // ---- BPE merge-candidate counting (tokenizer training inner loop) ----
    // Adjacent-pair counts weighted by word frequency over the vocab
    // table (corpus touched once); top-20 with deterministic tiebreak.
    "llm_bpe_pairs" -> ((s, dir) => {
      TextOps.bpePairCounts(Tables(s, dir, "documents"), "text", topK = 20)
    }),

    // ---- full BPE tokenizer TRAINING + corpus encoding (X192) ------------
    // The iterated closure of llm_bpe_pairs: 12 rounds of
    // count → argmax → merge over the vocab table produce the ordered
    // merge list, then the corpus is encoded with it (per-source token
    // totals from the trained segmentation — graduating llm_token_count
    // from "BPE-ish regex" to a real trained tokenizer). The oracle
    // replays all 12 rounds as unrolled CTEs (the kMeans X56 pattern);
    // every merge row and every encoded count must hash-match.
    "llm_bpe_train" -> ((s, dir) => {
      TextOps.bpeTrain(Tables(s, dir, "documents"), "source", "text",
        merges = 12)
    }),

    // ---- incremental snapshot curation (X97 ∘ X58 composition) -----------
    // The nightly question for a continuously-crawled corpus: which docs
    // of the NEW batch survive against the curated base? Planted batch
    // (both engines): exact re-crawls (id%31, verbatim copy), light
    // edits (id%29, one appended token), and genuinely new docs (id%37).
    // Decision cascade per batch doc, first match wins:
    //   1 exact_dup_of_v1  — content sha already in the base (keeper =
    //     min base doc with that sha; a |batch|⋈|base| equi-join on sha)
    //   2 near_dup_of_v1   — SimHash ≤3 bits from a base doc (the chunk
    //     -key equi-join over base ∪ batch doubles as the persisted-
    //     index probe at scale: batch rows hash into the SAME buckets a
    //     maintained index stores, so only bucket-mates pair)
    //   3 near_dup_in_batch / kept_group_rep — survivors cluster among
    //     THEMSELVES (CC bounded by the batch's touch set, the X119
    //     argument); min-id member represents the group
    //   4 novel            — keep.
    // Statuses depend on actual simhash distances — deterministic for
    // the fixed corpus, and the oracle recomputes them from scratch
    // (recursive-CTE CC over the same planted union).
    "llm_incremental_curate" -> ((s, dir) => {
      val v1 = Tables(s, dir, "documents").select("doc_id", "text")
      val batch = v1.filter(col("doc_id") % 31 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        .unionByName(v1.filter(col("doc_id") % 29 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" new")).as("text")))
        .unionByName(v1.filter(col("doc_id") % 37 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(lit("novel doc "), col("doc_id").cast("string"),
              lit(" standalone content")).as("text")))
      val v1sha = v1.select(sha2(col("text"), 256).as("_h"), col("doc_id"))
        .groupBy("_h").agg(min("doc_id").as("_v1keeper"))
      val bsha = batch.select(col("doc_id"), sha2(col("text"), 256).as("_h"))
        .join(v1sha, Seq("_h"), "left")
        .select("doc_id", "_v1keeper")
      // probe-vs-index, not a union self-join: the corpus×corpus pair
      // space is never enumerated — at scale the chunked corpus side is
      // the persisted posting table and the nightly batch probes it
      val pairs = TextOps.simHashNearDupProbe(v1.unionByName(batch), batch,
        "doc_id", "text", maxHamming = 3, chunks = 4)
      def isBatch(c: Column) = c >= 1000000L
      val crossPairs = pairs
        .select(col("doc_a").as("b"), col("doc_b").as("v"))
        .unionByName(pairs.select(col("doc_b").as("b"), col("doc_a").as("v")))
        .filter(isBatch(col("b")) && !isBatch(col("v")))
        .groupBy("b").agg(min("v").as("_nearv1"))
        .withColumnRenamed("b", "doc_id")
      val claimed = bsha.filter(col("_v1keeper").isNotNull).select("doc_id")
        .unionByName(crossPairs.select("doc_id")).distinct()
      val bb = pairs.filter(isBatch(col("doc_a")) && isBatch(col("doc_b")))
        .join(claimed.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_anti")
        .join(claimed.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_anti")
      val labels = graft.operators.ConnectedComponents
        .alternatingStars(bb, "doc_a", "doc_b")
        .withColumnRenamed("node", "doc_id")
      bsha
        .join(crossPairs, Seq("doc_id"), "left")
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("_v1keeper").isNotNull, lit("exact_dup_of_v1"))
            .when(col("_nearv1").isNotNull, lit("near_dup_of_v1"))
            .when(col("label").isNotNull && col("label") =!= col("doc_id"),
              lit("near_dup_in_batch"))
            .when(col("label").isNotNull, lit("kept_group_rep"))
            .otherwise(lit("novel")).as("status"),
          coalesce(col("_v1keeper"), col("_nearv1"), col("label"),
            col("doc_id")).as("keeper"))
        .withColumn("keep", col("keeper") === col("doc_id"))
        .orderBy("doc_id")
    }),

    "llm_source_overlap" -> ((s, dir) => {
      val grams = Tables(s, dir, "documents")
        .select(col("lang"), TextOps.words(col("text")).as("_w"))
        .select(col("lang"),
          explode(TextOps.shinglesFromWords(col("_w"), 5)).as("g"))
        .distinct()
      val sizes = grams.groupBy("lang").agg(count(lit(1)).as("n"))
      val shared = grams.select(col("lang").as("lang_a"), col("g"))
        .join(grams.select(col("lang").as("lang_b"), col("g")), "g")
        .filter(col("lang_a") < col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(count(lit(1)).as("shared_grams"))
      shared
        .join(sizes.select(col("lang").as("lang_a"), col("n").as("grams_a")), "lang_a")
        .join(sizes.select(col("lang").as("lang_b"), col("n").as("grams_b")), "lang_b")
        .select(col("lang_a"), col("lang_b"), col("shared_grams"),
          col("grams_a"), col("grams_b"),
          TextOps.round6(col("shared_grams")
            / least(col("grams_a"), col("grams_b")).cast("double")).as("overlap"))
        .orderBy("lang_a", "lang_b")
    }),

    // ---- hashed linear classifier inference (fastText shape) -------------
    // Feature-hash bag of words -> equi-join a 1024-row weight table ->
    // per-doc integer logit. The weight table is a deterministic md5
    // stand-in for a trained model; the plan is exactly the production
    // inference pass (swap the table, keep the plan).
    "llm_classifier" -> ((s, dir) => {
      val feats = TextOps.hashedFeatures(
        Tables(s, dir, "documents"), "doc_id", "text", 1024, "feat")
      TextOps.linearScore(feats, TextOps.hashModelWeights(s, 1024, "wgt"))
        .withColumnRenamed("doc", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- classifier TRAINING (X193): the missing half of llm_classifier --
    // 10 rounds of full-batch hard-sigmoid logistic GD in exact integer
    // arithmetic (per-sample SGD is a sequential chain — rejected; the
    // hard sigmoid replaces transcendental exp, which is not bit-stable
    // cross-engine), with class-balanced gradients and per-feature
    // gradient clipping (Zipfian word-frequency heads otherwise slam
    // the weights to saturation — observed). Target = DISTILLING a
    // heuristic quality gate (stopword per-mille ≥ the corpus median of
    // 61) into the hashed linear model — the fastText-classifier
    // pattern production pipelines run: train a cheap model to
    // reproduce an expensive teacher rule. (The corpus's `lang` column
    // was tried first and is UNLEARNABLE by construction — the
    // synthetic text shares one vocabulary across langs; a target the
    // features can't express proves nothing about the training loop.)
    // Output: training curve, top-32 trained weights, and the confusion
    // counts from feeding the trained table through the SAME
    // linearScore inference op the llm_classifier row uses. Oracle
    // replays all 10 rounds as unrolled MATERIALIZED CTEs.
    "llm_classifier_train" -> ((s, dir) => {
      val ws = TextOps.words(col("text"))
      val stopCount = size(filter(ws,
        w => w.isin("the", "a", "of", "to", "and")))
      TextOps.trainLinearClassifier(Tables(s, dir, "documents"),
        "doc_id", "text", stopCount * 1000 >= lit(61) * size(ws),
        numBuckets = 4096, salt = "clf", rounds = 10, lrDiv = 200L,
        clipMilli = 300L, topW = 32)
    }),

    // ---- dataset cartography over the training run (X396) ----------------
    // Swayamdipta et al. EMNLP 2020: map every example by its ACROSS-
    // ROUNDS behavior in the exact llm_classifier_train run — mean
    // confidence in the true label, confidence variance, rounds
    // correct — and band the corpus into easy / ambiguous / hard (hard
    // ~ label-noise candidates, ambiguous ~ the generalization-bearing
    // middle). All stats are exact integers off the per-round micro
    // residuals; the oracle replays the shared 10-round CTE chain.
    "llm_data_cartography" -> ((s, dir) => {
      val ws = TextOps.words(col("text"))
      val stopCount = size(filter(ws,
        w => w.isin("the", "a", "of", "to", "and")))
      TextOps.trainingCartography(Tables(s, dir, "documents"),
        "doc_id", "text", stopCount * 1000 >= lit(61) * size(ws),
        numBuckets = 4096, salt = "clf", rounds = 10, lrDiv = 200L,
        clipMilli = 300L)
        .withColumnRenamed("doc", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- AdaBoost stump ensemble, histogram split search (X306) ----------
    // The trained ENSEMBLE next to X198's single linear model: 3
    // boosting rounds over decision stumps on 5 cheap integer features,
    // mimicking the same 5-stopword teacher gate. Each round's whole
    // split search is ONE corpus-pass weighted histogram agg + prefix
    // sums over the metadata-sized (feature × bucket) table — the
    // LightGBM histogram trick — and weights stay exact integers by
    // cross-multiplying the round's error/correct masses instead of
    // dividing. See operators/AdaBoost.scala for the full argument.
    "llm_adaboost" -> ((s, dir) => {
      val ws = TextOps.words(col("text"))
      val feats = Tables(s, dir, "documents")
        .select(col("n_chars").cast("long").as("nc"),
          size(ws).cast("long").as("n"),
          size(filter(ws, w => w === "the")).cast("long").as("cthe"),
          size(filter(ws, w => w === "a")).cast("long").as("ca"),
          size(filter(ws, w => w.isin("of", "to"))).cast("long").as("cot"),
          size(filter(ws, w => w.isin("the", "a", "of", "to", "and")))
            .cast("long").as("cstop"))
        .filter(col("n") > 0)
        .select(
          expr("((cthe * 1000) div n) div 8").as("f_pm_the"),
          expr("((ca * 1000) div n) div 8").as("f_pm_a"),
          expr("((cot * 1000) div n) div 8").as("f_pm_ofto"),
          expr("n div 4").as("f_n_words"),
          expr("((nc * 100) div n) div 8").as("f_cpw"),
          (col("cstop") * 1000 >= col("n") * 61).as("y"))
      graft.operators.AdaBoost.trainStumps(feats,
        Seq("f_pm_the", "f_pm_a", "f_pm_ofto", "f_n_words", "f_cpw"),
        col("y"), rounds = 3)
    }),

    // ---- TRAINED language ID (char-trigram Naive Bayes) ------------------
    // The production lang-ID shape next to the marker heuristic: train
    // per-lang trigram log-probs from the labeled corpus, classify every
    // doc, report correctness. Synthetic labels are content-random, so
    // accuracy hovers near the majority class — the plumbing (model
    // training aggs, floor-handling inference join, argmax tiebreak) is
    // what this pins cross-engine.
    "llm_langid_trained" -> ((s, dir) => {
      TextOps.naiveBayesLangId(Tables(s, dir, "documents"), "doc_id", "text", "lang")
        .withColumnRenamed("doc", "doc_id")
        .withColumnRenamed("lang_true", "lang")
        .orderBy("doc_id")
    }),

    // ---- BOUNDED trained language ID (hashed features, X392) --------------
    // The scale-safe twin the unhashed variant's vocab-envelope guard
    // names as the remedy: trigrams hash into a FIXED 2^20-cell feature
    // space, so the model is <= |langs|*2^20 rows at ANY corpus size —
    // the Heaps'-law superlinearity that makes llm_langid_trained
    // envelope-guarded cannot occur here by construction.
    "llm_langid_hashed" -> ((s, dir) => {
      TextOps.naiveBayesLangIdHashed(
        Tables(s, dir, "documents"), "doc_id", "text", "lang")
        .withColumnRenamed("doc", "doc_id")
        .withColumnRenamed("lang_true", "lang")
        .orderBy("doc_id")
    }),

    // ---- language-ID heuristic + quality score ---------------------------
    "llm_lang_quality" -> ((s, dir) => {
      // split once per row (own projection); every stat reads the array
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), TextOps.words(col("text")).as("_w"))
      val w = col("_w")
      val quality = TextOps.qualityScore(w, stopwords)
      d.select(
        col("doc_id"), col("lang"),
        TextOps.languageIdFromWords(w, langMarkers).as("pred_lang"),
        quality.as("quality"))
        .withColumn("band",
          when(col("quality") >= 0.6, "high")
            .when(col("quality") >= 0.4, "mid")
            .otherwise("low"))
        .orderBy("doc_id")
    }),

    // ---- Flesch readability per source (X349) -----------------------------
    // Kincaid et al. 1975 / Flesch 1948 on exact integer grids: words
    // from the shared single-space split, sentences = [.!?]+ runs
    // floored at 1 (this corpus is punctuation-free soup, so S = 1 —
    // the W/S term honestly degenerates to W; documented, and the
    // formula is the real one for any punctuated feed), syllables =
    // [aeiouy]+ vowel groups floored at one per word. Both grades are
    // ONE toward-zero division of a shared integer numerator over
    // S·W, so the per-doc grid is bit-identical cross-engine; the
    // per-source means divide the summed grids once more.
    "llm_readability" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("source"), col("text"))
        .withColumn("w", size(TextOps.words(col("text"))).cast("long"))
        .withColumn("sct",
          greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
            .cast("long"))
        .withColumn("y",
          greatest(regexp_count(col("text"), lit("[aeiouy]+")).cast("long"),
            col("w")))
        .withColumn("fk_micro", expr(
          "(390000*w*w + 11800000*y*sct - 15590000*sct*w) div (sct*w)"))
        .withColumn("fre_micro", expr(
          "(206835000*sct*w - 1015000*w*w - 84600000*y*sct) div (sct*w)"))
      d.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("w").as("total_words"),
          expr("sum(fk_micro) div count(1)").as("fk_mean_micro"),
          expr("sum(fre_micro) div count(1)").as("fre_mean_micro"),
          sum(when(col("fre_micro") < 30000000L, 1L).otherwise(0L))
            .as("hard_docs"))
        .orderBy("source")
    }),

    // ---- Gopher-style quality rule composite per source (X350) ------------
    // Rae et al. 2021 §A1.1 rule filters, each an exact integer
    // cross-multiplication (no ratio floats): word count in [50, 1e5],
    // mean word length in [3, 10] (char sum = len − (W−1) on the
    // single-space soup), ≥80% alphabetic words, ≥2 of the 8 Gopher
    // stopwords present, symbol-to-word ratio ≤ 0.1. The per-rule
    // failure tallies say WHICH rule gates a source — the actionable
    // readout for mixture curation next to the score-style
    // llm_lang_quality.
    "llm_gopher_rules" -> ((s, dir) => {
      val gopherStops =
        Seq("the", "be", "to", "of", "and", "that", "have", "with")
      val d = Tables(s, dir, "documents")
        .select(col("source"), col("text"),
          TextOps.words(col("text")).as("_w"))
        .withColumn("w", size(col("_w")).cast("long"))
        .withColumn("lsum",
          (length(col("text")) - (col("w") - 1)).cast("long"))
        .withColumn("alpha_w",
          expr("cast(size(filter(_w, x -> x rlike '[a-z]')) as bigint)"))
        .withColumn("stop_hits",
          gopherStops.map(sw =>
            when(array_contains(col("_w"), sw), 1L).otherwise(0L))
            .reduce(_ + _))
        .withColumn("syms", regexp_count(col("text"), lit("[#…]")).cast("long"))
        .withColumn("r_wc", col("w") >= 50L && col("w") <= 100000L)
        .withColumn("r_mwl",
          col("lsum") >= col("w") * 3L && col("lsum") <= col("w") * 10L)
        .withColumn("r_alpha", col("alpha_w") * 10L >= col("w") * 8L)
        .withColumn("r_stop", col("stop_hits") >= 2L)
        .withColumn("r_sym", col("syms") * 10L <= col("w"))
        .withColumn("pass", col("r_wc") && col("r_mwl") && col("r_alpha")
          && col("r_stop") && col("r_sym"))
      d.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
          // the soup corpus lacks the natural-language stopword set
          // entirely, so the paper-faithful composite gates on r_stop
          // everywhere; the no-stopword variant is the readout that
          // DISCRIMINATES here (and the per-rule tallies say why)
          sum(when(col("r_wc") && col("r_mwl") && col("r_alpha")
            && col("r_sym"), 1L).otherwise(0L)).as("n_pass_nostop"),
          sum(when(!col("r_wc"), 1L).otherwise(0L)).as("fail_wordcount"),
          sum(when(!col("r_mwl"), 1L).otherwise(0L)).as("fail_wordlen"),
          sum(when(!col("r_stop"), 1L).otherwise(0L)).as("fail_stopwords"))
        .orderBy("source")
    }),

    // ---- Katz burstiness / word adaptation (X358) --------------------------
    // Church & Gale 1995 / Katz 1996: P(word recurs in a doc | it
    // appeared at all) — the TEMPLATE detector unigram frequency
    // misses: a word can be corpus-rare yet always arrive in bursts
    // (boilerplate blocks, signatures). adaptation_micro =
    // ⌊10⁶·df₂/df₁⌋ per word with df₂ = docs containing it ≥ 2×;
    // reported for the top-20 highest-df words plus the corpus-level
    // pooled rate. One (doc, word) combine agg — vocabulary-bounded
    // after, never corpus-bounded.
    "llm_burstiness" -> ((s, dir) => {
      val dw = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val perWord = dw.groupBy("w").agg(
        count(lit(1)).as("df1"),
        sum(when(col("tf") >= 2, 1L).otherwise(0L)).as("df2"))
      val top = perWord
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("df1").desc, col("w"))))
        .filter(col("_rn") <= 20)
        .select(col("w"), col("df1"), col("df2"),
          expr("(df2 * 1000000) div df1").as("adaptation_micro"))
      val pooled = perWord.agg(
        lit("__corpus__").as("w"),
        sum("df1").as("df1"), sum("df2").as("df2"),
        expr("(sum(df2) * 1000000) div sum(df1)").as("adaptation_micro"))
      top.unionByName(pooled).orderBy("w")
    }),

    // ---- corpus rollup by (lang, source) ---------------------------------
    "llm_corpus_summary" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("wordset_fp", TextOps.wordsetFingerprint(col("text")))
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("total_chars"),
          countDistinct(col("wordset_fp")).as("distinct_wordsets"))
        .withColumn("avg_chars",
          TextOps.round6(col("total_chars") / col("n_docs")))
        .orderBy("lang", "source")
    }),

    // ---- deterministic train/val/test split (md5 hash buckets) -----------
    // Membership is a pure function of doc_id: stable across runs,
    // partitionings, engines, and corpus growth.
    "llm_hash_split" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val b = TextOps.hashBucket(col("doc_id"), "split")
      d.withColumn("split",
          when(b < 80, "train").when(b < 90, "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("total_chars"))
        .orderBy("lang", "split")
    }),

    // ---- composed curation pipeline: quality filter -> dedup -> sample ---
    // The end-to-end shape of a training-data curation job, as ONE lazy
    // plan: score -> threshold -> fingerprint keep-first dedup (min_by
    // argmin, map-side combine) -> 50% deterministic sample. Catalyst
    // fuses the narrow stages; the only exchange is the dedup groupBy.
    // Threshold 0.3: the synthetic corpus's quality scores span
    // 0.21–0.36, so the earlier 0.4 threshold made this entry a vacuous
    // 0-row green two rounds running; 0.3 keeps ~44% of docs and every
    // downstream stage (dedup, sample) now sees real rows — guarded by
    // the NON_EMPTY check in Verify/check_oracle.
    "llm_curation_pipeline" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
          TextOps.words(col("text")).as("_w"))
      val nWords = size(col("_w"))
      val quality = TextOps.qualityScore(col("_w"), stopwords)
      d.withColumn("quality", quality)
        .filter(col("quality") >= 0.3)
        .withColumn("wordset_fp", TextOps.wordsetFingerprint(col("text")))
        .groupBy("wordset_fp")
        .agg(min_by(
          struct(col("doc_id"), col("lang"), nWords.as("n_words"), col("quality")),
          col("doc_id")).as("_f"))
        .select(col("_f.doc_id").as("doc_id"), col("_f.lang").as("lang"),
          col("_f.n_words").as("n_words"), col("_f.quality").as("quality"))
        .filter(TextOps.hashBucket(col("doc_id"), "smp") < 50)
        .orderBy("doc_id")
    }),

    // ---- corpus vocabulary: distributed word count -----------------------
    // The canonical explode → partial-agg → exchange → final-agg shape;
    // at 100 TB the map-side combine reduces the shuffle to |vocab| rows
    // per partition.
    "llm_vocab" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n_total"), countDistinct("doc_id").as("n_docs"))
        .orderBy("word")
    }),

    // ---- KMV set algebra: vocabulary overlap cardinalities per source ----
    // Theta-sketch-style set operations on the engine-independent KMV
    // sketch (X102's r9 machinery): per-source vocabulary NDV, pairwise
    // union NDV from the MERGED sketch (k smallest of A∪B ⊆ K_A ∪ K_B —
    // the standard mergeability argument), intersection by
    // inclusion–exclusion (clamped at 0; error ~2·1/√(k−2) per operand,
    // the documented cost of the composed estimator), and the implied
    // Jaccard. One corpus pass builds all |sources| sketches; the
    // pairwise matrix is a broadcast self-join of the |sources|-row
    // sketch table — the corpus is never touched again. Differs from
    // llm_minhash_overlap (X145): that estimates similarity directly;
    // this estimates CARDINALITIES (the numbers a mixture planner needs
    // to size union corpora and shared-vocabulary budgets). Every value
    // is a pure function of the data — full hash oracle.
    "llm_kmv_set_ops" -> ((s, dir) => {
      val k = 128
      def est(c: String) = kmvEst(c, k)
      // localCheckpoint: the |sources|-row sketch table is referenced on
      // BOTH sides of the pair self-join — without materialization each
      // reference re-runs the corpus scan + aggregation (PlanAuditSpec
      // pins the single scan)
      val sk = Tables(s, dir, "documents")
        .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
        .select(col("source"), expr(
          "cast(conv(substring(md5(concat('kmv|', w)), 1, 15), 16, 10) as bigint)")
          .as("h"))
        .groupBy("source")
        .agg(expr(s"bottomk_distinct_long(h, $k)").as("kmv"))
        .localCheckpoint(true)
      sk.select(col("source").as("source_a"), col("kmv").as("ka"))
        .join(broadcast(sk.select(col("source").as("source_b"), col("kmv").as("kb"))),
          col("source_a") < col("source_b"))
        .withColumn("ku", expr(s"slice(array_sort(array_distinct(concat(ka, kb))), 1, $k)"))
        .select(col("source_a"), col("source_b"),
          est("ka").as("vocab_a_est"), est("kb").as("vocab_b_est"),
          est("ku").as("union_est"))
        .withColumn("intersect_est", greatest(lit(0L),
          col("vocab_a_est") + col("vocab_b_est") - col("union_est")))
        .withColumn("jaccard_est", TextOps.round6(
          col("intersect_est").cast("double") / col("union_est").cast("double")))
        .orderBy("source_a", "source_b")
    }),

    // ---- token counting: whitespace vs BPE-ish vs chars/4 estimate -------
    // Three token-count estimators side by side (mix planning needs a
    // consistent one): whitespace words, a BPE-ish regex (alnum runs +
    // single non-alnum marks — the granularity a byte-BPE roughly lands
    // at), and the chars/4 rule of thumb. The regex spells whitespace as
    // explicit chars so Java regex and RE2 agree byte-for-byte.
    "llm_token_count" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), TextOps.words(col("text")).as("_w"))
      d.select(col("doc_id"),
          size(col("_w")).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"), lit(BpeTokenRe), lit(0)))
            .cast("long").as("n_bpe_tokens"),
          floor((length(col("text")) + 3) / 4).cast("long").as("est_tokens"))
        .withColumn("bpe_per_word",
          TextOps.round6(col("n_bpe_tokens").cast("double") / col("n_ws_tokens")))
        .orderBy("doc_id")
    }),

    // ---- per-domain capping (C4/RefinedWeb-style host budget) ------------
    // Cap every web domain at k documents, chosen reproducibly: domain
    // from the (injected) URL, then the SAME salted two-phase top-k the
    // stratified sampler uses — a hot domain never lands on one task.
    // The oracle is the single-window form, re-proving the two-phase
    // equivalence on a second operator. Corpus has no natural URLs, so
    // every 3rd doc gets one of 7 deterministic domains (both engines).
    "llm_domain_caps" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .withColumn("aug",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" https://site"),
              (col("doc_id") % 7).cast("string"), lit(".test/page")))
            .otherwise(col("text")))
        .withColumn("domain", regexp_extract(col("aug"), UrlDomainRe, 1))
        .filter(col("domain") =!= "")
        .select("doc_id", "domain")
      val kept = graft.operators.Sampling
        .stratifiedTopK(d, "domain", "doc_id", k = 10, salt = "domcap")
        .select(col("doc_id"), lit(true).as("_k"))
      d.join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("domain"),
          coalesce(col("_k"), lit(false)).as("kept"))
        .orderBy("doc_id")
    }),

    // ---- data-mixture weights: token shares -> α=0.5 sampling weights ----
    // The corpus-mixing step of a training run (temperature-scaled
    // source sampling, DoReMi/GPT-3 style): per-source token share,
    // α = 0.5 up-weighting of low-resource sources via sqrt — chosen
    // BECAUSE IEEE sqrt is correctly rounded and therefore bit-identical
    // across engines, where pow(x, 0.7) is not — then normalized on a
    // micro-unit integer grid (the cross-row sum is exact integer math,
    // never a float reduction). Everything reduces over |sources| rows;
    // the corpus pass is one partial-combine aggregation.
    "llm_mixture_weights" -> ((s, dir) =>
      mixtureWeights(s, dir).orderBy("source")),

    // ---- mixture application: deterministic per-source sampling ----------
    // Turns X70's boosts into an actual emission plan: every doc gets
    // n_copies = floor(boost) + one md5-coin copy for the fractional
    // part — down-sampled sources drop docs (n_copies 0), up-weighted
    // sources repeat them. All comparisons are INTEGER (micro-unit
    // boost vs 16-bit hash cross-multiplied), so membership is a pure
    // function of (source boost, doc_id) — reproducible across runs,
    // partitionings, and engines, and the |sources|-row boost table is
    // an AQE-decided equi-join.
    "llm_mixture_sample" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id", "source")
      val h16 = conv(substring(
        md5(concat(lit("mix|"), col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long")
      docs.join(mixtureWeights(s, dir).select("source", "boost"), "source")
        .withColumn("_bm", floor(col("boost") * 1000000.0 + 0.5).cast("long"))
        .withColumn("_h", h16)
        .withColumn("n_copies",
          expr("_bm div 1000000")
            + when(col("_h") * 1000000L < (col("_bm") % 1000000L) * 65536L, 1L)
              .otherwise(0L))
        .select("doc_id", "source", "boost", "n_copies")
        .orderBy("doc_id")
    }),

    // ---- group-DRO mixture schedule: multiplicative weights (X322) -------
    // Where X70 answers "what share does each source get" with one
    // static temperature scaling, this answers "how should the shares
    // MOVE" (DoReMi-style dynamics — operators/MultiplicativeWeights
    // .scala): excess-loss proxy = each source's fractional mean-token
    // deficit vs the corpus mean (the pluggable slot a real run fills
    // with proxy-model excess loss), then five (1 + eta*loss) rounds
    // concentrate shares on the lagging sources without zeroing the
    // easy ones. One combine agg reduces the corpus to |sources| rows;
    // every round after that is model-sized. All-integer micro math,
    // floored once per division, so the unrolled CTE replay is exact.
    "llm_mixture_dro" -> ((s, dir) => {
      val stats = Tables(s, dir, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("tok").as("t"))
      val tot = stats.agg(sum("n").as("tn"), sum("t").as("tt"))
      val losses = stats.crossJoin(broadcast(tot))
        .select(col("source").as("group"),
          greatest(
            expr("(((tt * 1000000) div tn - (t * 1000000) div n)" +
              " * 1000000) div ((tt * 1000000) div tn)"),
            lit(0L)).as("loss_micro"))
      graft.operators.MultiplicativeWeights
        .schedule(losses, rounds = 5, etaPermille = 500L)
        .withColumnRenamed("group", "source")
        .orderBy("round", "source")
    }),

    // ---- TF-IDF: rarity-weighted terms, top-3 per document ---------------
    // tf from one explode+agg, document frequency from a second agg over
    // the (doc, word) pairs, idf joined back on `word` as a PLAIN
    // equi-join: |vocab| grows with the corpus (Heaps' law — billions of
    // distinct tokens at 100 TB), so a forced broadcast of dfreq would
    // OOM long before real scale. AQE still picks broadcast at small
    // scale from real stats; the fallback shuffle is tiny next to the tf
    // explode that precedes it. ln() agrees bit-for-bit between JVM
    // Math.log and DuckDB's libm on this data (both fdlibm-derived;
    // round6 adds nine orders of magnitude of slack) — verified at all
    // three SFs.
    "llm_tfidf" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val nDocs = docs.count().toDouble
      val tf = docs
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, "word")
        .withColumn("tfidf", TextOps.round6(col("tf") * log(lit(nDocs) / col("df"))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("tfidf").desc, col("word"))
      scored.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 3)
        .select(col("doc_id"), col("word"), col("tf"), col("tfidf"))
        .orderBy("doc_id", "word")
    }),

    // ---- BM25: length-normalized saturating term relevance, top-3/doc ----
    // The retrieval-grade upgrade of llm_tfidf (same explode/agg
    // skeleton, same vocab equi-join): Lucene-form idf
    // ln(1 + (N - df + 0.5)/(df + 0.5)) × tf saturation with k1 = 1.2,
    // b = 0.75. All float math is per-row with an identical expression
    // shape in both engines (constants spelled as double literals here
    // and CAST(... AS DOUBLE) in the oracle — DuckDB would otherwise
    // parse them as DECIMAL and take a different arithmetic path); the
    // only cross-row reductions are integer counts. avgdl and N are
    // 1-row scalar aggregates (legitimate driver-side collects).
    "llm_bm25" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("_w"))
      val dl = d.select(col("doc_id"), size(col("_w")).cast("long").as("dl"))
      val scal = dl.agg(count(lit(1)).as("n"), sum("dl").as("t")).collect()(0)
      val nDocs = scal.getLong(0)
      val avgdl = scal.getLong(1).toDouble / nDocs.toDouble
      val tf = d.select(col("doc_id"), explode(col("_w")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val idf = log(lit(1.0) +
        (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      val scored = tf.join(dfreq, "word").join(dl, "doc_id")
        .withColumn("bm25", TextOps.round6(
          idf * (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / lit(avgdl))))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("bm25").desc, col("word"))
      scored.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 3)
        .select(col("doc_id"), col("word"), col("tf"), col("bm25"))
        .orderBy("doc_id", "word")
    }),

    // ---- Dirichlet query-likelihood retrieval (X351) ----------------------
    // The language-model retrieval scorer next to llm_bm25's tf-idf
    // family (Zhai & Lafferty 2001): score(q,d) = Σ_w c(w,q)·ln p(w|d)
    // with p(w|d) = (tf + μ·cf/|C|)/(|d| + μ), μ = 2000. Decomposed so
    // only MATCHED terms join: per-query constant Σ c(w,q)·(lmu(μ·cf)
    // − lmu(|C|)), a doc-length term |q|·lmu(|d|+μ), and the matched
    // correction Σ c(w,q)·(lmu(tf·|C| + μ·cf) − lmu(μ·cf)) — every ln
    // is a micro-floored ln of an INTEGER (the X344 discipline; exp
    // never evaluated). Candidates = postings equi-join on the word
    // key (docs sharing ≥1 query term — inverted-index semantics);
    // top-5 per query, ties by doc_id. The query panel is CAPPED at
    // 24 (doc_id % 100 == 0 and doc_id/100 < 24): on a dense shared
    // vocabulary every doc matches every query, so a panel that grew
    // WITH the corpus made the join quadratic — measured 3.3 s →
    // 163 s at 10× data before the cap, corpus-linear after (the
    // llm_ann_recall bounded-panel discipline).
    "llm_lm_retrieval" -> ((s, dir) =>
      lmRetrievalTop5(s, dir).orderBy("query_id", "rank")),

    // ---- retrieval quality eval of the QL scorer (X370) --------------------
    // MRR and success@5 of llm_lm_retrieval under SAME-SOURCE
    // relevance (query doc's source = the label-free proxy a
    // curation pipeline actually has): the eval that closes the
    // retrieval loop — a scorer change that tanks MRR here is caught
    // before it ships. Exact integers: per-query reciprocal rank is
    // ⌊10⁶/first-relevant-rank⌋, means divide once.
    "llm_lm_retrieval_eval" -> ((s, dir) => {
      val src = Tables(s, dir, "documents").select("doc_id", "source")
      val top = lmRetrievalTop5(s, dir)
        .join(src.select(col("doc_id").as("query_id"),
          col("source").as("qsrc")), "query_id")
        .join(src, "doc_id")
        .withColumn("rel", col("source") === col("qsrc"))
      val perQ = top.groupBy("query_id")
        .agg(min(when(col("rel"), col("rank"))).as("first_rel"))
        .select(col("query_id"),
          coalesce(expr("1000000 div first_rel"), lit(0L)).as("rr"),
          when(col("first_rel").isNotNull, 1L).otherwise(0L).as("hit"))
      perQ.agg(count(lit(1)).as("n_queries"),
          expr("sum(rr) div count(1)").as("mrr_micro"),
          expr("(sum(hit) * 1000000) div count(1)").as("success5_micro"))
    }),

    // ---- PII/URL scrubbing: URL -> email -> long-digit redaction ---------
    // The synthetic corpus contains no PII, so every third doc gets a
    // deterministically injected email + URL + digit run — the scrub then
    // does real work and the oracle verifies the exact redacted output
    // (an unmodified-corpus scrub would vacuously hash-match).
    "llm_pii_scrub" -> ((s, dir) => {
      val injected = concat(col("text"),
        lit(" reach user"), col("doc_id").cast("string"),
        lit("@example.com or https://site"), (col("doc_id") % 7).cast("string"),
        lit(".test ref 1234567890123"))
      val d = Tables(s, dir, "documents")
        .withColumn("aug", when(col("doc_id") % 3 === 0, injected).otherwise(col("text")))
      d.select(
        col("doc_id"),
        regexp_count(col("aug"), lit(TextOps.UrlRe)).as("n_urls"),
        regexp_count(col("aug"), lit(TextOps.EmailRe)).as("n_emails"),
        regexp_count(col("aug"), lit(TextOps.LongDigitRe)).as("n_longnums"),
        sha2(TextOps.scrubPii(col("aug")), 256).as("scrub_sha"))
        .orderBy("doc_id")
    }),

    // ---- Gopher-style repetition filter ----------------------------------
    // Top-2-gram / top-3-gram mass fractions (Rae et al. 2021 Table A1);
    // thresholds picked at ~p75 of this corpus so both classes of the
    // `repetitive` flag are populated. Docs shorter than the gram width
    // coalesce to 0.
    "llm_repetition_filter" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id")
      val t2 = TextOps.topNgramFraction(
        Tables(s, dir, "documents"), "doc_id", "text", 2)
        .withColumnRenamed("doc", "doc_id")
      val t3 = TextOps.topNgramFraction(
        Tables(s, dir, "documents"), "doc_id", "text", 3)
        .withColumnRenamed("doc", "doc_id")
      docs.join(t2, Seq("doc_id"), "left").join(t3, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("top2gram_frac"), lit(0.0)).as("top2gram_frac"),
          coalesce(col("top3gram_frac"), lit(0.0)).as("top3gram_frac"))
        .withColumn("repetitive",
          col("top2gram_frac") > 0.045 || col("top3gram_frac") > 0.04)
        .orderBy("doc_id")
    }),

    // ---- PII redaction (typed placeholder scrub + audit counts) ----------
    // PII is PLANTED deterministically from doc_id (emails on every doc,
    // IPs on evens, phones on ÷3, card runs on ÷5) because the synthetic
    // corpus contains none — without planting, the interesting paths
    // would be vacuously green. Both engines build the same augmented
    // text, then the oracle replays the identical 4-stage regex chain;
    // md5(redacted) hash-matching proves byte-identical redaction, not
    // just equal counts.
    "llm_pii_redact" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val planted = d.withColumn("_t", concat(
        col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@ex-"), pmod(col("doc_id"), lit(7)), lit(".com"),
        when(col("doc_id") % 2 === 0,
          concat(lit(" from 10."), pmod(col("doc_id"), lit(256)), lit(".0.1")))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          concat(lit(" call +1415555"), pmod(col("doc_id"), lit(9000)) + 1000))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" card 4111111111111111"))
          .otherwise(lit(""))))
      TextOps.redactPii(planted, "doc_id", "_t").orderBy("doc_id")
    }),

    // ---- sketch-guided heavy hitters (exact-confirmed) -------------------
    // Words with count ≥ 0.2% of total tokens via the count-min candidate
    // filter + exact confirmation (TextOps.heavyHitters): the vocabulary
    // long tail — which cannot contain a heavy hitter — never reaches the
    // exact aggregation's shuffle. The sketch changes the plan, never the
    // answer: the oracle recomputes the plain GROUP BY/HAVING.
    "llm_heavy_hitters" -> ((s, dir) => {
      TextOps.heavyHitters(Tables(s, dir, "documents"), "text",
        supportPpm = 2000L)
        .orderBy("word")
    }),

    // ---- bloom-prefiltered suppression (anti-join fast path) -------------
    // "Drop every doc whose sha is in the suppression index" via
    // BloomOps.bloomAntiJoin: definitely-absent rows bypass the shuffle
    // entirely (plan-embedded bloom probe, whole-stage codegen), only the
    // maybe sliver meets the index in the exact anti-join. The identity
    // result ≡ plain NOT IN is what the oracle hash-checks — the bloom
    // changes the PLAN, never the ANSWER (no false negatives). Index
    // stand-in = every 7th doc's sha; duplicate texts of a suppressed doc
    // are suppressed too (sha semantics, both engines).
    "llm_bloom_suppress" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("content_sha"))
      val index = docs.filter(col("doc_id") % 7 === 0).select("content_sha")
      graft.operators.BloomOps
        .bloomAntiJoin(docs, index, "content_sha", fpp = 0.01)
        .orderBy("doc_id")
    }),

    // ---- unigram log-prob quality score (CCNet-style LM filter) ----------
    // Add-one-smoothed unigram model trained on the corpus itself;
    // per-doc score = mean token log-prob. Each ln is quantized to
    // integer micro-nats BEFORE summing, so the cross-row reduction is
    // exact integer math — float sums are partition-order-dependent and
    // can never cross the engine boundary (ln itself is bit-stable here,
    // as proven by llm_tfidf at all SFs). The per-word model table is
    // |vocab|-sized (grows with the corpus), so it joins back as a plain
    // equi-join — no broadcast hint; AQE decides from real stats.
    "llm_unigram_logprob" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val tok = docs.select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      val counts = tok.groupBy("w").agg(count(lit(1)).as("c"))
      val totals = counts.agg(sum("c").as("n"), count(lit(1)).as("v")).collect()(0)
      val (n, v) = (totals.getLong(0), totals.getLong(1))
      val li = floor(log((col("c") + 1).cast("double") / lit((n + v).toDouble)) * 1e6 + 0.5)
        .cast("long")
      tok.join(counts.withColumn("_li", li).select("w", "_li"), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("_li").as("_s"))
        .select(col("doc_id"), col("n_tokens"),
          TextOps.round6(col("_s").cast("double") / (col("n_tokens") * lit(1000000.0)))
            .as("avg_logprob"))
        .orderBy("doc_id")
    }),

    // ---- bigram LM filter: conditional log-prob per document -------------
    // The KenLM-shape upgrade of the unigram filter: score each bigram
    // instance by ln P(w2|w1) with add-one smoothing, per-TYPE quantized
    // to integer micro-nats (X61 trick) before the per-doc instance sum.
    // Model = two aggregations joined on the first token; the vocab-
    // sized joins carry no broadcast hint (AQE decides — same rule the
    // round-5 verdict enforced on tfidf/unigram).
    "llm_bigram_logprob" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"), TextOps.words(col("text")).as("_w"))
      val uni = base.select(explode(col("_w")).as("_w1"))
        .groupBy("_w1").agg(count(lit(1)).as("c1"))
      val vocabV = uni.count() // 1-row scalar aggregate, legitimate
      val bi = base.select(col("doc_id"),
        explode(TextOps.shinglesFromWords(col("_w"), 2)).as("bg"))
      val lp = bi.groupBy("bg").agg(count(lit(1)).as("c2"))
        .withColumn("_w1", element_at(split(col("bg"), " "), 1))
        .join(uni, "_w1")
        .select(col("bg"),
          floor(log((col("c2") + 1).cast("double")
            / (col("c1") + lit(vocabV)).cast("double")) * 1e6 + 0.5)
            .cast("long").as("_lp"))
      val per = bi.join(lp, "bg")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("_lp").as("_st"))
      docs.select("doc_id").join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          TextOps.round6(col("_st") / (col("n_bigrams") * 1000000.0))
            .as("avg_bigram_logprob"))
        .orderBy("doc_id")
    }),

    // ---- sequence packing: docs -> fixed-length training windows ---------
    // Exact global token offsets via the two-level parallel scan
    // (bucket partial sums -> small-table running sum -> per-bucket
    // windows); bucketSize 128 so the verify corpus exercises multiple
    // buckets. Oracle is the single-window spelling — equivalence of
    // the decomposition is what the hash proves.
    "llm_pack_sequences" -> ((s, dir) => {
      TextOps.packSequences(Tables(s, dir, "documents"), "doc_id", "text",
        seqLen = 512, bucketSize = 128)
        .orderBy("doc_id")
    }),

    // ---- sequence manifest: (sequence, doc, token-range) loader table ----
    "llm_seq_manifest" -> ((s, dir) => {
      TextOps.sequenceManifest(Tables(s, dir, "documents"), "doc_id", "text",
        seqLen = 512, bucketSize = 128)
        .orderBy("seq_id", "doc_id")
    }),

    // ---- token-budget selection: best docs first, to a token budget ------
    // Bucketed-histogram cutoff (quality×1000 grid): cumulative sum runs
    // over the ≤1001-row histogram, never the corpus — the global-sort
    // prefix-sum window is rejected as a single-partition scale-killer.
    // Budget = 50% of corpus tokens, so semantics are sf-independent.
    "llm_token_budget" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), TextOps.words(col("text")).as("_w"))
      val quality = TextOps.qualityScore(col("_w"), stopwords)
      val base = d.select(col("doc_id"), quality.as("quality"),
        floor((length(col("text")) + 3) / 4).cast("int").as("est_tokens"))
      TextOps.tokenBudgetSelect(base, "quality", "est_tokens", 0.5)
        .select("doc_id", "quality", "est_tokens", "selected")
        .orderBy("doc_id")
    }),

    // ---- unicode NFC normalization (custom Catalyst expression) ----------
    // Every 5th doc gets a deterministically injected DECOMPOSED-unicode
    // suffix (e + combining acute, N + combining tilde) — the same
    // visible text as its composed form but different bytes, which would
    // defeat every content-hash dedup upstream. nfc_normalize (native
    // expression, codegen'd java.text.Normalizer call) composes it; the
    // oracle uses DuckDB's built-in nfc_normalize on the same injection.
    "llm_normalize" -> ((s, dir) => {
      val inj = concat(col("text"), lit(LlmSurface.NormSuffix))
      val d = Tables(s, dir, "documents")
        .withColumn("aug", when(col("doc_id") % 5 === 0, inj).otherwise(col("text")))
      val nfc = call_function("nfc_normalize", col("aug"))
      d.select(col("doc_id"),
          (nfc =!= col("aug")).as("changed"),
          sha2(lower(nfc), 256).as("norm_sha"))
        .orderBy("doc_id")
    }),

    // ---- context-window chunking: 40-word chunks, 8-word overlap ---------
    // The training-sample extraction step: each doc explodes into
    // overlapping word windows with a per-chunk sha for downstream dedup.
    "llm_chunking" -> ((s, dir) => {
      TextOps.chunkWords(Tables(s, dir, "documents"), "doc_id", "text",
        chunkSize = 40, overlap = 8)
        .orderBy("doc_id", "chunk_idx")
    }),

    // ---- stratified sample: k docs per language, hash-ordered ------------
    // Class balancing with reproducible membership: rank by md5(salt|id)
    // per stratum, keep the k smallest. Spark runs the salted TWO-PHASE
    // form (per-bucket top-k then per-stratum merge — no straggler task
    // when strata are few); the oracle is the plain single-window form,
    // so the hash compare proves the two-phase plan selects exactly the
    // same rows.
    "llm_stratified_sample" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedTopK(
        Tables(s, dir, "documents").select("doc_id", "lang"),
        "lang", "doc_id", k = 5, salt = "s5")
        .select("lang", "doc_id", "rank", "sample_key")
        .orderBy("lang", "rank")
    }),

    // ---- leave-one-source-out data valuation (ablation study) ------------
    // Which source is worth buying more of: Δxent on a FIXED held-out
    // split when each source is removed from the bucketed unigram LM.
    // The k ablated models are subtractions on the (source × bucket)
    // cell table — one tokenize pass serves every scenario.
    "llm_source_ablation" -> ((s, dir) => {
      TextOps.sourceAblation(Tables(s, dir, "documents"), "doc_id",
        "source", "text", buckets = 256, salt = "abl")
    }),

    // ---- per-word dispersion (Gries DP) ----------------------------------
    // The burstiness audit frequency hides: evenly-spread vs
    // single-source-dumped words at the same f. One tokenize pass to
    // (source, word) cells; the vocab×sources completion (absent
    // cells still contribute |0 − s_i|) and the ppm fold run there.
    "llm_dispersion" -> ((s, dir) => {
      TextOps.dispersionDp(Tables(s, dir, "documents"), "source", "text")
    }),

    // ---- corpus concentration (Gini / HHI) -------------------------------
    // Whale-detection: Gini over per-doc token counts from the LENGTH
    // HISTOGRAM (grouped rank-sum — no corpus sort), HHI + top share
    // over source token shares. All ppm integer div.
    "llm_concentration" -> ((s, dir) => {
      TextOps.concentration(Tables(s, dir, "documents"), "doc_id",
        "source", "text")
    }),

    // ---- RAKE keyphrase extraction (Rose et al. 2010) --------------------
    // Corpus top-20 "what is this about" phrases: stopword-free runs
    // score Σ deg(w)/freq(w) with word scores floored to micro once —
    // phrase totals are integer sums, top-k order total. Complements
    // llm_pmi_phrases (statistical pairs) with the degree-based
    // multi-word extractor a labeling UI shows.
    "llm_keyphrases" -> ((s, dir) => {
      TextOps.rakeKeyphrases(Tables(s, dir, "documents"),
        "doc_id", "text", stopwords, maxLen = 4, topK = 20)
    }),

    // ---- greedy maximum-coverage selection (X263) ------------------------
    // Pick 8 docs covering the most distinct 3-gram shingles — the
    // content-coverage complement of prototypicality (typical) and
    // k-center (spans the embedding space). Greedy rounds on the
    // shrinking uncovered-pair table; the oracle unrolls all 8
    // MATERIALIZED rounds and the hash pins the whole trajectory.
    "llm_coverage_select" -> ((s, dir) => {
      TextOps.maxCoverageSelect(Tables(s, dir, "documents"), "doc_id",
        "text", gram = 3, k = 8)
    }),

    // ---- PMI phrase detection (word2vec phrase merging) ------------------
    // Mikolov discounted ratio over adjacent word pairs; " machine
    // learning" planted on every 7th doc is the only pair whose
    // co-occurrence beats 3x independence (the soup vocabulary's
    // natural bigrams hover at ratio ~1). Flag decided by HUGEINT
    // cross-multiplication — no ln, no float boundary.
    "llm_pmi_phrases" -> ((s, dir) => {
      val aug = Tables(s, dir, "documents").select(
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" machine learning")))
          .otherwise(col("text")).as("text"))
      TextOps.pmiPhrases(aug, "text", discount = 5L, minCount = 6L,
          thresholdMicro = 3000000L)
        .orderBy("w1", "w2")
    }),

    // ---- rendezvous-hash shard assignment (minimal-movement audit) -------
    // HRW-assign docs to 8 shards, re-assign at 9, and report per-shard
    // load plus how much moved: rendezvous moves ONLY rows whose new
    // argmax is the new shard (~1/9), where hash-mod would reshuffle
    // ~8/9 of the corpus. Assignment is a zero-shuffle narrow map
    // (argmax inside an array expression); the audit agg is 8 rows.
    "llm_shard_assign" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id")
      val a8 = graft.operators.Rendezvous.assign(docs, "doc_id", 8, "v1")
        .withColumnRenamed("shard", "shard8")
      val a9 = graft.operators.Rendezvous.assign(docs, "doc_id", 9, "v1")
        .withColumnRenamed("shard", "shard9")
      val tot = docs.agg(count(lit(1)).as("n_total"))
      a8.join(a9, "doc_id")
        .groupBy(col("shard8").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("shard9") =!= col("shard8"), 1L).otherwise(0L))
            .as("n_moved"))
        .crossJoin(broadcast(tot))
        .select(col("shard").cast("int").as("shard"), col("n_docs"),
          col("n_moved"),
          TextOps.round6(col("n_moved") / col("n_docs")).as("moved_frac"),
          TextOps.round6(col("n_docs") / col("n_total")).as("share"))
        .orderBy("shard")
    }),

    // ---- repetition max-run-length (degenerate-text quality gate) --------
    // Longest consecutive repeated-token run per doc, one zero-shuffle
    // `aggregate` expression over the in-row token array (no explode,
    // no per-doc window — the corpus is never row-inflated |tokens|×).
    // Every 30th doc gets 12 planted "spam" tokens appended (both
    // engines) so the gate has something to catch: natural soup runs
    // sit at 1–3, planted docs report exactly 12. The oracle spells
    // the same first-longest-run rule as gaps-and-islands with a
    // (len DESC, start ASC) rank.
    "llm_max_run" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").withColumn("aug",
        when(col("doc_id") % 30 === 0,
          concat(col("text"), lit(" " + Seq.fill(12)("spam").mkString(" "))))
          .otherwise(col("text")))
      d.select(col("doc_id"), TextOps.maxRun(split(col("aug"), " ")).as("_r"))
        .select(col("doc_id"), col("_r.n_tokens").as("n_tokens"),
          col("_r.max_run").as("max_run"),
          col("_r.run_token").as("run_token"))
        .orderBy("doc_id")
    }),

    // ---- per-source entropy rate (bigram conditional entropy) ------------
    // H(next|current) per source; the gap to H1 is the mutual
    // information adjacent tokens share — rich-vocabulary-in-rigid-
    // patterns text shows a low rate at high H1.
    "llm_entropy_rate" -> ((s, dir) => {
      TextOps.entropyRate(Tables(s, dir, "documents"), "doc_id",
        "source", "text")
    }),

    // ---- Distinct-n diversity (X342) ---------------------------------------
    // Li et al. (2016)'s Distinct-1/2/3 — the generation-diversity
    // readout (distinct n-grams over total n-grams) that catches
    // degenerate repetition a quality score misses, per source and
    // per n. Pure combine aggs on skew-free n-gram keys; exact micro
    // ratio, one floored division per (source, n).
    "llm_distinct_ngrams" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("source"), TextOps.words(col("text")).as("_w"))
        .localCheckpoint(true) // three shingle passes
      (1 to 3).map { n =>
        d.select(col("source"),
            explode(TextOps.shinglesFromWords(col("_w"), n)).as("g"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            countDistinct("g").as("n_distinct"))
          .select(col("source"), lit(n.toLong).as("n"), col("n_total"),
            col("n_distinct"),
            expr("(n_distinct * 1000000) div n_total")
              .as("distinct_micro"))
      }.reduce(_ unionByName _).orderBy("source", "n")
    }),

    // ---- B-cubed evaluation of the DBSCAN clustering (X282) --------------
    // Element-averaged precision/recall of the predicted near-dup
    // clusters against exact-text (sha256) gold groups on the same
    // planted corpus — the clustering-quality audit where pair-based
    // Rand lets one giant cluster drown every small mistake. Noise
    // docs count as singletons (the standard convention).
    "llm_bcubed_eval" -> ((s, dir) => {
      val d = plantedTriplicate(s, dir)
      val clustered = graft.operators.HammingDbscan.cluster(
        TextOps.simHash(d, "doc_id", "text"),
        "doc_id", "simhash", maxHamming = 3, minPts = 3)
      val assign = clustered
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("pred"))
        .join(d.select(col("doc_id"), sha2(col("text"), 256).as("gold")),
          "doc_id")
      EvalOps.bcubed(assign, "pred", "gold")
    }),

    // ---- unigram-LM tokenizer training, hard-EM Viterbi (X295) -----------
    // The SentencePiece unigram model next to llm_bpe_train's merge
    // loop: substring seed vocab + single-char coverage floor, then 2
    // rounds of Viterbi segmentation (integer micro-nat costs, exact
    // argmin) and prune + add-one re-estimation. Everything after the
    // corpus word-count pass is vocabulary-bounded.
    "llm_unigram_tokenizer" -> ((s, dir) =>
      graft.llm.UnigramTokenizer.train(Tables(s, dir, "documents"),
        "text", maxPieceLen = 4, maxWordLen = 8, minFreq = 20L,
        rounds = 2, topK = 30)),

    // ---- incremental topic fold-in for a new batch (X300) ----------------
    // The index-maintenance discipline applied to topic models: train
    // on the base 3/4 of the corpus, FREEZE p(w|z), infer only the
    // new quarter's mixtures by 2 fold-in E-steps (Hofmann §3.3) —
    // per-batch cost is batch-nnz×K, historical assignments never
    // drift, OOV batch words drop by the frozen-model contract.
    "llm_topic_incremental" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      graft.llm.TopicOps.plsaFoldIn(
        d.filter(col("doc_id") % 4 =!= 1),
        d.filter(col("doc_id") % 4 === 1),
        "doc_id", "text", k = 4, trainRounds = 3, foldRounds = 2)
    }),

    // ---- pLSA topic model, 3 unrolled EM rounds (X293) -------------------
    // The unsupervised corpus-structure readout next to X198's
    // supervised classifier: K=4 topics fit by exact-integer EM
    // (micro doc mixtures, nano topic-word probabilities, add-one
    // smoothing, keyed-md5 deterministic init), reported as the top-8
    // words per topic. Every E-step row count is nnz(d,w)×K; every
    // M-step agg is vocab- or docs-bounded with map-side combine.
    "llm_topic_model" -> ((s, dir) =>
      graft.llm.TopicOps.plsaTopics(Tables(s, dir, "documents"),
        "doc_id", "text", k = 4, rounds = 3, topWords = 8)),

    // ---- mutual-information feature screening vs lang (X283) -------------
    // Which word-presence features carry the most bits about the
    // language label — the filter-method ranking that seeds a
    // classifier vocabulary before training. Absence cells included
    // (a word MISSING from a class is informative); every ln on an
    // integer product, micro-floored, so N*I is an exact integer.
    "llm_mi_features" -> ((s, dir) =>
      FeatureOps.miFeatures(Tables(s, dir, "documents"), "doc_id",
        "text", col("lang"), topK = 25)),

    // ---- Dunning log-likelihood keyness vs one source (X276) -------------
    // Which words DISTINGUISH src7 from the rest — the planted
    // "promo"/"offer" markers (3/1 tokens per src7 doc, both engines)
    // must dominate the top-k while the shared soup vocabulary scores
    // near zero; every ln on an integer product, micro-floored, so
    // G2 is an exact integer sum.
    "llm_keyness" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").withColumn("text",
        when(col("source") === "src7",
          concat(col("text"), lit(" promo offer promo")))
          .otherwise(col("text")))
      TextOps.dunningKeyness(d, "text", col("source") === "src7",
        topK = 20)
    }),

    // ---- Kneser-Ney bigram LM on a held-out split (X272) -----------------
    // The smoothing real LMs use, scored where smoothing matters: an
    // md5-held-out fifth of the corpus, so unseen bigrams/contexts
    // actually occur. Discount = the exact rational 3/4; every
    // probability is a ratio of exact integers; -ln p = micro-floored
    // ln(den) - ln(num) per term before any sum.
    "llm_kn_lm" -> ((s, dir) => {
      TextOps.knCrossEntropy(Tables(s, dir, "documents"), "doc_id",
        "text")
    }),

    // ---- temperature-scaled mixture allocation (X360) ----------------------
    // The multilingual-LM sampling rule (llm/TextOps.temperatureMix):
    // ppm seats proportional to t^alpha for alpha in {1, 1/2, 0} side
    // by side — proportional feeds the head, alpha = 1/2 lifts the
    // tail, uniform ignores size. All three apportion by the same
    // largest-remainder total order, so each column sums to exactly
    // 10^6.
    "llm_temperature_mix" -> ((s, dir) => {
      TextOps.temperatureMix(Tables(s, dir, "documents"), "source",
        size(TextOps.words(col("text"))), budget = 1000000)
    }),

    // ---- anchor-text aggregation per link target -------------------------
    // The web-corpus relevance signal (Craswell et al. 2001: inbound
    // anchors describe a page better than its own text): every link's
    // anchor aggregated per TARGET, top-3 anchors by (count DESC,
    // anchor ASC) plus totals. Deterministic synthetic link graph —
    // doc i → target (i·7) mod 1000, anchor = source's first three
    // words; a real crawl supplies (src, dst, anchor) edges into the
    // same shape. Anchor counts partial-combine to (target, anchor)
    // rows BEFORE any window; the rank window and both final aggs run
    // over that aggregate, never the corpus (the X150 altitude rule).
    "llm_anchor_text" -> ((s, dir) => {
      val edges = Tables(s, dir, "documents")
        .select(col("doc_id").as("src"),
          (col("doc_id") * 7 % 1000).as("target"),
          array_join(slice(split(col("text"), " "), 1, 3), " ")
            .as("anchor"))
      val ac = edges.groupBy("target", "anchor")
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("target")
        .orderBy(col("n").desc, col("anchor"))
      val totals = ac.groupBy("target").agg(sum("n").as("n_links"),
        count(lit(1)).as("n_anchors"))
      val top3 = ac.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= 3)
        .groupBy("target")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("_r"), col("anchor")))),
          x => x.getField("anchor")), " | ").as("top_anchors"))
      totals.join(top3, "target")
        .select(col("target"), col("n_links"), col("n_anchors"),
          col("top_anchors"))
        .orderBy("target")
    }),

    // ---- few-shot prompt assembly under a token budget -------------------
    // Per language: reproducible hash-ranked examples (the X52
    // two-phase stratified top-k — no per-class straggler), kept as the
    // PREFIX whose cumulative whitespace-token count fits 160 tokens,
    // capped at 8 examples. Prefix-stop, not skip-and-continue: few-shot
    // lists are ordered, a skipped long example would reorder meaning.
    // The cumulative window runs over ≤ 8 rows per class.
    "llm_prompt_pack" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      graft.operators.Sampling.promptPack(d, "lang", "doc_id", "n_tok",
        budgetTokens = 160L, maxExamples = 8, salt = "fewshot-v1")
        .orderBy("lang")
    }),

    // ---- bigram-LM cross-entropy quality score ---------------------------
    // The statistical perplexity gate, self-trained: add-one-smoothed
    // bigram probabilities are exact rationals of three integer counts,
    // each bigram's −ln p is pinned to integer micro-nats BEFORE the
    // per-doc sum (a cross-partition float sum would order its
    // roundings nondeterministically), and the mean is one division at
    // the |docs| tail. Bigrams come from an in-row zip_with — no window
    // shuffle of the exploded corpus.
    "llm_bigram_lm" -> ((s, dir) => {
      TextOps.bigramCrossEntropy(Tables(s, dir, "documents"), "doc_id",
        "text").orderBy("doc_id")
    }),

    // ---- rank-biased overlap: full vs truncated retrieval (X332) ----------
    // Webber–Moffat–Zobel RBO (llm/EvalOps.rbo), the label-free
    // ranking comparison next to recall@k: per panel query, the
    // position-weighted agreement between the exact 64-dim top-20 and
    // the TRUNCATED 32-dim top-20 — "can this corpus serve from half
    // the vector", scored where it matters (the head). One broadcast
    // panel×corpus pass computes BOTH scores; two per-query rank
    // windows; identical rankings score exactly 10⁶.
    // ---- X344: corpus-level ROUGE-1/2 + log-BLEU-2 generation eval --------
    // Reference-based n-gram overlap (Lin 2004; Papineni 2002), the
    // generation-eval lens next to rank_eval's labels and rbo's
    // label-free ranks: candidates = each doc, reference = the next
    // doc of the same source (deterministic pairing; same-source docs
    // share vocabulary, so overlaps are non-vacuous). Micro-aggregated
    // per source; log-BLEU stays in the log domain (exp is not
    // correctly rounded cross-engine), clipped counts and ratios are
    // exact integers, the ln-pair discipline is X272/X276's.
    "llm_rouge_bleu" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("doc_id")
      val pairs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("ref", lead("text", 1).over(w))
        .filter(col("ref").isNotNull)
        .select(col("doc_id").as("pid"), col("source"),
          col("text").as("cand"), col("ref"))
      EvalOps.rougeBleu(pairs, "pid", "source", "cand", "ref")
        .withColumnRenamed("grp", "source")
    }),

    "llm_rank_rbo" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      val qs = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
        .select(col("vec_id").as("query_id"), col("qv").as("_qq"))
      val dot = VectorOps.dotFn(s)
      val scored = emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          dot(col("_qq"), col("qv")).as("s_full"),
          dot(slice(col("_qq"), 1, 32), slice(col("qv"), 1, 32))
            .as("s_half"))
        .localCheckpoint(true) // two rank windows over one scoring pass
      def top(sc: String, rn: String) = scored
        .withColumn(rn, row_number().over(Window.partitionBy("query_id")
          .orderBy(col(sc).desc, col("vec_id"))).cast("long"))
        .filter(col(rn) <= 20)
        .select(col("query_id"), col("vec_id"), col(rn))
      val matched = top("s_full", "ra")
        .join(top("s_half", "rb"), Seq("query_id", "vec_id"))
      qs.select(col("query_id"))
        .join(graft.llm.EvalOps.rbo(matched, "query_id", "ra", "rb",
            depth = 20, pNum = 9, pDen = 10)
          .withColumnRenamed("q", "query_id"), Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          coalesce(col("rbo_micro"), lit(0L)).as("rbo_micro"))
        .orderBy("query_id")
    }),

    // ---- best-of-n expected-max curve (X330) -------------------------------
    // The RLHF/rejection-sampling readout (llm/EvalOps.bestOfN): how
    // much does the best of n i.i.d. draws beat one draw, on the
    // md5-'0' panel's quality scores — exact integer order statistics
    // (rank weights iⁿ − (i−1)ⁿ over Nⁿ, decimal(38,0) throughout),
    // no sampling, no floats. Curve is monotone in n by construction.
    "llm_best_of_n" -> ((s, dir) => {
      val panel = Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("_w"))
        .filter(substring(md5(concat(lit("bon|"),
          col("doc_id").cast("string"))), 1, 1) === "0")
        .select(col("doc_id"),
          floor(TextOps.qualityScore(col("_w"), stopwords) * 1000000.0)
            .cast("long").as("s"))
      graft.llm.EvalOps.bestOfN(panel, "doc_id", "s", maxN = 8)
    }),

    // ---- weighted bottom-k corpus sample ---------------------------------
    // Cohen-Kaplan weighted bottom-k per language, weight = token
    // count capped at 32: min-of-w integer md5 keys, so heavy docs
    // oversample while membership stays a pure (salt,id,weight)
    // function — no float pow whose ulp could swap ranks. Two-phase
    // rank (the X52 shape), oracle is the plain lossless rank.
    "llm_weighted_sample" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      graft.operators.Sampling.weightedBottomK(d, "lang", "doc_id",
        "n_tok", k = 5, salt = "wbk-v1")
        .select(col("lang"), col("rank"), col("doc_id"), col("n_tok"),
          col("sample_key"))
        .orderBy("lang", "rank")
    }),

    // ---- water-filling token-budget allocation across sources ------------
    // B = 90% of corpus tokens (integer: (total*9) div 10): sources
    // below the water level take all they have (saturated), the rest
    // share the remainder exactly — Σ allocated == B in integers, any
    // engine, any partitioning. The 1-row total is a legitimate scalar
    // collect.
    "llm_budget_waterfill" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("source"),
          size(TextOps.words(col("text"))).cast("long").as("_t"))
        .groupBy("source").agg(sum("_t").as("avail"))
      val total = toks.agg(sum("avail")).head.getLong(0)
      TextOps.waterFill(toks, "source", "avail", budget = total * 9 / 10)
        .orderBy("key")
    }),

    // ---- small-file compaction plan (metadata-only table maintenance) ----
    // File listing derived deterministically from `documents` (one
    // "file" per doc, bytes = n_chars) in BOTH engines; the plan bins
    // contiguous files per source toward a 4000-byte target via integer
    // cumulative-sum division — |files|-row metadata work, no corpus
    // movement until the plan executes.
    "llm_compaction_plan" -> ((s, dir) => {
      val files = Tables(s, dir, "documents")
        .select(col("source"), col("doc_id").as("file_id"),
          col("n_chars").as("bytes"))
      graft.operators.Compaction
        .compactionPlan(files, "source", "file_id", "bytes",
          targetBytes = 4000L)
        .orderBy("source", "out_file")
    }),

    // ---- positional phrase search (X194) ---------------------------------
    // The retrieval primitive doc-level postings (X93) can't answer:
    // exact consecutive-word occurrence. Panel deliberately includes
    // repeated-word phrases ("table table", "filter value small value")
    // — the case where a naive per-word join false-positives and the
    // count(DISTINCT idx)=len anchor trick is load-bearing. One corpus
    // tokenize pruned by the broadcast phrase vocabulary, ONE shuffle
    // on (phrase, doc, anchor); the (len−1)-self-join positional-
    // postings spelling is the rejected alternative.
    "llm_phrase_search" -> ((s, dir) => {
      TextOps.phraseSearch(Tables(s, dir, "documents"), "doc_id", "text",
          PhrasePanel)
        .withColumnRenamed("doc", "doc_id")
        .orderBy("phrase", "doc_id")
    }),

    // ---- Aho–Corasick blocklist scan (X199) ------------------------------
    // Multi-pattern SUBSTRING screening (blocklists, gazetteers, PII
    // trigger phrases): ONE automaton pass per document matches the
    // whole panel — the N-regex-passes and giant-alternation spellings
    // are rejected in the operator scaladoc. Counts every occurrence at
    // every end position (overlapping + nested), which the position-scan
    // oracle replays with an INDEPENDENT algorithm (brute-force
    // substr-at-every-position). Differs from llm_phrase_search (X194):
    // that matches whole-WORD sequences via tokenized anchors; this
    // matches raw char substrings ("ar" hits inside "spark" and "part").
    "llm_blocklist" -> ((s, dir) => {
      graft.operators.AhoCorasick.scanCounts(
        Tables(s, dir, "documents"), "doc_id", "text", "source",
        BlocklistPanel)
    }),

    // ---- KV-cache prefix-reuse plan (X320) ---------------------------------
    // The LLM-serving dedup: requests sharing a prompt PREFIX can
    // reuse each other's KV cache, so batch scheduling wants the
    // shared-prefix groups and the token savings up front. Bucket =
    // the first min(16, len) words (shorter docs bucket on their full
    // text, so cross-length buckets never collide); a group of n
    // saves (n−1)·prefix_len tokens. One tokenize-and-slice pass, one
    // combine agg, TakeOrdered top-20 by savings — never a sort of
    // the corpus.
    "llm_prefix_cache_plan" -> ((s, dir) => {
      val ws = TextOps.words(col("text"))
      Tables(s, dir, "documents")
        .select(md5(concat_ws(" ", slice(ws, 1, 16))).as("prefix_md5"),
          least(size(ws), lit(16)).cast("long").as("prefix_tokens"))
        .groupBy("prefix_md5", "prefix_tokens")
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .select(col("prefix_md5"), col("prefix_tokens"), col("n_docs"),
          ((col("n_docs") - 1) * col("prefix_tokens")).as("saved_tokens"))
        .orderBy(col("saved_tokens").desc, col("prefix_md5"))
        .limit(20)
    }),

    // ---- TextTiling topic-boundary profile (X318) --------------------------
    // Gap cohesion (distinct-word Jaccard, exact micro) between
    // adjacent 10-word blocks of every document, with depth-scored
    // local-minimum boundary flags — where a RAG chunker should cut
    // instead of at byte counts. Full profile emitted, thresholds
    // re-auditable downstream.
    "llm_texttiling" -> ((s, dir) => {
      graft.operators.TextTiling.gapProfile(
        Tables(s, dir, "documents"), "doc_id", "text",
        blockWords = 10, depthThresholdMicro = 100000L)
        .orderBy("doc_id", "gap")
    }),

    // ---- T5-style span-corruption plan (X386) ------------------------------
    // The denoising-objective manifest: per 20-token block, one
    // 3-token span at a deterministic md5 offset (non-overlap by
    // construction - offset <= 17 keeps the span inside its block).
    // Emits the exact token accounting a packing stage consumes:
    // input = kept tokens + one sentinel per span, target = sentinels
    // + corrupted tokens + EOS. span_start_sum pins the whole per-
    // block offset stream cross-engine, not just the counts.
    "llm_span_corruption" -> ((s, dir) => {
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.words(col("text"))).cast("long").as("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          expr("n_tokens div 20").as("n_spans"))
      val offs = base.filter(col("n_spans") > 0)
        .select(col("doc_id"),
          explode(expr("sequence(0, n_spans - 1)")).as("blk"))
        .select(col("doc_id"),
          (col("blk") * 20 + 1 +
            conv(substring(md5(concat(lit("span|"),
              col("doc_id").cast("string"), lit("|"),
              col("blk").cast("string"))), 1, 4), 16, 10).cast("long")
              % 18).as("start"))
        .groupBy("doc_id").agg(sum("start").as("span_start_sum"))
      base.join(offs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("n_spans"),
          (col("n_spans") * 3).as("n_corrupted"),
          (col("n_tokens") - col("n_spans") * 3 + col("n_spans"))
            .as("input_len"),
          when(col("n_spans") > 0, col("n_spans") * 4 + 1)
            .otherwise(lit(0L)).as("target_len"),
          coalesce(col("span_start_sum"), lit(0L)).as("span_start_sum"))
        .orderBy("doc_id")
    }),

  )

  val oracleSql: Map[String, String] = Map(

    "llm_text_stats" -> s"""
      SELECT doc_id,
             length(text) AS n_chars,
             len(ws) AS n_words,
             len(list_distinct(ws)) AS n_distinct,
             ${round6sql("list_sum(list_transform(ws, x -> length(x))) / CAST(len(ws) AS DOUBLE)")} AS avg_word_len,
             ${round6sql("len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE)")} AS ttr,
             len(regexp_extract_all(text, '[a-z]+')) AS alpha_tokens,
             len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^a-z0-9\\s]')) AS bpe_tokens,
             CAST(floor((length(text) + 3) / 4) AS INT) AS est_tokens,
             CASE WHEN len(bg) > 0
                  THEN ${round6sql("1.0 - len(list_distinct(bg)) / CAST(len(bg) AS DOUBLE)")}
                  ELSE 0.0 END AS bigram_rep,
             ${round6sql("len(list_filter(ws, x -> x IN ('the', 'a', 'of', 'to', 'in'))) / CAST(len(ws) AS DOUBLE)")} AS stop_ratio
      FROM (SELECT doc_id, text, ws,
                   CASE WHEN len(ws) >= 2
                        THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
                        ELSE [] END AS bg
            FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents))
      ORDER BY doc_id
    """,

    "llm_entropy" -> s"""
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
      tot AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct
        FROM wc GROUP BY doc_id),
      terms AS (
        SELECT wc.doc_id,
               CAST(floor(c * ln(CAST(n_tokens AS DOUBLE) / c) * 1000000.0 + 0.5)
                    AS BIGINT) AS t
        FROM wc JOIN tot USING (doc_id)),
      s AS (SELECT doc_id, sum(t) AS st FROM terms GROUP BY doc_id)
      SELECT tot.doc_id, n_tokens, n_distinct,
             ${round6sql("st / (n_tokens * 1000000.0)")} AS entropy
      FROM tot JOIN s USING (doc_id)
      ORDER BY doc_id
    """,

    "llm_inverted_index" -> s"""
      WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      tf AS (SELECT w, doc_id, count(*) AS tf FROM t GROUP BY w, doc_id),
      st AS (
        SELECT w, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
        FROM tf GROUP BY w),
      cap AS (SELECT count(*) * 8 // 10 AS maxdf FROM documents),
      p AS (
        SELECT w, string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                             ',' ORDER BY doc_id) AS postings
        FROM tf
        WHERE w IN (SELECT w FROM st, cap WHERE df <= maxdf)
        GROUP BY w)
      SELECT st.w AS word, st.df, st.total_tf, p.postings
      FROM st LEFT JOIN p USING (w)
      ORDER BY word
    """,

    "llm_threshold_sweep" -> s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      q AS (
        SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
               CAST(floor(($qualitySqlCol) * 1000) AS BIGINT) AS threshold_mq
        FROM d),
      h AS (
        SELECT threshold_mq, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS bt
        FROM q GROUP BY threshold_mq),
      c AS (
        SELECT threshold_mq, n_docs,
               CAST(sum(n_docs) OVER (ORDER BY threshold_mq DESC) AS BIGINT) AS n_docs_kept,
               CAST(sum(bt) OVER (ORDER BY threshold_mq DESC) AS BIGINT) AS n_tokens_kept
        FROM h),
      tot AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS td, CAST(sum(bt) AS BIGINT) AS tt
        FROM h)
      SELECT threshold_mq, n_docs, n_docs_kept, n_tokens_kept,
             ${round6sql("n_docs_kept / CAST(td AS DOUBLE)")} AS doc_frac,
             ${round6sql("n_tokens_kept / CAST(tt AS DOUBLE)")} AS token_frac
      FROM c, tot
      ORDER BY threshold_mq
    """,

    "llm_epoch_shuffle" -> s"""
      WITH d AS (SELECT doc_id FROM documents),
      x AS (
        SELECT doc_id, unnest(range(0, 3)) AS epoch FROM d),
      k AS (
        SELECT CAST(epoch AS INT) AS epoch, doc_id,
               md5('shuffle|' || CAST(epoch AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR)) AS sort_key
        FROM x)
      SELECT epoch,
             CAST('0x' || substr(sort_key, 1, 4) AS INT) % 8 AS shard,
             doc_id, sort_key
      FROM k ORDER BY epoch, doc_id
    """,

    "llm_length_batches" -> s"""
      WITH d AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      b AS (
        SELECT doc_id, n_tokens,
               CAST(length(bin(n_tokens)) AS INT) AS len_bucket
        FROM d),
      nb AS (
        SELECT len_bucket, (count(*) + 15) // 16 AS nbatch
        FROM b GROUP BY len_bucket),
      a AS (
        SELECT len_bucket, n_tokens,
               CAST('0x' || substr(md5('batch|' || CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
                 % nbatch AS batch_idx
        FROM b JOIN nb USING (len_bucket)),
      g AS (
        SELECT len_bucket, CAST(batch_idx AS BIGINT) AS batch_idx,
               count(*) AS n_docs,
               CAST(max(n_tokens) AS BIGINT) AS max_tokens,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        FROM a GROUP BY 1, 2)
      SELECT len_bucket, batch_idx, n_docs, max_tokens, sum_tokens,
             ${round6sql("(max_tokens * n_docs - sum_tokens) / CAST(max_tokens * n_docs AS DOUBLE)")} AS padding_frac
      FROM g ORDER BY len_bucket, batch_idx
    """,

    "llm_bpe_pairs" -> s"""
      WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      wc AS (SELECT w, count(*) AS c FROM t GROUP BY w),
      ex AS (
        SELECT w, c, unnest(range(1, CAST(length(w) AS BIGINT))) AS i
        FROM wc WHERE length(w) >= 2),
      pc AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair, CAST(sum(c) AS BIGINT) AS pair_count
        FROM ex GROUP BY 1)
      SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS INT) AS rank,
             pair, pair_count
      FROM pc ORDER BY pair_count DESC, pair LIMIT 20
    """,

    // 12 unrolled training rounds (the X56 kMeans pattern): each block
    // re-derives pair counts from the previous vocab state, picks the
    // argmax with the same (count DESC, pair) tiebreak, and applies the
    // merge with the same literal replace the Spark side uses — replace
    // is left-to-right non-overlapping in both engines, which IS greedy
    // BPE merge order under the space-wrapped symbol representation.
    "llm_bpe_train" -> {
      // AS MATERIALIZED is load-bearing: v{r-1} is referenced twice per
      // round (pair counts + merge application) and DuckDB would inline
      // both references, doubling the plan per round — 2^12 copies of
      // v0 by the last block
      val rounds = (1 to 12).map { r =>
        s"""      p$r AS (
        SELECT sy[CAST(i AS INTEGER)] || ' ' || sy[CAST(i AS INTEGER) + 1] AS pair,
               sum(c) AS pc
        FROM (SELECT c, sy, unnest(range(1, CAST(len(sy) AS BIGINT))) AS i
              FROM (SELECT c, string_split(trim(st), '  ') AS sy FROM v${r - 1}))
        GROUP BY 1),
      b$r AS (SELECT pair, pc,
                     string_split(pair, ' ')[1] AS pl,
                     string_split(pair, ' ')[2] AS prt
              FROM p$r ORDER BY pc DESC, pair LIMIT 1),
      v$r AS MATERIALIZED (SELECT w, c,
                     replace(st, ' ' || pl || '  ' || prt || ' ',
                             ' ' || pl || prt || ' ') AS st
              FROM v${r - 1}, b$r)"""
      }.mkString(",\n")
      val mergeUnion = (1 to 12).map(r =>
        s"SELECT $r AS r, pair, pc FROM b$r").mkString("\n        UNION ALL ")
      s"""
      WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      wc AS (SELECT w, count(*) AS c FROM tok WHERE w <> '' GROUP BY w),
      v0 AS MATERIALIZED (SELECT w, c, regexp_replace(w, '(?s)(.)', ' \\1 ', 'g') AS st FROM wc),
$rounds,
      swc AS (SELECT source, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY source, w),
      enc AS (
        SELECT source,
               sum(swc.c * len(string_split(trim(v.st), '  '))) AS n
        FROM swc JOIN v12 v USING (w) GROUP BY source)
      SELECT part, rank, sym, n FROM (
        SELECT 'merge' AS part, CAST(r AS BIGINT) AS rank, pair AS sym,
               CAST(pc AS BIGINT) AS n
        FROM ($mergeUnion)
        UNION ALL
        SELECT 'encode' AS part, CAST(NULL AS BIGINT) AS rank,
               source AS sym, CAST(n AS BIGINT) AS n
        FROM enc)
      ORDER BY part, rank, sym
    """
    },

    // Same planted batch, same decision cascade; simhash pairs over the
    // v1 ∪ batch union via the parameterized CTE, within-batch groups by
    // recursive closure restricted to unclaimed batch docs.
    "llm_incremental_curate" -> s"""
      WITH RECURSIVE v2b AS (
        SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 31 = 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text || ' new' AS text
        FROM documents WHERE doc_id % 29 = 0
        UNION ALL
        SELECT doc_id + 3000000 AS doc_id,
               'novel doc ' || CAST(doc_id AS VARCHAR) || ' standalone content' AS text
        FROM documents WHERE doc_id % 37 = 0),
      corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id, text FROM v2b),
      ${simhashPairsCteOver("corpus")},
      near AS (
        SELECT doc_a, doc_b FROM pairs
        WHERE bit_count(xor(sim_a, sim_b)) <= 3),
      sha1 AS (SELECT sha256(text) AS h, min(doc_id) AS v1keeper
               FROM documents GROUP BY 1),
      r1 AS (
        SELECT b.doc_id, sha1.v1keeper
        FROM (SELECT doc_id, sha256(text) AS h FROM v2b) b
        LEFT JOIN sha1 USING (h)),
      np AS (
        SELECT doc_a AS b, doc_b AS v FROM near
        UNION ALL
        SELECT doc_b, doc_a FROM near),
      nv AS (
        SELECT b AS doc_id, min(v) AS nearv1 FROM np
        WHERE b >= 1000000 AND v < 1000000 GROUP BY b),
      claimed AS (
        SELECT doc_id FROM r1 WHERE v1keeper IS NOT NULL
        UNION
        SELECT doc_id FROM nv),
      bbe AS (
        SELECT doc_a, doc_b FROM near
        WHERE doc_a >= 1000000 AND doc_b >= 1000000
          AND doc_a NOT IN (SELECT doc_id FROM claimed)
          AND doc_b NOT IN (SELECT doc_id FROM claimed)),
      sym AS (
        SELECT doc_a AS node, doc_b AS nbr FROM bbe
        UNION ALL
        SELECT doc_b, doc_a FROM bbe),
      reach(node, label) AS (
        SELECT node, node FROM sym
        UNION
        SELECT s.node, r.label FROM sym s JOIN reach r ON s.nbr = r.node),
      cc AS (SELECT node, min(label) AS group_id FROM reach GROUP BY node)
      SELECT r1.doc_id,
             CASE WHEN r1.v1keeper IS NOT NULL THEN 'exact_dup_of_v1'
                  WHEN nv.nearv1 IS NOT NULL THEN 'near_dup_of_v1'
                  WHEN cc.group_id IS NOT NULL AND cc.group_id <> r1.doc_id
                       THEN 'near_dup_in_batch'
                  WHEN cc.group_id IS NOT NULL THEN 'kept_group_rep'
                  ELSE 'novel' END AS status,
             coalesce(r1.v1keeper, nv.nearv1, cc.group_id, r1.doc_id) AS keeper,
             (coalesce(r1.v1keeper, nv.nearv1, cc.group_id, r1.doc_id) = r1.doc_id) AS keep
      FROM r1
      LEFT JOIN nv ON r1.doc_id = nv.doc_id
      LEFT JOIN cc ON r1.doc_id = cc.node
      ORDER BY r1.doc_id
    """,

    "llm_source_overlap" -> s"""
      WITH w AS (SELECT lang, string_split(text, ' ') AS ws FROM documents),
      grams AS (
        SELECT DISTINCT lang, g FROM (
          SELECT lang, unnest(CASE WHEN len(ws) >= 5
            THEN list_transform(range(1, len(ws) - 3),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])
            ELSE [] END) AS g
          FROM w)),
      sizes AS (SELECT lang, count(*) AS n FROM grams GROUP BY lang),
      shared AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS shared_grams
        FROM grams a JOIN grams b ON a.g = b.g AND a.lang < b.lang
        GROUP BY 1, 2)
      SELECT lang_a, lang_b, shared_grams, sa.n AS grams_a, sb.n AS grams_b,
             ${round6sql("shared_grams / CAST(least(sa.n, sb.n) AS DOUBLE)")} AS overlap
      FROM shared
      JOIN sizes sa ON lang_a = sa.lang
      JOIN sizes sb ON lang_b = sb.lang
      ORDER BY lang_a, lang_b
    """,

    "llm_classifier" -> s"""
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
             ${round6sql("st / (n_tokens * 1000.0)")} AS score,
             CASE WHEN st >= 0 THEN 'keep' ELSE 'drop' END AS label
      FROM sc ORDER BY doc_id
    """,

    // 10 unrolled GD rounds; MATERIALIZED is load-bearing on fc/lab/w{r}
    // (each is referenced twice per round — inlining doubles the plan
    // per round). Same integer hard-sigmoid math and class-balanced
    // gradient weighting (cw = opposite class count) as the Spark side.
    "llm_classifier_train" -> {
      val curveUnion = (1 to 10).map(r =>
        s"SELECT $r AS k, sum(abs(e)) AS n FROM e$r").mkString("\n        UNION ALL ")
      s"""
      WITH $clfTrainBaseCtes,
${clfTrainRoundCtes(10)},
      sc AS (
        SELECT doc, CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(c * wt) AS BIGINT) AS st
        FROM fc JOIN w10 USING (b) GROUP BY doc)
      SELECT part, k, sym, n FROM (
        SELECT 'round' AS part, CAST(k AS BIGINT) AS k, '' AS sym, CAST(n AS BIGINT) AS n
        FROM ($curveUnion)
        UNION ALL
        SELECT 'weight' AS part, CAST(b AS BIGINT) AS k, '' AS sym, CAST(wt AS BIGINT) AS n
        FROM (SELECT b, wt FROM w10 ORDER BY abs(wt) DESC, b LIMIT 32)
        UNION ALL
        SELECT 'confusion' AS part, CAST(NULL AS BIGINT) AS k,
               (CASE WHEN st >= 0 THEN 'keep' ELSE 'drop' END)
                 || '|' || CAST(y AS VARCHAR) AS sym,
               CAST(count(*) AS BIGINT) AS n
        FROM sc JOIN lab USING (doc) GROUP BY 3)
      ORDER BY part, k, sym
    """
    },

    // Replays the shared 10-round chain; per-doc stats are exact
    // integer moments of the |e_r| residual stream (R = 10, R^2 = 100).
    "llm_data_cartography" -> {
      val resUnion = (1 to 10)
        .map(r => s"SELECT doc, abs(e) AS ae FROM e$r")
        .mkString("\n        UNION ALL ")
      s"""
      WITH $clfTrainBaseCtes,
${clfTrainRoundCtes(10)},
      res AS (
        $resUnion),
      st AS (
        SELECT doc, CAST(sum(ae) AS BIGINT) AS sae,
               CAST(sum(ae * ae) AS BIGINT) AS sae2,
               CAST(sum(CASE WHEN ae < 500000 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_correct
        FROM res GROUP BY doc)
      SELECT st.doc AS doc_id, CAST(lab.y AS BIGINT) AS y,
             CAST(1000000 - sae // 10 AS BIGINT) AS conf_micro,
             CAST((10 * sae2 - sae * sae) // 100 AS BIGINT) AS var_micro2,
             n_correct,
             CASE WHEN (10 * sae2 - sae * sae) // 100 >= 40000000000
                  THEN 'ambiguous'
                  WHEN 1000000 - sae // 10 >= 500000 THEN 'easy'
                  ELSE 'hard' END AS band
      FROM st JOIN lab ON lab.doc = st.doc
      ORDER BY doc_id
    """
    },

    // 3 unrolled boosting rounds (generator above); d0 carries exact
    // HUGEINT weights, the winner CTEs are MATERIALIZED.
    "llm_adaboost" -> s"""
      WITH feats AS MATERIALIZED (
        SELECT ((cthe * 1000) // n) // 8 AS f0,
               ((ca * 1000) // n) // 8 AS f1,
               ((cot * 1000) // n) // 8 AS f2,
               n // 4 AS f3,
               ((nc * 100) // n) // 8 AS f4,
               (cstop * 1000 >= n * 61) AS y
        FROM (SELECT n_chars AS nc,
                     len(string_split(text, ' ')) AS n,
                     len(list_filter(string_split(text, ' '),
                       w -> w = 'the')) AS cthe,
                     len(list_filter(string_split(text, ' '),
                       w -> w = 'a')) AS ca,
                     len(list_filter(string_split(text, ' '),
                       w -> w IN ('of', 'to'))) AS cot,
                     len(list_filter(string_split(text, ' '),
                       w -> w IN ('the', 'a', 'of', 'to', 'and')))
                       AS cstop
              FROM documents)
        WHERE n > 0),
      d0 AS MATERIALIZED (
        SELECT y, f0, f1, f2, f3, f4,
               CAST(1 AS HUGEINT) AS w, CAST(0 AS BIGINT) AS s
        FROM feats),
      ${adaboostRoundCtes(3,
        Seq("f_pm_the", "f_pm_a", "f_pm_ofto", "f_n_words", "f_cpw"))}
      SELECT * FROM r1
      UNION ALL SELECT * FROM r2
      UNION ALL SELECT * FROM r3
      ORDER BY round
    """,

    "llm_langid_trained" -> s"""
      WITH $nbLangCtes
      SELECT doc_id, lang_true AS lang, cand AS pred_lang,
             (lang_true = cand) AS correct
      FROM r WHERE rn = 1 ORDER BY doc_id
    """,

    "llm_langid_hashed" -> s"""
      WITH $nbLangHashedCtes
      SELECT doc_id, lang_true AS lang, cand AS pred_lang,
             (lang_true = cand) AS correct
      FROM r WHERE rn = 1 ORDER BY doc_id
    """,

    "llm_lang_quality" -> s"""
      WITH scored AS (
        SELECT doc_id, lang, ws, $langScoreCols
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)),
      q AS (
        SELECT doc_id, lang, $langArgmax AS pred_lang,
               $qualitySqlCol AS quality
        FROM scored)
      SELECT doc_id, lang, pred_lang, quality,
             CASE WHEN quality >= 0.6 THEN 'high'
                  WHEN quality >= 0.4 THEN 'mid'
                  ELSE 'low' END AS band
      FROM q ORDER BY doc_id
    """,

    "llm_readability" -> """
      WITH d AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                 AS BIGINT) AS sct,
               CAST(len(regexp_extract_all(text, '[aeiouy]+'))
                 AS BIGINT) AS y0
        FROM documents),
      e AS (
        SELECT source, w, sct, greatest(y0, w) AS y FROM d),
      f AS (
        SELECT source, w,
               (390000*w*w + 11800000*y*sct - 15590000*sct*w)
                 // (sct*w) AS fk,
               (206835000*sct*w - 1015000*w*w - 84600000*y*sct)
                 // (sct*w) AS fre
        FROM e)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(w) AS BIGINT) AS total_words,
             CAST(sum(fk) // count(*) AS BIGINT) AS fk_mean_micro,
             CAST(sum(fre) // count(*) AS BIGINT) AS fre_mean_micro,
             CAST(sum(CASE WHEN fre < 30000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS hard_docs
      FROM f GROUP BY source ORDER BY source
    """,

    "llm_gopher_rules" -> """
      WITH d AS (
        SELECT source, text, string_split(text, ' ') AS ws
        FROM documents),
      e AS (
        SELECT source,
               CAST(len(ws) AS BIGINT) AS w,
               CAST(len(text) - (len(ws) - 1) AS BIGINT) AS lsum,
               CAST(len(list_filter(ws,
                 x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_w,
               (CASE WHEN list_contains(ws, 'the') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(ws, 'be') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(ws, 'to') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(ws, 'of') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(ws, 'and') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(ws, 'that') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(ws, 'have') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(ws, 'with') THEN 1 ELSE 0 END)
                 AS stop_hits,
               CAST(len(regexp_extract_all(text, '[#…]')) AS BIGINT)
                 AS syms
        FROM d),
      f AS (
        SELECT source,
               (w BETWEEN 50 AND 100000) AS r_wc,
               (lsum >= 3*w AND lsum <= 10*w) AS r_mwl,
               (alpha_w*10 >= w*8) AS r_alpha,
               (stop_hits >= 2) AS r_stop,
               (syms*10 <= w) AS r_sym
        FROM e)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN r_wc AND r_mwl AND r_alpha AND r_stop
                            AND r_sym THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass,
             CAST(sum(CASE WHEN r_wc AND r_mwl AND r_alpha AND r_sym
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_nostop,
             CAST(sum(CASE WHEN NOT r_wc THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_wordcount,
             CAST(sum(CASE WHEN NOT r_mwl THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_wordlen,
             CAST(sum(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_stopwords
      FROM f GROUP BY source ORDER BY source
    """,

    "llm_burstiness" -> """
      WITH dw AS (
        SELECT doc_id, w, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents)
        GROUP BY 1, 2),
      pw AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS df1,
               CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS df2
        FROM dw GROUP BY 1),
      top AS (
        SELECT w, df1, df2,
               CAST((df2 * 1000000) // df1 AS BIGINT) AS adaptation_micro
        FROM (SELECT pw.*, row_number() OVER (ORDER BY df1 DESC, w) AS rn
              FROM pw)
        WHERE rn <= 20),
      pooled AS (
        SELECT '__corpus__' AS w, CAST(sum(df1) AS BIGINT) AS df1,
               CAST(sum(df2) AS BIGINT) AS df2,
               CAST((sum(df2) * 1000000) // sum(df1) AS BIGINT)
                 AS adaptation_micro
        FROM pw)
      SELECT * FROM top UNION ALL SELECT * FROM pooled
      ORDER BY w
    """,

    "llm_corpus_summary" -> s"""
      SELECT lang, source,
             count(*) AS n_docs,
             CAST(sum(length(text)) AS BIGINT) AS total_chars,
             count(DISTINCT $wordsetFpSql) AS distinct_wordsets,
             ${round6sql("sum(length(text)) / CAST(count(*) AS DOUBLE)")} AS avg_chars
      FROM documents
      GROUP BY lang, source
      ORDER BY lang, source
    """,

    "llm_hash_split" -> """
      WITH d AS (
        SELECT lang, length(text) AS n_chars,
               CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 AS b
        FROM documents)
      SELECT lang,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM d GROUP BY 1, 2 ORDER BY 1, 2
    """,

    "llm_curation_pipeline" -> s"""
      WITH d AS (
        SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents),
      scored AS (
        SELECT doc_id, lang, text, len(ws) AS n_words,
               $qualitySqlCol AS quality
        FROM d),
      kept AS (
        SELECT *, $wordsetFpSql AS wordset_fp
        FROM scored WHERE quality >= 0.3),
      dedup AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY wordset_fp ORDER BY doc_id) AS rn
          FROM kept)
        WHERE rn = 1)
      SELECT doc_id, lang, n_words, quality
      FROM dedup
      WHERE CAST('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 < 50
      ORDER BY doc_id
    """,

    "llm_vocab" -> """
      SELECT word, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word ORDER BY word
    """,

    // Exact KMV replay: k smallest distinct 60-bit md5s per source, the
    // union sketch as the k smallest of the concatenated sketches, the
    // same (k−1)·2⁶⁰/h₍ₖ₎ estimator arithmetic step for step.
    "llm_kmv_set_ops" -> s"""
      WITH tok AS (
        SELECT source, CAST('0x' || substr(md5('kmv|' || w), 1, 15) AS BIGINT) AS h
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)),
      dh AS (SELECT DISTINCT source, h FROM tok),
      rk AS (SELECT source, h,
                    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
             FROM dh),
      sk AS (SELECT source, list(h ORDER BY h) AS kmv
             FROM rk WHERE rn <= 128 GROUP BY source),
      pr AS (SELECT a.source AS source_a, b.source AS source_b,
                    a.kmv AS ka, b.kmv AS kb,
                    list_sort(list_distinct(list_concat(a.kmv, b.kmv)))[1:128] AS ku
             FROM sk a JOIN sk b ON a.source < b.source),
      e AS (SELECT source_a, source_b,
                   ${Seq("ka" -> "vocab_a_est", "kb" -> "vocab_b_est",
                         "ku" -> "union_est").map { case (c, n) =>
                     s"""CASE WHEN len($c) < 128 THEN CAST(len($c) AS BIGINT)
                        ELSE CAST(least(floor(CAST(127 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                                        / CAST($c[128] AS DOUBLE)), CAST(4611686018427387904 AS DOUBLE)) AS BIGINT) END AS $n"""
                   }.mkString(",\n                   ")}
            FROM pr)
      SELECT source_a, source_b, vocab_a_est, vocab_b_est, union_est,
             greatest(0, vocab_a_est + vocab_b_est - union_est) AS intersect_est,
             ${round6sql(
               "CAST(greatest(0, vocab_a_est + vocab_b_est - union_est) AS DOUBLE) / CAST(union_est AS DOUBLE)")} AS jaccard_est
      FROM e
      ORDER BY source_a, source_b
    """,

    "llm_token_count" -> s"""
      WITH d AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '$BpeTokenRe')) AS BIGINT) AS n_bpe_tokens,
               CAST(floor((length(text) + 3) / 4) AS BIGINT) AS est_tokens
        FROM documents)
      SELECT doc_id, n_ws_tokens, n_bpe_tokens, est_tokens,
             ${round6sql("n_bpe_tokens / CAST(n_ws_tokens AS DOUBLE)")} AS bpe_per_word
      FROM d ORDER BY doc_id
    """,

    "llm_domain_caps" -> s"""
      WITH d AS (
        SELECT doc_id,
               regexp_extract(
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' https://site' || CAST(doc_id % 7 AS VARCHAR) || '.test/page'
                      ELSE text END,
                 '$UrlDomainRe', 1) AS domain
        FROM documents),
      f AS (SELECT doc_id, domain FROM d WHERE domain <> ''),
      r AS (
        SELECT doc_id, domain,
               row_number() OVER (PARTITION BY domain
                 ORDER BY md5('domcap|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM f)
      SELECT doc_id, domain, (rn <= 10) AS kept FROM r ORDER BY doc_id
    """,

    "llm_mixture_weights" -> s"""
      WITH $mixtureCtes
      SELECT source, n_docs, n_tokens, token_share, mix_weight, boost
      FROM mixw ORDER BY source
    """,

    "llm_mixture_sample" -> s"""
      WITH $mixtureCtes,
      j AS (
        SELECT doc_id, dd.source, boost,
               CAST(floor(boost * 1000000.0 + 0.5) AS BIGINT) AS bm,
               CAST('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 4)
                    AS BIGINT) AS h
        FROM documents dd JOIN mixw USING (source))
      SELECT doc_id, source, boost,
             bm // 1000000
               + CASE WHEN h * 1000000 < (bm % 1000000) * 65536 THEN 1 ELSE 0 END
               AS n_copies
      FROM j ORDER BY doc_id
    """,

    "llm_mixture_dro" -> """
      WITH s AS (
        SELECT source, count(*) AS n,
               sum(len(string_split(text, ' '))) AS t
        FROM documents GROUP BY 1),
      tot AS (SELECT sum(n) AS tn, sum(t) AS tt FROM s),
      l AS (
        SELECT source,
               greatest((((tt * 1000000) // tn - (t * 1000000) // n)
                           * 1000000) // ((tt * 1000000) // tn),
                        0) AS loss
        FROM s, tot),
      m AS (
        SELECT source,
               1000000 + (500 * least(loss, 1000000)) // 1000 AS mult
        FROM l),
      w0 AS (SELECT source, mult, CAST(1000000 AS BIGINT) AS w FROM m),
      w1 AS (SELECT source, mult, (w * mult) // 1000000 AS w FROM w0),
      w2 AS (SELECT source, mult, (w * mult) // 1000000 AS w FROM w1),
      w3 AS (SELECT source, mult, (w * mult) // 1000000 AS w FROM w2),
      w4 AS (SELECT source, mult, (w * mult) // 1000000 AS w FROM w3),
      w5 AS (SELECT source, mult, (w * mult) // 1000000 AS w FROM w4),
      u AS (
        SELECT 0 AS round, source,
               (w * 1000000) // (sum(w) OVER ()) AS share FROM w0
        UNION ALL SELECT 1, source,
               (w * 1000000) // (sum(w) OVER ()) FROM w1
        UNION ALL SELECT 2, source,
               (w * 1000000) // (sum(w) OVER ()) FROM w2
        UNION ALL SELECT 3, source,
               (w * 1000000) // (sum(w) OVER ()) FROM w3
        UNION ALL SELECT 4, source,
               (w * 1000000) // (sum(w) OVER ()) FROM w4
        UNION ALL SELECT 5, source,
               (w * 1000000) // (sum(w) OVER ()) FROM w5)
      SELECT CAST(round AS BIGINT) AS round, source,
             CAST(share AS BIGINT) AS share_micro
      FROM u ORDER BY round, source
    """,

    "llm_tfidf" -> s"""
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
      dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      sc AS (
        SELECT tf.doc_id, tf.word, tf.tf,
               ${round6sql("tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df)")} AS tfidf
        FROM tf JOIN dfreq ON tf.word = dfreq.word CROSS JOIN n),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
        FROM sc)
      SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, tfidf
      FROM r WHERE rn <= 3 ORDER BY doc_id, word
    """,

    "llm_bm25" -> s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
      scal AS (
        SELECT count(*) AS n,
               CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM dl),
      tok AS (SELECT doc_id, unnest(ws) AS word FROM d),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
      dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      sc AS (
        SELECT tf.doc_id, tf.word, tf.tf,
               ${round6sql(
                 "ln(CAST(1.0 AS DOUBLE) + (CAST(n AS DOUBLE) - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))" +
                 " * (tf * CAST(2.2 AS DOUBLE))" +
                 " / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / avgdl)))")} AS bm25
        FROM tf JOIN dfreq USING (word) JOIN dl USING (doc_id) CROSS JOIN scal),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY bm25 DESC, word) AS rn
        FROM sc)
      SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, bm25
      FROM r WHERE rn <= 3 ORDER BY doc_id, word
    """,

    "llm_lm_retrieval" -> s"""
      WITH $lmRetrievalSqlCtes
      SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
             CAST(score_micro AS BIGINT) AS score_micro
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank
    """,

    "llm_lm_retrieval_eval" -> s"""
      WITH $lmRetrievalSqlCtes,
      top5 AS (SELECT query_id, rank, doc_id FROM ranked WHERE rank <= 5),
      rel AS (
        SELECT t.query_id, t.rank,
               ds.source = qs.source AS rel
        FROM top5 t
        JOIN documents ds ON ds.doc_id = t.doc_id
        JOIN documents qs ON qs.doc_id = t.query_id),
      perq AS (
        SELECT query_id, min(CASE WHEN rel THEN rank END) AS first_rel
        FROM rel GROUP BY 1),
      rr AS (
        SELECT query_id,
               coalesce(1000000 // first_rel, 0) AS rr,
               CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM perq)
      SELECT CAST(count(*) AS BIGINT) AS n_queries,
             CAST(sum(rr) // count(*) AS BIGINT) AS mrr_micro,
             CAST((sum(hit) * 1000000) // count(*) AS BIGINT)
               AS success5_micro
      FROM rr
    """,

    "llm_pii_scrub" -> """
      WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN text || ' reach user' || CAST(doc_id AS VARCHAR)
                         || '@example.com or https://site'
                         || CAST(doc_id % 7 AS VARCHAR)
                         || '.test ref 1234567890123'
                    ELSE text END AS aug
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(aug, 'https?://[^ \t\n\r]+')) AS INT) AS n_urls,
             CAST(len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(aug, '[0-9]{8,}')) AS INT) AS n_longnums,
             sha256(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(aug, 'https?://[^ \t\n\r]+', '<URL>', 'g'),
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '[0-9]{8,}', '<NUM>', 'g')) AS scrub_sha
      FROM d ORDER BY doc_id
    """,

    "llm_repetition_filter" -> s"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g2 AS (
        SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
          THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
          ELSE [] END) AS g
        FROM w),
      c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
      t2 AS (SELECT doc_id, ${round6sql("max(c) / CAST(sum(c) AS DOUBLE)")} AS f
             FROM c2 GROUP BY doc_id),
      g3 AS (
        SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
          THEN list_transform(range(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
          ELSE [] END) AS g
        FROM w),
      c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
      t3 AS (SELECT doc_id, ${round6sql("max(c) / CAST(sum(c) AS DOUBLE)")} AS f
             FROM c3 GROUP BY doc_id)
      SELECT w.doc_id,
             coalesce(t2.f, 0.0) AS top2gram_frac,
             coalesce(t3.f, 0.0) AS top3gram_frac,
             (coalesce(t2.f, 0.0) > 0.045 OR coalesce(t3.f, 0.0) > 0.04) AS repetitive
      FROM w
      LEFT JOIN t2 ON w.doc_id = t2.doc_id
      LEFT JOIN t3 ON w.doc_id = t3.doc_id
      ORDER BY w.doc_id
    """,

    "llm_pii_redact" -> """
      WITH p AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@ex-' || (doc_id % 7)
                    || '.com'
                    || CASE WHEN doc_id % 2 = 0
                            THEN ' from 10.' || (doc_id % 256) || '.0.1'
                            ELSE '' END
                    || CASE WHEN doc_id % 3 = 0
                            THEN ' call +1415555' || ((doc_id % 9000) + 1000)
                            ELSE '' END
                    || CASE WHEN doc_id % 5 = 0
                            THEN ' card 4111111111111111'
                            ELSE '' END AS t
        FROM documents),
      s1 AS (SELECT doc_id, t AS t0,
                    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
             FROM p),
      s2 AS (SELECT *, regexp_replace(t1, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS t2 FROM s1),
      s3 AS (SELECT *, regexp_replace(t2, '\+[0-9]{7,15}\b', '<PHONE>', 'g') AS t3 FROM s2),
      s4 AS (SELECT *, regexp_replace(t3, '\b[0-9]{13,16}\b', '<CARD>', 'g') AS t4 FROM s3)
      SELECT doc_id,
             len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             len(regexp_extract_all(t1, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ip,
             len(regexp_extract_all(t2, '\+[0-9]{7,15}\b')) AS n_phone,
             len(regexp_extract_all(t3, '\b[0-9]{13,16}\b')) AS n_card,
             md5(t4) AS redacted_md5,
             len(t4) AS redacted_len
      FROM s4 ORDER BY doc_id
    """,

    "llm_heavy_hitters" -> """
      WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      tot AS (SELECT greatest(1, count(*) * 2000 // 1000000) AS thr FROM t)
      SELECT w AS word, count(*) AS n
      FROM t CROSS JOIN tot
      GROUP BY w, thr
      HAVING count(*) >= thr
      ORDER BY word
    """,

    "llm_bloom_suppress" -> """
      WITH d AS (SELECT doc_id, sha256(text) AS content_sha FROM documents)
      SELECT content_sha, doc_id FROM d
      WHERE content_sha NOT IN
            (SELECT content_sha FROM d WHERE doc_id % 7 = 0)
      ORDER BY doc_id
    """,

    "llm_unigram_logprob" -> s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      c AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
      t AS (SELECT sum(c) AS n, count(*) AS v FROM c),
      li AS (
        SELECT w, CAST(floor(ln((c + 1) / CAST(n + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS li
        FROM c, t),
      agg AS (
        SELECT doc_id, count(*) AS n_tokens, sum(li) AS s
        FROM tok JOIN li USING (w) GROUP BY doc_id)
      SELECT doc_id, n_tokens,
             ${round6sql("CAST(s AS DOUBLE) / (n_tokens * 1000000.0)")} AS avg_logprob
      FROM agg ORDER BY doc_id
    """,

    "llm_bigram_logprob" -> s"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      uni AS (
        SELECT w, count(*) AS c1 FROM (SELECT unnest(ws) AS w FROM w) GROUP BY w),
      vv AS (SELECT count(*) AS v FROM uni),
      bi AS (
        SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
          THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
          ELSE [] END) AS bg
        FROM w),
      lp AS (
        SELECT bg,
               CAST(floor(ln((c2 + 1) / CAST(c1 + v AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) AS lp
        FROM (SELECT bg, count(*) AS c2 FROM bi GROUP BY bg) bc
        JOIN uni ON string_split(bc.bg, ' ')[1] = uni.w, vv),
      per AS (
        SELECT doc_id, count(*) AS n_bigrams, CAST(sum(lp) AS BIGINT) AS st
        FROM bi JOIN lp USING (bg) GROUP BY doc_id)
      SELECT d.doc_id,
             coalesce(per.n_bigrams, 0) AS n_bigrams,
             ${round6sql("st / (per.n_bigrams * 1000000.0)")} AS avg_bigram_logprob
      FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
      ORDER BY d.doc_id
    """,

    "llm_pack_sequences" -> """
      WITH t AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      o AS (
        SELECT doc_id, n_tokens,
               coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                 0) AS tok_offset
        FROM t)
      SELECT doc_id, n_tokens, tok_offset,
             tok_offset // 512 AS first_seq,
             (tok_offset + n_tokens - 1) // 512 AS last_seq
      FROM o ORDER BY doc_id
    """,

    "llm_seq_manifest" -> """
      WITH t AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      o AS (
        SELECT doc_id, n_tokens,
               coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                 0) AS tok_offset
        FROM t),
      p AS (
        SELECT doc_id, n_tokens, tok_offset,
               tok_offset // 512 AS first_seq,
               (tok_offset + n_tokens - 1) // 512 AS last_seq
        FROM o),
      m AS (
        SELECT doc_id, n_tokens, tok_offset,
               unnest(generate_series(first_seq, last_seq)) AS seq_id
        FROM p)
      SELECT seq_id, doc_id,
             greatest(tok_offset, seq_id * 512) - tok_offset AS doc_tok_from,
             least(tok_offset + n_tokens, (seq_id + 1) * 512)
               - greatest(tok_offset, seq_id * 512) AS n_toks
      FROM m ORDER BY seq_id, doc_id
    """,

    "llm_token_budget" -> s"""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
               CAST(floor((length(text) + 3) / 4) AS INT) AS est_tokens
        FROM documents),
      q AS (
        SELECT doc_id, est_tokens,
               $qualitySqlCol AS quality
        FROM d),
      qb AS (
        SELECT doc_id, quality, est_tokens,
               CAST(floor(quality * 1000) AS BIGINT) AS b
        FROM q),
      h AS (SELECT b, sum(est_tokens) AS bt FROM qb GROUP BY b),
      c AS (SELECT b, sum(bt) OVER (ORDER BY b DESC) AS cum FROM h),
      t AS (SELECT CAST(floor(sum(est_tokens) * 0.5) AS BIGINT) AS budget FROM qb)
      SELECT qb.doc_id, qb.quality, qb.est_tokens,
             (c.cum <= t.budget) AS selected
      FROM qb JOIN c ON qb.b = c.b CROSS JOIN t
      ORDER BY qb.doc_id
    """,

    // chr(769)/chr(771) = the combining acute/tilde code points — the
    // SAME decomposed injection as the Spark side, with no raw combining
    // bytes in the SQL text itself.
    "llm_normalize" -> """
      WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN text || ' cafe' || chr(769) || ' NIN' || chr(771) || 'O'
                    ELSE text END AS aug
        FROM documents)
      SELECT doc_id,
             (nfc_normalize(aug) != aug) AS changed,
             sha256(lower(nfc_normalize(aug))) AS norm_sha
      FROM d ORDER BY doc_id
    """,

    "llm_chunking" -> """
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      c AS (
        SELECT doc_id, ws,
               greatest(1, CAST(ceil((len(ws) - 8) / 32.0) AS INT)) AS nc
        FROM d),
      ex AS (
        SELECT doc_id, ws, CAST(k AS INT) AS chunk_idx,
               CAST(k * 32 + 1 AS INT) AS start
        FROM c, unnest(range(0, nc)) t(k)),
      ch AS (
        SELECT doc_id, chunk_idx, ws[start:start + 39] AS cw FROM ex)
      SELECT doc_id, chunk_idx,
             CAST(len(cw) AS INT) AS n_words,
             sha256(array_to_string(cw, ' ')) AS chunk_sha
      FROM ch ORDER BY doc_id, chunk_idx
    """,

    "llm_stratified_sample" -> """
      WITH keyed AS (
        SELECT lang, doc_id,
               md5('s5|' || CAST(doc_id AS VARCHAR)) AS sample_key
        FROM documents),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY lang
                                     ORDER BY sample_key, doc_id) AS "rank"
        FROM keyed)
      SELECT lang, doc_id, "rank", sample_key
      FROM r WHERE "rank" <= 5 ORDER BY lang, "rank"
    """,

    // Ablation replay: one (source × bucket) cell table, every
    // complement model by subtraction, same held-out histogram joined
    // to every scenario; ln floored per cell, xent by //.
    "llm_source_ablation" -> """
      WITH tagged AS (
        SELECT source AS s, text,
               CAST('0x' || substr(md5('abl|' || CAST(doc_id AS VARCHAR)),
                 1, 4) AS INT) % 10 = 9 AS held
        FROM documents),
      tok AS (
        SELECT s, held,
               CAST('0x' || substr(md5('slm|' || w), 1, 4) AS INT) % 256 AS b
        FROM (SELECT s, held, unnest(string_split(text, ' ')) AS w
              FROM tagged)),
      sb AS MATERIALIZED (
        SELECT s, b, CAST(count(*) AS BIGINT) AS c
        FROM tok WHERE NOT held GROUP BY 1, 2),
      tb AS MATERIALIZED (
        SELECT b, CAST(sum(c) AS BIGINT) AS tc FROM sb GROUP BY 1),
      ns AS MATERIALIZED (
        SELECT s, CAST(sum(c) AS BIGINT) AS nsrc FROM sb GROUP BY 1),
      tt AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM sb),
      scen AS (
        SELECT s AS scenario, nsrc AS rm FROM ns
        UNION ALL SELECT '__FULL__', CAST(0 AS BIGINT)),
      spine AS (SELECT CAST(x AS INT) AS b FROM range(0, 256) t(x)),
      model AS MATERIALIZED (
        SELECT sc.scenario, sc.rm, sp.b,
               CAST(floor(-ln((coalesce(tb.tc, 0) - coalesce(s2.c, 0) + 1)
                 / CAST((SELECT tt FROM tt) - sc.rm + 256 AS DOUBLE))
                 * 1000000 + 0.5) AS BIGINT) AS nll_mu
        FROM scen sc CROSS JOIN spine sp
        LEFT JOIN tb ON tb.b = sp.b
        LEFT JOIN sb s2 ON s2.s = sc.scenario AND s2.b = sp.b),
      hh AS MATERIALIZED (
        SELECT b, CAST(count(*) AS BIGINT) AS hc
        FROM tok WHERE held GROUP BY 1),
      x AS MATERIALIZED (
        SELECT m.scenario, m.rm,
               CAST(sum(h.hc * m.nll_mu) // sum(h.hc) AS BIGINT)
                 AS xent_micro
        FROM model m JOIN hh h ON h.b = m.b GROUP BY 1, 2),
      xf AS (SELECT xent_micro AS xfull FROM x WHERE scenario = '__FULL__')
      SELECT scenario,
             CAST((SELECT tt FROM tt) - rm AS BIGINT) AS n_train_tokens,
             rm AS n_removed_tokens, xent_micro,
             CAST(xent_micro - (SELECT xfull FROM xf) AS BIGINT)
               AS delta_micro
      FROM x ORDER BY scenario
    """,

    // Gries DP replay: ppm shares and ratios via //, the grid completed
    // by a cross join so absent cells contribute |0 − s_i|.
    "llm_dispersion" -> """
      WITH tok AS (
        SELECT source AS s, unnest(string_split(text, ' ')) AS w
        FROM documents),
      sw AS MATERIALIZED (
        SELECT s, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
      st AS MATERIALIZED (
        SELECT s, CAST(sum(c) AS BIGINT) AS ns FROM sw GROUP BY 1),
      nt AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM st),
      sh AS MATERIALIZED (
        SELECT s, CAST(ns * 1000000 // (SELECT n FROM nt) AS BIGINT)
                 AS s_ppm
        FROM st),
      wt AS MATERIALIZED (
        SELECT w, CAST(sum(c) AS BIGINT) AS f FROM sw GROUP BY 1),
      grid AS (SELECT wt.w, wt.f, sh.s, sh.s_ppm FROM wt CROSS JOIN sh),
      d AS (
        SELECT g.w, g.f,
               abs(coalesce(sw.c, 0) * 1000000 // g.f - g.s_ppm) AS dd
        FROM grid g LEFT JOIN sw ON sw.w = g.w AND sw.s = g.s)
      SELECT w AS word, f, CAST(sum(dd) // 2 AS BIGINT) AS dp_ppm
      FROM d GROUP BY 1, 2
      ORDER BY dp_ppm DESC, word
    """,

    // Concentration replay: grouped rank-sum Gini over the length
    // histogram (exact HUGEINT), ppm HHI/top-share over source totals.
    "llm_concentration" -> """
      WITH d AS (
        SELECT doc_id, source AS s,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS len
        FROM documents),
      hist AS MATERIALIZED (
        SELECT len, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
      cum AS (
        SELECT len, cnt,
               coalesce(sum(cnt) OVER (ORDER BY len
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM hist),
      g AS (
        SELECT sum(CAST(len AS HUGEINT)
                 * (cnt * cb + (cnt * (cnt + 1)) // 2)) AS srank,
               sum(cnt) AS n, sum(CAST(len AS HUGEINT) * cnt) AS t
        FROM cum),
      gini AS MATERIALIZED (
        SELECT CAST(2 * srank * 1000000 // (n * t)
                 - (n + 1) * 1000000 // n AS BIGINT) AS gini_doc_ppm,
               CAST(n AS BIGINT) AS n_docs, CAST(t AS BIGINT) AS total_tokens
        FROM g),
      bs AS MATERIALIZED (
        SELECT s, CAST(sum(len) AS BIGINT) AS st FROM d GROUP BY 1),
      tt AS (SELECT CAST(sum(st) AS BIGINT) AS tt,
                    CAST(count(*) AS BIGINT) AS ns FROM bs),
      shares AS (
        SELECT CAST(st * 1000000 // (SELECT tt FROM tt) AS BIGINT)
                 AS share_ppm
        FROM bs),
      src AS MATERIALIZED (
        SELECT (SELECT ns FROM tt) AS ns,
               CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi,
               max(share_ppm) AS tops
        FROM shares)
      SELECT 'gini_doc_ppm' AS measure, gini_doc_ppm AS value FROM gini
      UNION ALL SELECT 'hhi_source_ppm', hhi FROM src
      UNION ALL SELECT 'n_docs', n_docs FROM gini
      UNION ALL SELECT 'n_sources', ns FROM src
      UNION ALL SELECT 'top_source_share_ppm', tops FROM src
      UNION ALL SELECT 'total_tokens', total_tokens FROM gini
      ORDER BY measure
    """,

    "llm_keyphrases" -> {
      val stopList = stopwords.map(s => s"'$s'").mkString(", ")
      s"""
      WITH toks AS (
        SELECT doc, pos, w, (w IN ($stopList) OR w = '') AS stop
        FROM (
          SELECT doc_id AS doc,
                 generate_subscripts(string_split(text, ' '), 1) AS pos,
                 unnest(string_split(text, ' ')) AS w
          FROM documents)),
      runs AS (
        SELECT doc, pos, w, grp FROM (
          SELECT doc, pos, w, stop,
                 sum(CASE WHEN stop THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc ORDER BY pos) AS grp
          FROM toks)
        WHERE NOT stop),
      cand AS (
        SELECT doc, grp, list(w ORDER BY pos) AS ws,
               CAST(count(*) AS BIGINT) AS len
        FROM runs GROUP BY 1, 2 HAVING count(*) <= 4),
      cw AS (SELECT doc, grp, ws, len, unnest(ws) AS w FROM cand),
      wsc AS (
        SELECT w, (CAST(sum(len) AS BIGINT) * 1000000) // count(*)
                 AS wscore
        FROM cw GROUP BY 1),
      psc AS (
        SELECT cw.doc, cw.grp,
               any_value(array_to_string(cw.ws, ' ')) AS phrase,
               CAST(sum(wsc.wscore) AS BIGINT) AS score
        FROM cw JOIN wsc USING (w)
        GROUP BY 1, 2)
      SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
             min(score) AS score_mu
      FROM psc GROUP BY 1
      ORDER BY score_mu DESC, phrase
      LIMIT 20
    """
    },

    // Unrolls the 8 greedy rounds: gains from the uncovered pair
    // table, argmax by (gain DESC, doc ASC), covered shingles leave
    // via NOT EXISTS — MATERIALIZED per round (the twice-referenced
    // round-state rule).
    "llm_coverage_select" -> {
      val rounds = (1 to 8).map { r =>
        val prev = s"p${r - 1}"
        s"""      s$r AS MATERIALIZED (
        SELECT doc, gain FROM (
          SELECT doc, CAST(count(*) AS BIGINT) AS gain
          FROM $prev GROUP BY doc)
        ORDER BY gain DESC, doc LIMIT 1),
      p$r AS MATERIALIZED (
        SELECT p.doc, p.g FROM $prev p
        WHERE NOT EXISTS (SELECT 1 FROM $prev q JOIN s$r ON q.doc = s$r.doc
                          WHERE q.g = p.g))"""
      }.mkString(",\n")
      val sel = (1 to 8).map(r =>
        s"SELECT $r AS sel_idx, doc, gain FROM s$r").mkString(
        "\n        UNION ALL ")
      s"""
      WITH tok AS (
        SELECT doc_id AS doc, string_split(text, ' ') AS ws FROM documents),
      p0 AS MATERIALIZED (
        SELECT DISTINCT doc,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        FROM (SELECT doc, ws, unnest(range(1, len(ws) - 1)) AS i FROM tok)
        WHERE len(ws) >= 3),
$rounds,
      sel AS ($sel)
      SELECT sel_idx, doc AS doc_id, gain,
             CAST(sum(gain) OVER (ORDER BY sel_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS covered_cum
      FROM sel
      ORDER BY sel_idx
    """
    },

    // in HUGEINT (Spark: DECIMAL(38,0)) so no division reaches the
    // threshold compare.
    "llm_pmi_phrases" -> s"""
      WITH aug AS (
        SELECT CASE WHEN doc_id % 7 = 0 THEN text || ' machine learning'
                    ELSE text END AS text
        FROM documents),
      w AS (SELECT string_split(text, ' ') AS ws FROM aug),
      uc AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(ws) AS w FROM w) GROUP BY w),
      n AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uc),
      bc AS (
        SELECT bg, CAST(count(*) AS BIGINT) AS c_ab FROM (
          SELECT unnest(CASE WHEN len(ws) >= 2
            THEN list_transform(range(1, len(ws)),
                   i -> ws[i] || ' ' || ws[i+1])
            ELSE [] END) AS bg
          FROM w)
        GROUP BY bg HAVING count(*) >= 6),
      sp AS (
        SELECT c_ab, string_split(bg, ' ')[1] AS w1,
               string_split(bg, ' ')[2] AS w2
        FROM bc)
      SELECT w1, w2, c_ab, ca.c AS c_a, cb.c AS c_b, n.n_tokens,
             ${round6sql(
               """CAST(CAST(c_ab - 5 AS HUGEINT) * n.n_tokens AS DOUBLE)
                  / CAST(CAST(ca.c AS HUGEINT) * cb.c AS DOUBLE)""")} AS score,
             CAST(CASE WHEN CAST(c_ab - 5 AS HUGEINT) * n.n_tokens * 1000000
                            >= CAST(3000000 AS HUGEINT) * ca.c * cb.c
                       THEN 1 ELSE 0 END AS INT) AS phrase
      FROM sp
      JOIN uc ca ON ca.w = sp.w1
      JOIN uc cb ON cb.w = sp.w2, n
      ORDER BY w1, w2
    """,

    // Oracle spells the argmax as unnest + arg_max (ties impossible:
    // md5 weights are distinct); the hash match proves it equivalent
    // to the Spark side's in-array argmax.
    "llm_shard_assign" -> s"""
      WITH docs AS (SELECT doc_id FROM documents),
      a8 AS (
        SELECT doc_id, arg_max(s, h) AS shard8 FROM (
          SELECT doc_id, s,
                 md5(CAST(s AS VARCHAR) || '|v1|' || CAST(doc_id AS VARCHAR))
                   AS h
          FROM docs, (SELECT unnest(range(0, 8)) AS s))
        GROUP BY doc_id),
      a9 AS (
        SELECT doc_id, arg_max(s, h) AS shard9 FROM (
          SELECT doc_id, s,
                 md5(CAST(s AS VARCHAR) || '|v1|' || CAST(doc_id AS VARCHAR))
                   AS h
          FROM docs, (SELECT unnest(range(0, 9)) AS s))
        GROUP BY doc_id),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM docs)
      SELECT CAST(shard8 AS INT) AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_moved,
             ${round6sql("""sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE)""")} AS moved_frac,
             ${round6sql("count(*) / CAST(tot.n_total AS DOUBLE)")} AS share
      FROM a8 JOIN a9 USING (doc_id), tot
      GROUP BY shard8, tot.n_total
      ORDER BY shard
    """,

    "llm_max_run" -> """
      WITH d AS (
        SELECT doc_id,
               string_split(CASE WHEN doc_id % 30 = 0
                 THEN text || ' spam spam spam spam spam spam spam spam spam spam spam spam'
                 ELSE text END, ' ') AS toks
        FROM documents),
      t AS (
        SELECT doc_id, len(toks) AS n_tokens, unnest(toks) AS tok,
               CAST(unnest(range(1, len(toks) + 1)) AS BIGINT) AS pos
        FROM d),
      isl AS (
        SELECT doc_id, n_tokens, tok, pos,
               pos - row_number() OVER (PARTITION BY doc_id, tok
                                        ORDER BY pos) AS g
        FROM t),
      runs AS (
        SELECT doc_id, min(n_tokens) AS n_tokens, tok,
               CAST(count(*) AS BIGINT) AS len, min(pos) AS start
        FROM isl GROUP BY doc_id, tok, g),
      best AS (
        SELECT doc_id, n_tokens, tok, len,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY len DESC, start ASC) AS rnk
        FROM runs)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             len AS max_run, tok AS run_token
      FROM best WHERE rnk = 1
      ORDER BY doc_id
    """,

    // Entropy-rate replay: same per-doc bigram adjacency, micro-nat
    // folds over the (source × gram) counts.
    "llm_entropy_rate" -> """
      WITH toks AS (
        SELECT source AS s, doc_id AS d, i AS p, ws[CAST(i AS INTEGER)] AS w
        FROM (SELECT source, doc_id, string_split(text, ' ') AS ws,
                     unnest(range(1, CAST(len(string_split(text, ' '))
                       AS BIGINT) + 1)) AS i
              FROM documents)),
      uni AS MATERIALIZED (
        SELECT s, w AS g, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY 1, 2),
      ut AS MATERIALIZED (
        SELECT s, CAST(sum(c) AS BIGINT) AS n FROM uni GROUP BY 1),
      h1 AS MATERIALIZED (
        SELECT u.s, t.n,
               CAST((-sum(u.c * CAST(floor(ln(u.c / CAST(t.n AS DOUBLE))
                 * 1000000 + 0.5) AS BIGINT))) // t.n AS BIGINT) AS h
        FROM uni u JOIN ut t USING (s) GROUP BY u.s, t.n),
      bi0 AS (
        SELECT a.s, a.w || ' ' || b.w AS g
        FROM toks a JOIN toks b ON b.d = a.d AND b.p = a.p + 1),
      bi AS MATERIALIZED (
        SELECT s, g, CAST(count(*) AS BIGINT) AS c FROM bi0 GROUP BY 1, 2),
      bt AS MATERIALIZED (
        SELECT s, CAST(sum(c) AS BIGINT) AS n FROM bi GROUP BY 1),
      h2 AS MATERIALIZED (
        SELECT b.s, t.n,
               CAST((-sum(b.c * CAST(floor(ln(b.c / CAST(t.n AS DOUBLE))
                 * 1000000 + 0.5) AS BIGINT))) // t.n AS BIGINT) AS h
        FROM bi b JOIN bt t USING (s) GROUP BY b.s, t.n)
      SELECT h1.s AS source, h1.n AS n_tokens, h2.n AS n_bigrams,
             h1.h AS h1_micro, h2.h AS h2_micro,
             CAST(h2.h - h1.h AS BIGINT) AS rate_micro
      FROM h1 JOIN h2 ON h1.s = h2.s
      ORDER BY source
    """,

    // Ljung-Box replay: centered daily series on the datediff index,
    // exact covariance sums, ppm r_k, micro Q vs 14067000.
    "llm_distinct_ngrams" -> ((1 to 3).map { n =>
      s"""SELECT source, CAST($n AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
             CAST((count(DISTINCT g) * 1000000) // count(*) AS BIGINT)
               AS distinct_micro
      FROM (
        SELECT source, array_to_string(ws[i:i + $n - 1], ' ') AS g
        FROM (
          SELECT source, ws, unnest(range(1, len(ws) - $n + 2)) AS i
          FROM (SELECT source, string_split(text, ' ') AS ws
                FROM documents)))
      GROUP BY source"""
    }.mkString("\n      UNION ALL\n      ") + "\n      ORDER BY source, n"),

    // Replays the DBSCAN chain, the sha256 gold groups, and the
    // cell-collapsed per-element sums with per-cell quantization.
    "llm_bcubed_eval" -> s"""
      WITH RECURSIVE $dbscanCtes,
      a AS (
        SELECT dbs.doc_id,
               coalesce(dbs.cluster_id, dbs.doc_id) AS pred,
               sha256(d.text) AS gold
        FROM dbs JOIN docs3 d ON d.doc_id = dbs.doc_id),
      cells AS MATERIALIZED (
        SELECT pred, gold, CAST(count(*) AS BIGINT) AS n_cell
        FROM a GROUP BY 1, 2),
      cs AS (SELECT pred, CAST(sum(n_cell) AS BIGINT) AS n_c
             FROM cells GROUP BY 1),
      gs AS (SELECT gold, CAST(sum(n_cell) AS BIGINT) AS n_g
             FROM cells GROUP BY 1),
      terms AS (
        SELECT n_cell,
               (n_cell * n_cell * 1000000000000) // n_c AS pt,
               (n_cell * n_cell * 1000000000000) // n_g AS rt,
               cells.pred, cells.gold
        FROM cells JOIN cs USING (pred) JOIN gs USING (gold)),
      agg AS (
        SELECT CAST(sum(n_cell) AS BIGINT) AS n_items,
               CAST(count(DISTINCT pred) AS BIGINT) AS n_clusters,
               CAST(count(DISTINCT gold) AS BIGINT) AS n_gold,
               CAST(sum(pt) AS HUGEINT) AS ps,
               CAST(sum(rt) AS HUGEINT) AS rs
        FROM terms),
      pr AS (
        SELECT n_items, n_clusters, n_gold,
               CAST(ps // (n_items * 1000000) AS BIGINT)
                 AS bcubed_p_micro,
               CAST(rs // (n_items * 1000000) AS BIGINT)
                 AS bcubed_r_micro
        FROM agg)
      SELECT n_items, n_clusters, n_gold, bcubed_p_micro, bcubed_r_micro,
             CAST(CASE WHEN bcubed_p_micro + bcubed_r_micro = 0 THEN 0
                  ELSE (2 * bcubed_p_micro * bcubed_r_micro)
                       // (bcubed_p_micro + bcubed_r_micro) END
               AS BIGINT) AS f1_micro
      FROM pr
    """,

    // Replays the span enumeration, the seed vocabulary, and BOTH
    // hard-EM rounds — 8 Viterbi positions forward (cumulative dp
    // CTEs, argmin by (total, piece)) and 8 cursor steps backward —
    // all generated as MATERIALIZED CTEs; every ln is a micro-nat
    // pair on integer-valued doubles.
    "llm_unigram_tokenizer" -> {
      val (maxLen, maxPiece, rounds) = (8, 4, 2)
      def lnu(x: String): String =
        s"CAST(floor(ln(CAST(($x) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      val vals = (1 to maxLen).map(i => s"($i)").mkString(", ")
      val pvals = (1 to maxPiece).map(i => s"($i)").mkString(", ")
      val roundCtes = (1 to rounds).map { r =>
        val pPrev = if (r == 1) "p0" else s"p${r - 1}"
        val fwd = (1 to maxLen).map { pos =>
          s"""d${r}_$pos AS MATERIALIZED (
        SELECT w, $pos AS pos, dp, piece, l FROM (
          SELECT s.w, d.dp + s.cost AS dp, s.piece, s.l,
                 row_number() OVER (PARTITION BY s.w
                   ORDER BY d.dp + s.cost, s.piece) AS rn
          FROM sc$r s JOIN da${r}_${pos - 1} d
            ON d.w = s.w AND d.pos = s.i - 1
          WHERE s.j = $pos)
        WHERE rn = 1),
      da${r}_$pos AS MATERIALIZED (
        SELECT * FROM da${r}_${pos - 1} UNION ALL SELECT * FROM d${r}_$pos)"""
        }.mkString(",\n      ")
        val bwd = (1 to maxLen).map { t =>
          s"""em${r}_$t AS MATERIALIZED (
        SELECT cu.w, cu.c, cu.pos, d.piece, d.l
        FROM cur${r}_${t - 1} cu JOIN da${r}_$maxLen d
          ON d.w = cu.w AND d.pos = cu.pos
        WHERE cu.pos > 0),
      cur${r}_$t AS MATERIALIZED (
        SELECT e.w, e.c, e.pos - e.l AS pos FROM em${r}_$t e)"""
        }.mkString(",\n      ")
        val emAll = (1 to maxLen).map(t => s"SELECT * FROM em${r}_$t")
          .mkString(" UNION ALL ")
        s"""sc$r AS MATERIALIZED (
        SELECT s.w, s.c, s.i, s.j, s.piece, s.l, p.cost
        FROM spans s JOIN $pPrev p USING (piece)),
      d${r}_0 AS (
        SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS dp, '' AS piece, 0 AS l
        FROM wc),
      da${r}_0 AS (SELECT * FROM d${r}_0),
      $fwd,
      cur${r}_0 AS (SELECT w, c, CAST(len(w) AS INTEGER) AS pos FROM wc),
      $bwd,
      uses$r AS MATERIALIZED (
        SELECT piece, CAST(sum(c) AS BIGINT) AS n_uses
        FROM ($emAll) GROUP BY 1),
      kept$r AS MATERIALIZED (
        SELECT p.piece, coalesce(u.n_uses, 0) AS n_uses
        FROM $pPrev p LEFT JOIN uses$r u USING (piece)
        WHERE coalesce(u.n_uses, 0) >= 1 OR len(p.piece) = 1),
      p$r AS MATERIALIZED (
        SELECT piece, ${lnu("tu + np")} - ${lnu("n_uses + 1")} AS cost
        FROM kept$r
        CROSS JOIN (SELECT CAST(sum(n_uses) AS BIGINT) AS tu,
                           CAST(count(*) AS BIGINT) AS np
                    FROM kept$r))"""
      }.mkString(",\n      ")
      s"""
      WITH wc AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' AND len(w) <= $maxLen
        GROUP BY 1),
      spans AS MATERIALIZED (
        SELECT w, c, i, i + l - 1 AS j, substring(w, i, l) AS piece, l
        FROM wc
        CROSS JOIN (VALUES $vals) ti(i)
        CROSS JOIN (VALUES $pvals) tl(l)
        WHERE i + l - 1 <= len(w)),
      seed AS (
        SELECT piece, CAST(sum(c) AS BIGINT) AS f
        FROM spans GROUP BY 1
        HAVING sum(c) >= 20 OR len(piece) = 1),
      p0 AS MATERIALIZED (
        SELECT piece, ${lnu("tf")} - ${lnu("f")} AS cost
        FROM seed
        CROSS JOIN (SELECT CAST(sum(f) AS BIGINT) AS tf FROM seed)),
      $roundCtes
      SELECT "rank", piece, n_uses, cost_micro, total_tokens FROM (
        SELECT u.piece, u.n_uses, p.cost AS cost_micro, t.total_tokens,
               row_number() OVER (ORDER BY u.n_uses DESC, u.piece)
                 AS "rank"
        FROM uses$rounds u
        JOIN p$rounds p USING (piece)
        CROSS JOIN (SELECT CAST(sum(n_uses) AS BIGINT) AS total_tokens
                    FROM uses$rounds) t)
      WHERE "rank" <= 30
      ORDER BY "rank"
    """
    },

    // Replays the base-corpus training (same generator as
    // llm_topic_model, restricted to doc_id % 4 <> 1), then both
    // fold-in E-steps against the FROZEN pwz3 — pzd-only updates,
    // with the all-OOV-doc keep-current-mixture left join.
    "llm_topic_incremental" -> {
      val trainCtes = (1 to 3).map { r =>
        val p = if (r == 1) "0" else (r - 1).toString
        s"""e$r AS MATERIALIZED (
        SELECT n.d, n.w, z.z, n.n,
               CAST(pzd.p AS HUGEINT) * pwz.p AS num
        FROM n CROSS JOIN zs z
        JOIN pzd$p pzd ON pzd.d = n.d AND pzd.z = z.z
        JOIN pwz$p pwz ON pwz.w = n.w AND pwz.z = z.z),
      s$r AS MATERIALIZED (
        SELECT d, w, z,
               n * CAST((num * 1000000) // (sum(num) OVER (PARTITION BY d, w))
                 AS BIGINT) AS s
        FROM e$r),
      sw$r AS MATERIALIZED (
        SELECT z, w, CAST(sum(s) AS BIGINT) AS s FROM s$r GROUP BY 1, 2),
      pwz$r AS MATERIALIZED (
        SELECT w, z,
               CAST(((CAST(s AS HUGEINT) + 1) * 1000000000) // (t + v)
                 AS BIGINT) AS p
        FROM (SELECT w, z, s, sum(s) OVER (PARTITION BY z) AS t FROM sw$r)
        CROSS JOIN vocab),
      pzd$r AS MATERIALIZED (
        SELECT d, z,
               CAST(((CAST(s AS HUGEINT) + 1) * 1000000) // (t + 4)
                 AS BIGINT) AS p
        FROM (SELECT d, z, s, sum(s) OVER (PARTITION BY d) AS t
              FROM (SELECT d, z, CAST(sum(s) AS BIGINT) AS s
                    FROM s$r GROUP BY 1, 2)))"""
      }.mkString(",\n      ")
      val foldCtes = (1 to 2).map { f =>
        s"""fe$f AS MATERIALIZED (
        SELECT nf.d, nf.w, p.z, nf.n,
               CAST(fz.p AS HUGEINT) * p.p AS num
        FROM nf
        JOIN pwz3 p ON p.w = nf.w
        JOIN fpzd${f - 1} fz ON fz.d = nf.d AND fz.z = p.z),
      fs$f AS MATERIALIZED (
        SELECT d, z,
               n * CAST((num * 1000000) // (sum(num) OVER (PARTITION BY d, w))
                 AS BIGINT) AS s
        FROM fe$f),
      fupd$f AS MATERIALIZED (
        SELECT d, z,
               CAST(((CAST(s AS HUGEINT) + 1) * 1000000) // (t + 4)
                 AS BIGINT) AS p
        FROM (SELECT d, z, s, sum(s) OVER (PARTITION BY d) AS t
              FROM (SELECT d, z, CAST(sum(s) AS BIGINT) AS s
                    FROM fs$f GROUP BY 1, 2))),
      fpzd$f AS MATERIALIZED (
        SELECT b.d, b.z, coalesce(u.p, b.p) AS p
        FROM fpzd${f - 1} b
        LEFT JOIN fupd$f u ON u.d = b.d AND u.z = b.z)"""
      }.mkString(",\n      ")
      s"""
      WITH alln AS MATERIALIZED (
        SELECT d, w, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT doc_id AS d, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w <> '' GROUP BY 1, 2),
      n AS (SELECT * FROM alln WHERE d % 4 <> 1),
      nf AS (SELECT * FROM alln WHERE d % 4 = 1),
      zs AS (SELECT unnest(range(0, 4)) AS z),
      vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM n),
      pzd0 AS MATERIALIZED (
        SELECT d, z, (r * 1000000) // t AS p FROM (
          SELECT d, z, r, sum(r) OVER (PARTITION BY d) AS t FROM (
            SELECT d, z,
                   CAST('0x' || substr(md5('plsa_d|' || CAST(d AS VARCHAR)
                     || '|' || CAST(z AS VARCHAR)), 1, 15) AS BIGINT)
                     % 5 + 1 AS r
            FROM (SELECT DISTINCT d FROM n) CROSS JOIN zs))),
      pwz0 AS MATERIALIZED (
        SELECT w, z, (r * 1000000000) // t AS p FROM (
          SELECT w, z, r, sum(r) OVER (PARTITION BY z) AS t FROM (
            SELECT w, z,
                   CAST('0x' || substr(md5('plsa_w|' || w
                     || '|' || CAST(z AS VARCHAR)), 1, 15) AS BIGINT)
                     % 5 + 1 AS r
            FROM (SELECT DISTINCT w FROM n) CROSS JOIN zs))),
      $trainCtes,
      fpzd0 AS MATERIALIZED (
        SELECT d, z, (r * 1000000) // t AS p FROM (
          SELECT d, z, r, sum(r) OVER (PARTITION BY d) AS t FROM (
            SELECT d, z,
                   CAST('0x' || substr(md5('plsa_d|' || CAST(d AS VARCHAR)
                     || '|' || CAST(z AS VARCHAR)), 1, 15) AS BIGINT)
                     % 5 + 1 AS r
            FROM (SELECT DISTINCT d FROM nf) CROSS JOIN zs))),
      $foldCtes
      SELECT d AS doc_id, z AS topic, CAST(p AS BIGINT) AS p_micro
      FROM fpzd2
      ORDER BY doc_id, topic
    """
    },

    // Replays the keyed-md5 init and all 3 EM rounds as unrolled
    // MATERIALIZED CTEs (each round's tables are referenced twice next
    // round); responsibilities and both normalizations route through
    // HUGEINT, floors are `//` on nonnegative operands throughout.
    "llm_topic_model" -> {
      val roundCtes = (1 to 3).map { r =>
        val p = if (r == 1) "0" else (r - 1).toString
        s"""e$r AS MATERIALIZED (
        SELECT n.d, n.w, z.z, n.n,
               CAST(pzd.p AS HUGEINT) * pwz.p AS num
        FROM n CROSS JOIN zs z
        JOIN pzd$p pzd ON pzd.d = n.d AND pzd.z = z.z
        JOIN pwz$p pwz ON pwz.w = n.w AND pwz.z = z.z),
      s$r AS MATERIALIZED (
        SELECT d, w, z,
               n * CAST((num * 1000000) // (sum(num) OVER (PARTITION BY d, w))
                 AS BIGINT) AS s
        FROM e$r),
      sw$r AS MATERIALIZED (
        SELECT z, w, CAST(sum(s) AS BIGINT) AS s FROM s$r GROUP BY 1, 2),
      pwz$r AS MATERIALIZED (
        SELECT w, z,
               CAST(((CAST(s AS HUGEINT) + 1) * 1000000000) // (t + v)
                 AS BIGINT) AS p
        FROM (SELECT w, z, s, sum(s) OVER (PARTITION BY z) AS t FROM sw$r)
        CROSS JOIN vocab),
      pzd$r AS MATERIALIZED (
        SELECT d, z,
               CAST(((CAST(s AS HUGEINT) + 1) * 1000000) // (t + 4)
                 AS BIGINT) AS p
        FROM (SELECT d, z, s, sum(s) OVER (PARTITION BY d) AS t
              FROM (SELECT d, z, CAST(sum(s) AS BIGINT) AS s
                    FROM s$r GROUP BY 1, 2)))"""
      }.mkString(",\n      ")
      s"""
      WITH n AS MATERIALIZED (
        SELECT d, w, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT doc_id AS d, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w <> '' GROUP BY 1, 2),
      zs AS (SELECT unnest(range(0, 4)) AS z),
      vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM n),
      pzd0 AS MATERIALIZED (
        SELECT d, z, (r * 1000000) // t AS p FROM (
          SELECT d, z, r, sum(r) OVER (PARTITION BY d) AS t FROM (
            SELECT d, z,
                   CAST('0x' || substr(md5('plsa_d|' || CAST(d AS VARCHAR)
                     || '|' || CAST(z AS VARCHAR)), 1, 15) AS BIGINT)
                     % 5 + 1 AS r
            FROM (SELECT DISTINCT d FROM n) CROSS JOIN zs))),
      pwz0 AS MATERIALIZED (
        SELECT w, z, (r * 1000000000) // t AS p FROM (
          SELECT w, z, r, sum(r) OVER (PARTITION BY z) AS t FROM (
            SELECT w, z,
                   CAST('0x' || substr(md5('plsa_w|' || w
                     || '|' || CAST(z AS VARCHAR)), 1, 15) AS BIGINT)
                     % 5 + 1 AS r
            FROM (SELECT DISTINCT w FROM n) CROSS JOIN zs))),
      $roundCtes
      SELECT topic, "rank", word, p_nano, weight FROM (
        SELECT p3.z AS topic, p3.w AS word, p3.p AS p_nano,
               s3.s // 1000000 AS weight,
               row_number() OVER (PARTITION BY p3.z
                 ORDER BY p3.p DESC, p3.w) AS "rank"
        FROM pwz3 p3 JOIN sw3 s3 ON s3.z = p3.z AND s3.w = p3.w)
      WHERE "rank" <= 8
      ORDER BY topic, "rank"
    """
    },

    // Replays the presence counts, the COMPLETED word x lang grid
    // (absence cells included), and the per-cell integer ln pairs.
    "llm_mi_features" -> """
      WITH base AS (
        SELECT DISTINCT doc_id, lang AS y, w
        FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w <> ''),
      n1y AS (SELECT w, y, CAST(count(*) AS BIGINT) AS n1y
              FROM base GROUP BY 1, 2),
      yt AS (SELECT lang AS y, CAST(count(*) AS BIGINT) AS ny
             FROM documents GROUP BY 1),
      nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      dfw AS (SELECT w, CAST(sum(n1y) AS BIGINT) AS df
              FROM n1y GROUP BY 1),
      grid AS (
        SELECT dfw.w, dfw.df, yt.y, yt.ny,
               coalesce(n1y.n1y, 0) AS n1y, nt.n
        FROM dfw CROSS JOIN yt
        LEFT JOIN n1y ON n1y.w = dfw.w AND n1y.y = yt.y
        CROSS JOIN nt),
      terms AS (
        SELECT w, df,
          CASE WHEN n1y > 0 THEN n1y *
            (CAST(floor(ln(CAST(CAST(n1y AS HUGEINT) * n AS DOUBLE))
               * 1000000.0) AS BIGINT)
             - CAST(floor(ln(CAST(CAST(df AS HUGEINT) * ny AS DOUBLE))
               * 1000000.0) AS BIGINT))
          ELSE 0 END
          + CASE WHEN ny - n1y > 0 THEN (ny - n1y) *
            (CAST(floor(ln(CAST(CAST(ny - n1y AS HUGEINT) * n AS DOUBLE))
               * 1000000.0) AS BIGINT)
             - CAST(floor(ln(CAST(CAST(n - df AS HUGEINT) * ny AS DOUBLE))
               * 1000000.0) AS BIGINT))
          ELSE 0 END AS t
        FROM grid)
      SELECT w AS word, df, CAST(sum(t) AS BIGINT) AS mi_n_micro
      FROM terms GROUP BY 1, 2
      ORDER BY mi_n_micro DESC, word
      LIMIT 25
    """,

    // Replays the plant, the (word x side) counts, and the per-cell
    // integer-product ln pairs.
    "llm_keyness" -> """
      WITH d AS (
        SELECT CASE WHEN source = 'src7'
                 THEN text || ' promo offer promo' ELSE text END AS text,
               (source = 'src7') AS t
        FROM documents),
      tok AS (SELECT t, unnest(string_split(text, ' ')) AS w FROM d),
      counts AS (
        SELECT w, CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS b
        FROM tok WHERE w <> '' GROUP BY 1),
      tot AS (
        SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
        FROM counts),
      sc AS (
        SELECT w, a, b, na, nb,
               CASE WHEN a > 0 THEN a *
                 (CAST(floor(ln(CAST(CAST(a AS HUGEINT) * (na + nb)
                    AS DOUBLE)) * 1000000.0) AS BIGINT)
                  - CAST(floor(ln(CAST(CAST(na AS HUGEINT) * (a + b)
                    AS DOUBLE)) * 1000000.0) AS BIGINT))
               ELSE 0 END AS ta,
               CASE WHEN b > 0 THEN b *
                 (CAST(floor(ln(CAST(CAST(b AS HUGEINT) * (na + nb)
                    AS DOUBLE)) * 1000000.0) AS BIGINT)
                  - CAST(floor(ln(CAST(CAST(nb AS HUGEINT) * (a + b)
                    AS DOUBLE)) * 1000000.0) AS BIGINT))
               ELSE 0 END AS tb
        FROM counts, tot)
      SELECT w AS word, a AS n_target, b AS n_rest,
             2 * (ta + tb) AS g2_micro,
             (CAST(a AS HUGEINT) * nb > CAST(b AS HUGEINT) * na)
               AS overrepresented
      FROM sc
      ORDER BY g2_micro DESC, word
      LIMIT 20
    """,

    // Replays the md5 split, the KN tables, the three probability
    // branches on the common denominator, and the per-term
    // micro-floored ln pair.
    "llm_kn_lm" -> s"""
      WITH d AS (
        SELECT doc_id, text,
               (CAST('0x' || substr(md5('kn|' || CAST(doc_id AS VARCHAR)),
                  1, 4) AS INT) % 5 = 0) AS ev
        FROM documents),
      tokt AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM d WHERE NOT ev),
      toke AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM d WHERE ev),
      bgt AS (
        SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
              FROM tokt)),
      bge AS (
        SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
              FROM toke)),
      big AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bgt GROUP BY 1, 2),
      c1t AS (
        SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1f
        FROM big GROUP BY 1),
      n1pt AS (
        SELECT w2, CAST(count(*) AS BIGINT) AS n1p FROM big GROUP BY 1),
      scal AS (
        SELECT (SELECT count(*) FROM big) AS b,
               (SELECT count(DISTINCT t)
                FROM (SELECT unnest(ws) AS t FROM tokt)) AS v),
      sc AS (
        SELECT e.doc_id,
               CASE WHEN c.c1 IS NULL
                      THEN CAST(coalesce(p.n1p, 0) + 1 AS HUGEINT)
                    WHEN g.c12 IS NULL
                      THEN CAST(3 * c.n1f AS HUGEINT)
                           * (coalesce(p.n1p, 0) + 1)
                    ELSE CAST(4 * g.c12 - 3 AS HUGEINT) * (s.b + s.v + 1)
                         + CAST(3 * c.n1f AS HUGEINT)
                           * (coalesce(p.n1p, 0) + 1) END AS num,
               CASE WHEN c.c1 IS NULL
                      THEN CAST(s.b + s.v + 1 AS HUGEINT)
                    ELSE CAST(4 * c.c1 AS HUGEINT) * (s.b + s.v + 1)
                    END AS den
        FROM bge e
        LEFT JOIN big g USING (w1, w2)
        LEFT JOIN c1t c USING (w1)
        LEFT JOIN n1pt p USING (w2)
        CROSS JOIN scal s)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             ${round6sql(
               "sum(CAST(floor(ln(CAST(den AS DOUBLE)) * 1000000.0) AS BIGINT)" +
               " - CAST(floor(ln(CAST(num AS DOUBLE)) * 1000000.0) AS BIGINT))" +
               " / CAST(count(*) AS DOUBLE) / 1000000.0")} AS avg_nll
      FROM sc GROUP BY 1 ORDER BY doc_id
    """,

    // Replays the moment aggregation, the probed integer sqrt, and
    // both largest-remainder apportionments in HUGEINT.
    "llm_temperature_mix" -> """
      WITH tok AS MATERIALIZED (
        SELECT source AS h, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS HUGEINT) AS tk
        FROM documents GROUP BY 1),
      s0 AS (
        SELECT h, tk * 1000000000000 AS x,
               CAST(floor(sqrt(CAST(tk * 1000000000000 AS DOUBLE)))
                 AS HUGEINT) AS r0
        FROM tok),
      s1 AS (SELECT h, x, CASE WHEN (r0 + 1) * (r0 + 1) <= x THEN r0 + 1
                               ELSE r0 END AS r1 FROM s0),
      shq AS (SELECT h, CASE WHEN r1 * r1 > x THEN r1 - 1 ELSE r1 END
                AS share FROM s1),
      shp AS (SELECT h, tk AS share FROM tok),
      shu AS (SELECT h, CAST(1 AS HUGEINT) AS share FROM tok),
      tp AS (SELECT sum(share) AS st FROM shp),
      qp AS (SELECT h, (1000000 * share) // st AS q,
                    (1000000 * share) % st AS rem FROM shp, tp),
      lp AS (SELECT 1000000 - sum(q) AS l FROM qp),
      ap AS (SELECT h, q + CASE WHEN rk <= l THEN 1 ELSE 0 END AS a
             FROM (SELECT h, q, row_number() OVER (ORDER BY rem DESC, h)
                     AS rk FROM qp), lp),
      tq AS (SELECT sum(share) AS st FROM shq),
      qq AS (SELECT h, (1000000 * share) // st AS q,
                    (1000000 * share) % st AS rem FROM shq, tq),
      lq AS (SELECT 1000000 - sum(q) AS l FROM qq),
      aq AS (SELECT h, q + CASE WHEN rk <= l THEN 1 ELSE 0 END AS a
             FROM (SELECT h, q, row_number() OVER (ORDER BY rem DESC, h)
                     AS rk FROM qq), lq),
      tu AS (SELECT sum(share) AS st FROM shu),
      qu AS (SELECT h, (1000000 * share) // st AS q,
                    (1000000 * share) % st AS rem FROM shu, tu),
      lu AS (SELECT 1000000 - sum(q) AS l FROM qu),
      au AS (SELECT h, q + CASE WHEN rk <= l THEN 1 ELSE 0 END AS a
             FROM (SELECT h, q, row_number() OVER (ORDER BY rem DESC, h)
                     AS rk FROM qu), lu)
      SELECT tok.h AS source, tok.n_docs,
             CAST(tok.tk AS BIGINT) AS n_tokens,
             CAST(ap.a AS BIGINT) AS alloc_prop,
             CAST(aq.a AS BIGINT) AS alloc_temp,
             CAST(au.a AS BIGINT) AS alloc_uniform
      FROM tok JOIN ap ON ap.h = tok.h JOIN aq ON aq.h = tok.h
      JOIN au ON au.h = tok.h
      ORDER BY source
    """,

    "llm_anchor_text" -> """
      WITH e AS (
        SELECT doc_id AS src, (doc_id * 7) % 1000 AS target,
               array_to_string((string_split(text, ' '))[1:3], ' ')
                 AS anchor
        FROM documents),
      ac AS (
        SELECT target, anchor, CAST(count(*) AS BIGINT) AS n
        FROM e GROUP BY target, anchor),
      rk AS (
        SELECT target, anchor, n,
               row_number() OVER (PARTITION BY target
                                  ORDER BY n DESC, anchor) AS r
        FROM ac)
      SELECT t.target, t.n_links, t.n_anchors, s.top_anchors
      FROM (SELECT target, CAST(sum(n) AS BIGINT) AS n_links,
                   CAST(count(*) AS BIGINT) AS n_anchors
            FROM ac GROUP BY target) t
      JOIN (SELECT target, string_agg(anchor, ' | ' ORDER BY r)
                     AS top_anchors
            FROM rk WHERE r <= 3 GROUP BY target) s USING (target)
      ORDER BY t.target
    """,

    "llm_prompt_pack" -> """
      WITH d AS (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               md5('fewshot-v1|' || CAST(doc_id AS VARCHAR)) AS sk
        FROM documents),
      rk AS (
        SELECT lang, doc_id, n_tok,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY sk, doc_id) AS rank
        FROM d),
      pre AS (
        SELECT lang, doc_id, n_tok, rank,
               sum(n_tok) OVER (PARTITION BY lang ORDER BY rank
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
        FROM rk WHERE rank <= 8)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_examples,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rank)
               AS example_ids
      FROM pre WHERE cum <= 160
      GROUP BY lang
      ORDER BY lang
    """,

    "llm_bigram_lm" -> s"""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      t AS (
        SELECT doc_id, unnest(w) AS tok,
               CAST(unnest(range(1, len(w) + 1)) AS BIGINT) AS pos
        FROM toks),
      bg AS (
        SELECT doc_id, tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM t),
      b AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
      big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
              FROM b GROUP BY 1, 2),
      uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM b GROUP BY 1),
      voc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM t),
      scored AS (
        SELECT b.doc_id,
               CAST(floor(-ln(CAST(c12 + 1 AS DOUBLE)
                              / CAST(c1 + v AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS nll_mu
        FROM b JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN voc)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             ${round6sql(
               "CAST(sum(nll_mu) AS DOUBLE) / CAST(count(*) AS DOUBLE)" +
               " / 1000000.0")} AS avg_nll
      FROM scored GROUP BY doc_id ORDER BY doc_id
    """,

    // Mirrors EvalOps.rougeBleu integer-for-integer: clipped counts,
    // micro ratios with the two-floor f1 order, micro-floored ln pairs,
    // toward-zero halving, the -20e6 zero-clip clamp.
    "llm_rouge_bleu" -> """
      WITH d AS (
        SELECT doc_id, source, text,
               lead(text) OVER (PARTITION BY source ORDER BY doc_id) AS ref
        FROM documents),
      p AS MATERIALIZED (
        SELECT doc_id AS pid, source, string_split(text, ' ') AS cw,
               string_split(ref, ' ') AS rw
        FROM d WHERE ref IS NOT NULL),
      cg1 AS (SELECT pid, g, count(*) AS c
              FROM (SELECT pid, unnest(cw) AS g FROM p) GROUP BY 1, 2),
      rg1 AS (SELECT pid, g, count(*) AS c
              FROM (SELECT pid, unnest(rw) AS g FROM p) GROUP BY 1, 2),
      cg2 AS (SELECT pid, g, count(*) AS c FROM (
                SELECT pid, unnest(CASE WHEN len(cw) >= 2
                  THEN list_transform(range(1, len(cw)),
                                      i -> cw[i] || ' ' || cw[i+1])
                  ELSE [] END) AS g FROM p) GROUP BY 1, 2),
      rg2 AS (SELECT pid, g, count(*) AS c FROM (
                SELECT pid, unnest(CASE WHEN len(rw) >= 2
                  THEN list_transform(range(1, len(rw)),
                                      i -> rw[i] || ' ' || rw[i+1])
                  ELSE [] END) AS g FROM p) GROUP BY 1, 2),
      k1 AS (SELECT pid, sum(least(cg1.c, rg1.c)) AS clip
             FROM cg1 JOIN rg1 USING (pid, g) GROUP BY pid),
      k2 AS (SELECT pid, sum(least(cg2.c, rg2.c)) AS clip
             FROM cg2 JOIN rg2 USING (pid, g) GROUP BY pid),
      j AS (
        SELECT p.source,
               len(cw) AS ct1, len(rw) AS rt1,
               greatest(len(cw) - 1, 0) AS ct2,
               greatest(len(rw) - 1, 0) AS rt2,
               coalesce(k1.clip, 0) AS k1c, coalesce(k2.clip, 0) AS k2c
        FROM p LEFT JOIN k1 USING (pid) LEFT JOIN k2 USING (pid)),
      gg AS (
        SELECT source, count(*) AS n_pairs,
               CAST(sum(k1c) AS BIGINT) AS k1,
               CAST(sum(ct1) AS BIGINT) AS c1,
               CAST(sum(rt1) AS BIGINT) AS r1,
               CAST(sum(k2c) AS BIGINT) AS k2,
               CAST(sum(ct2) AS BIGINT) AS c2,
               CAST(sum(rt2) AS BIGINT) AS r2
        FROM j GROUP BY source),
      m AS (
        SELECT source, n_pairs,
               CASE WHEN c1 > 0 THEN (k1 * 1000000) // c1 ELSE 0 END AS p1,
               CASE WHEN r1 > 0 THEN (k1 * 1000000) // r1 ELSE 0 END AS q1,
               CASE WHEN c2 > 0 THEN (k2 * 1000000) // c2 ELSE 0 END AS p2,
               CASE WHEN r2 > 0 THEN (k2 * 1000000) // r2 ELSE 0 END AS q2,
               k1, c1, r1, k2, c2
        FROM gg)
      SELECT source, CAST(n_pairs AS BIGINT) AS n_pairs,
             CAST(p1 AS BIGINT) AS rouge1_p_micro,
             CAST(q1 AS BIGINT) AS rouge1_r_micro,
             CAST(CASE WHEN p1 + q1 > 0
                       THEN (2 * p1 * q1) // (p1 + q1) ELSE 0 END
               AS BIGINT) AS rouge1_f1_micro,
             CAST(p2 AS BIGINT) AS rouge2_p_micro,
             CAST(q2 AS BIGINT) AS rouge2_r_micro,
             CAST(CASE WHEN p2 + q2 > 0
                       THEN (2 * p2 * q2) // (p2 + q2) ELSE 0 END
               AS BIGINT) AS rouge2_f1_micro,
             CAST(CASE WHEN k1 > 0 AND k2 > 0 AND c1 > 0 AND c2 > 0
                       THEN ((CAST(floor(ln(CAST(k1 AS DOUBLE)) * 1000000) AS BIGINT)
                              - CAST(floor(ln(CAST(c1 AS DOUBLE)) * 1000000) AS BIGINT)
                              + CAST(floor(ln(CAST(k2 AS DOUBLE)) * 1000000) AS BIGINT)
                              - CAST(floor(ln(CAST(c2 AS DOUBLE)) * 1000000) AS BIGINT))
                             // 2)
                            + least(CAST(0 AS BIGINT), 1000000
                                - ((r1 * 1000000) // greatest(c1, 1)))
                       ELSE -20000000 END AS BIGINT) AS log_bleu2_micro
      FROM m ORDER BY source
    """,

    "llm_rank_rbo" -> rankRboOracleSql,

    "llm_best_of_n" -> bestOfNOracleSql,

    "llm_weighted_sample" -> """
      WITH d AS (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      k AS (
        SELECT lang, doc_id, n_tok,
               list_min(list_transform(
                 range(1, least(greatest(n_tok, 1), 32) + 1),
                 j -> CAST('0x' || substr(md5('wbk-v1|'
                   || CAST(doc_id AS VARCHAR) || '|'
                   || CAST(j AS VARCHAR)), 1, 12) AS BIGINT)))
                 AS sample_key
        FROM d),
      r AS (
        SELECT lang, doc_id, n_tok, sample_key,
               row_number() OVER (PARTITION BY lang
                 ORDER BY sample_key, doc_id) AS rnk
        FROM k)
      SELECT lang, CAST(rnk AS INT) AS rank, doc_id, n_tok, sample_key
      FROM r WHERE rnk <= 5
      ORDER BY lang, rnk
    """,

    "llm_budget_waterfill" -> s"""
      WITH t AS (
        SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
        FROM documents GROUP BY source),
      tot AS (
        SELECT CAST(sum(avail) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n FROM t),
      b AS (SELECT (total * 9) // 10 AS budget, n FROM tot),
      r AS (
        SELECT source AS key, avail,
               CAST(row_number() OVER (ORDER BY avail, source) AS BIGINT) AS i,
               coalesce(CAST(sum(avail) OVER (ORDER BY avail, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS pex
        FROM t),
      s AS (
        SELECT key, avail, i, pex,
               (avail * (n - i + 1) <= budget - pex) AS saturated
        FROM r, b),
      ag AS (
        SELECT CAST(sum(CASE WHEN saturated THEN avail ELSE 0 END) AS BIGINT) AS satsum,
               CAST(sum(CASE WHEN saturated THEN 0 ELSE 1 END) AS BIGINT) AS m
        FROM s),
      u AS (
        SELECT key, avail, saturated,
               CAST(sum(CASE WHEN saturated THEN 0 ELSE 1 END)
                 OVER (ORDER BY avail, key ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS urank
        FROM s)
      SELECT key, avail,
             CASE WHEN saturated THEN avail
                  ELSE (budget - satsum) // m +
                       (CASE WHEN urank <= (budget - satsum) % m
                             THEN 1 ELSE 0 END)
             END AS allocated,
             saturated
      FROM u, ag, b ORDER BY key
    """,

    "llm_compaction_plan" -> """
      WITH f AS (
        SELECT source, doc_id AS file_id, n_chars AS bytes FROM documents),
      b AS (
        SELECT source, file_id, bytes,
               coalesce(CAST(sum(bytes) OVER (PARTITION BY source
                 ORDER BY file_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING) AS BIGINT), 0) AS before_b
        FROM f)
      SELECT source, before_b // 4000 AS out_file,
             CAST(count(*) AS BIGINT) AS n_inputs,
             CAST(sum(bytes) AS BIGINT) AS out_bytes,
             min(file_id) AS first_file, max(file_id) AS last_file
      FROM b GROUP BY source, before_b // 4000
      ORDER BY source, out_file
    """,

    // Same anchor algorithm spelled in SQL: candidate tokens from the
    // phrase-vocabulary join, grouped by implied anchor, a hit iff all
    // len slots matched (count DISTINCT idx).
    "llm_phrase_search" -> {
      val ptRows = PhrasePanel.flatMap { p =>
        val ws = p.split(" ")
        ws.zipWithIndex.map { case (w, i) =>
          s"('${p}', ${ws.length}, $i, '$w')" }
      }.mkString(", ")
      s"""
      WITH pt(phrase, len, idx, w) AS (VALUES $ptRows),
      tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      e AS (SELECT doc_id, unnest(range(len(ws))) AS pos, unnest(ws) AS w
            FROM tok),
      m AS (SELECT p.phrase, p.len, e.doc_id, e.pos - p.idx AS anchor, p.idx
            FROM e JOIN pt p USING (w)
            WHERE e.pos - p.idx >= 0),
      hits AS (
        SELECT phrase, doc_id, anchor
        FROM m GROUP BY phrase, len, doc_id, anchor
        HAVING count(DISTINCT idx) = len)
      SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS n_occ,
             CAST(min(anchor) AS BIGINT) AS first_pos
      FROM hits GROUP BY phrase, doc_id
      ORDER BY phrase, doc_id
    """
    },

    // INDEPENDENT algorithm: brute-force substr comparison at every char
    // position (all-end-position semantics — overlapping and nested
    // occurrences all count, exactly what the automaton emits).
    "llm_blocklist" -> {
      val patRows = BlocklistPanel.map(p => s"('$p')").mkString(", ")
      s"""
      WITH pats(pat) AS (VALUES $patRows),
      pos AS (SELECT doc_id, source, text,
                     unnest(range(1, len(text) + 1)) AS i
              FROM documents),
      hits AS (
        SELECT p.pat, pos.source, pos.doc_id, count(*) AS hits
        FROM pos, pats p
        WHERE substr(pos.text, CAST(pos.i AS INTEGER), len(p.pat)) = p.pat
        GROUP BY 1, 2, 3)
      SELECT pat, source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(hits) AS BIGINT) AS total_hits
      FROM hits GROUP BY pat, source
      ORDER BY pat, source
    """
    },

    "llm_prefix_cache_plan" -> """
      WITH b AS (
        SELECT md5(array_to_string(ws[1:least(len(ws), 16)], ' '))
                 AS prefix_md5,
               CAST(least(len(ws), 16) AS BIGINT) AS prefix_tokens
        FROM (SELECT string_split(text, ' ') AS ws FROM documents)),
      g AS (
        SELECT prefix_md5, prefix_tokens, count(*) AS n_docs
        FROM b GROUP BY 1, 2
        HAVING count(*) >= 2)
      SELECT prefix_md5, prefix_tokens, CAST(n_docs AS BIGINT) AS n_docs,
             CAST((n_docs - 1) * prefix_tokens AS BIGINT) AS saved_tokens
      FROM g
      ORDER BY saved_tokens DESC, prefix_md5
      LIMIT 20
    """,

    "llm_texttiling" -> """
      WITH tok AS (
        SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos,
               unnest(ws) AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents)),
      bw AS MATERIALIZED (
        SELECT DISTINCT doc_id, pos // 10 AS b, w FROM tok),
      nb AS MATERIALIZED (
        SELECT doc_id, b, count(*) AS n FROM bw GROUP BY 1, 2),
      inter AS (
        SELECT x.doc_id, x.b, count(*) AS i
        FROM bw x JOIN bw y ON y.doc_id = x.doc_id AND y.b = x.b + 1
                           AND y.w = x.w
        GROUP BY 1, 2),
      j AS (
        SELECT a.doc_id, a.b AS gap,
               (coalesce(i.i, 0) * 1000000)
                 // (a.n + c.n - coalesce(i.i, 0)) AS jac
        FROM nb a
        JOIN nb c ON c.doc_id = a.doc_id AND c.b = a.b + 1
        LEFT JOIN inter i ON i.doc_id = a.doc_id AND i.b = a.b),
      d AS (
        SELECT doc_id, gap, jac,
               lag(jac) OVER (PARTITION BY doc_id ORDER BY gap) AS jl,
               lead(jac) OVER (PARTITION BY doc_id ORDER BY gap) AS jr
        FROM j)
      SELECT doc_id, CAST(gap AS BIGINT) AS gap,
             CAST(jac AS BIGINT) AS jac_micro,
             CAST(greatest(coalesce(jl, jac) - jac, 0)
                  + greatest(coalesce(jr, jac) - jac, 0) AS BIGINT)
               AS depth_micro,
             ((jl IS NULL OR jac < jl) AND (jr IS NULL OR jac < jr)
              AND greatest(coalesce(jl, jac) - jac, 0)
                  + greatest(coalesce(jr, jac) - jac, 0) >= 100000)
               AS boundary
      FROM d
      ORDER BY doc_id, gap
    """,

    // span-corruption replay: the same block/offset arithmetic with
    // DuckDB's 0x-cast md5 nibble parse and a scalar range unnest.
    "llm_span_corruption" -> """
      WITH base AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(string_split(text, ' ')) AS BIGINT) // 20
                 AS n_spans
        FROM documents),
      blocks AS (
        SELECT doc_id, unnest(range(0, n_spans)) AS blk
        FROM base WHERE n_spans > 0),
      offs AS (
        SELECT doc_id,
               CAST(sum(blk * 20 + 1 +
                 CAST('0x' || substr(md5('span|' || CAST(doc_id AS VARCHAR)
                   || '|' || CAST(blk AS VARCHAR)), 1, 4) AS BIGINT) % 18)
                 AS BIGINT) AS span_start_sum
        FROM blocks GROUP BY doc_id)
      SELECT b.doc_id, b.n_tokens, b.n_spans,
             b.n_spans * 3 AS n_corrupted,
             b.n_tokens - b.n_spans * 3 + b.n_spans AS input_len,
             CASE WHEN b.n_spans > 0 THEN b.n_spans * 4 + 1
                  ELSE 0 END AS target_len,
             coalesce(o.span_start_sum, 0) AS span_start_sum
      FROM base b LEFT JOIN offs o USING (doc_id)
      ORDER BY b.doc_id
    """,

  )
}
