package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{EvalOps, EventOps, FeatureOps, Multimodal, TextOps, VectorOps}

/** LLM-training-data-pipeline queries over the driver's `documents` /
  * `embeddings` / `events` tables, each paired with a DuckDB oracle
  * (BASELINE.json north star; none of this exists in the reference).
  *
  * Cross-engine determinism (same rules as [[RefSurface]]):
  *  - hashes are md5/sha256 lowercase hex — identical in both engines;
  *  - ratios go through `floor(x*1e6+0.5)/1e6`; money sums quantize to
  *    integer cents before summation;
  *  - embedding math runs on integer-QUANTIZED vectors (`floor(x*1000)`
  *    per component) so dot products are exact integer arithmetic — float
  *    reductions are never compared across engines;
  *  - timestamps cross the boundary as formatted strings; window starts
  *    are derived from epoch-second arithmetic on both sides;
  *  - every output has a total ORDER BY.
  */
object LlmSurface {

  private[queries] val stopwords = Seq("the", "a", "of", "to", "in")

  // X269 SPRT hypothesis pairs, shared by the query and its oracle so
  // the driver-folded ln constants are identical by construction
  private val sprtScenarios = Seq(
    ("near_19_21", 0.19, 0.21), // brackets the true ~0.20 -> wanders
    ("low_10_12", 0.10, 0.12),  // true rate far above -> accept_h1
    ("high_30_32", 0.30, 0.32)) // true rate far below -> accept_h0

  /** SemDeDup tuning shared by llm_semantic_dedup / llm_joint_curation
    * and their oracles: the in-cluster dot threshold (~p99 of in-cluster
    * dots on this corpus) and the target expected cluster size that
    * [[graft.llm.VectorOps.kForCorpus]] turns into a corpus-dependent k.
    */
  private val SemanticDupMinDotQ = 340000L
  private val SemanticClusterTarget = 64

  /** 18 words planted into every 25th document by llm_substring_dedup
    * (in BOTH engines) so cross-document span sharing exists to detect.
    */
  private[queries] val Boilerplate =
    "this dataset is distributed under the creative commons attribution " +
    "license please retain this notice when redistributing any copies"

  /** Phrase panel for llm_phrase_search — fixed in BOTH engines. Chosen
    * against the shared soup vocabulary: a frequent bigram, a rarer
    * trigram, and two REPEATED-WORD phrases (the positional-match
    * correctness trap: adjacency must be per-slot, not per-word).
    */
  private val PhrasePanel = Seq(
    "table hash", "slow hash batch", "filter value small value",
    "table table")

  /** Blocklist panel for llm_blocklist — fixed in BOTH engines.
    * Char-level substrings chosen to pin every Aho–Corasick correctness
    * trap: "ar" nests inside "spark"/"part" (dict-suffix outputs),
    * "able" inside "table", "a a" self-overlaps ("a a a" contains TWO
    * occurrences — all-end-position semantics), "zzz" is absent (no
    * phantom rows), plus two multi-word literals.
    */
  private[queries] val BlocklistPanel = Seq(
    "spark", "ar", "able", "hash value", "scan slow", "a a",
    "merge batch", "zzz")

  /** `documents` with the boilerplate planted (column `aug`) — shared by
    * llm_substring_dedup and llm_dup_span_runs so both span queries see
    * the same injection.
    */
  private def boilerplatedDocs(s: SparkSession, dir: String) =
    Tables(s, dir, "documents").withColumn("aug",
      when(col("doc_id") % 25 === 0, concat(col("text"), lit(" " + Boilerplate)))
        .otherwise(col("text")))

  /** `documents` with every 40th doc (doc_id % 40 == 1) replaced by the
    * first 60% of the PREVIOUS doc's characters — a planted "quote page"
    * whose shingle set is nearly contained in its source. Both engines
    * plant identically; the cut may split a trailing word (one shingle
    * lost), which is why llm_containment_join thresholds at 0.8, not 1.0.
    */
  private def quotedDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val prev = d.select((col("doc_id") + 1).as("doc_id"),
      col("text").as("_ptext"), col("n_chars").as("_pn"))
    d.join(prev, Seq("doc_id"), "left")
      .withColumn("aug",
        when(col("doc_id") % 40 === 1 && col("_ptext").isNotNull,
          expr("substring(_ptext, 1, cast(_pn * 6 div 10 as int))"))
          .otherwise(col("text")))
      .select("doc_id", "aug")
  }

  /** Boilerplate LINES planted by llm_line_dedup (both engines): every
    * 10th doc gets the header prepended, every 15th the footer appended,
    * '\n'-separated — cross-document duplicate lines inside documents
    * that are NOT duplicates of each other, exactly what line-level
    * dedup exists to remove.
    */
  private val HeaderLine = "subscribe to our newsletter for daily updates"
  private val FooterLine = "copyright twenty twenty four all rights reserved"

  /** BPE-ish tokenizer regex: alnum runs or single non-alnum marks.
    * Whitespace is spelled as explicit characters (not `\s`) so Java
    * regex and RE2 read the identical byte pattern.
    */
  private val BpeTokenRe = "[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

  /** Host part of the first URL in a document (group 1). */
  private val UrlDomainRe = "https?://([^ /]+)"

  /** Decomposed-unicode injection for llm_normalize: 'e' + U+0301
    * (combining acute) and 'N' + U+0303 (combining tilde) — NFC composes
    * them to é / Ñ. Built from code points so no source-encoding or
    * escape-processing ambiguity reaches either engine.
    */
  val NormSuffix: String = " cafe\u0301 NIN\u0303O" // escapes resolve to the combining marks

  /** Marker-word language profiles (tie-break = list order). The corpus
    * vocabulary is a 31-word synthetic soup, so the markers are chosen
    * from it; a production system would plug trained char-n-gram profiles
    * into the same argmax shape.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("hash", "join"),
    "en" -> Seq("the", "a", "fast"),
    "es" -> Seq("data", "table"),
    "fr" -> Seq("merge", "sort"),
    "zh" -> Seq("spark", "vector"))

  /** Driver-folded micro-quantized trig table for the fixed-period
    * periodogram (X365): (period, t mod period, ⌊cos·10⁶⌉, ⌊sin·10⁶⌉).
    * ONE source of truth — the Spark query builds a DataFrame from it
    * and the oracle SQL interpolates the SAME literals, so no engine
    * ever evaluates a transcendental (the llm_bandit_ucb discipline).
    */
  private[graft] val periodogramTrig: Seq[(Long, Long, Long, Long)] =
    Seq(7, 14, 30).flatMap { p =>
      (0 until p).map { r =>
        val th = 2.0 * math.Pi * r / p
        (p.toLong, r.toLong, math.rint(math.cos(th) * 1e6).toLong,
          math.rint(math.sin(th) * 1e6).toLong)
      }
    }

  /** The X351 retrieval oracle CTE chain (through `ranked`) — shared
    * by llm_lm_retrieval and its X370 eval so the two can never
    * drift. */
  private def lmRetrievalSqlCtes: String = """d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      tf AS MATERIALIZED (
        SELECT doc_id, w, count(*) AS tf FROM (
          SELECT doc_id, unnest(ws) AS w FROM d) GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
      cf AS MATERIALIZED (
        SELECT w, sum(tf) AS cf FROM tf GROUP BY 1),
      ctot AS (SELECT sum(cf) AS c FROM cf),
      qt AS MATERIALIZED (
        SELECT tf.doc_id AS query_id, tf.w, tf.tf AS qtf, cf.cf, ctot.c,
               CAST(floor(ln(CAST(2000 * cf.cf AS DOUBLE)) * 1000000)
                 AS BIGINT) AS lc_mu_cf
        FROM tf JOIN cf USING (w), ctot
        WHERE tf.doc_id % 100 = 0 AND tf.doc_id < 2400),
      qconst AS (
        SELECT query_id,
               sum(qtf * (lc_mu_cf
                 - CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000)
                     AS BIGINT))) AS qconst,
               sum(qtf) AS nq
        FROM qt GROUP BY 1),
      matched AS (
        SELECT qt.query_id, tf.doc_id,
               sum(qt.qtf *
                 (CAST(floor(ln(CAST(tf.tf * qt.c + 2000 * qt.cf
                    AS DOUBLE)) * 1000000) AS BIGINT)
                  - qt.lc_mu_cf)) AS msum
        FROM qt JOIN tf USING (w)
        WHERE tf.doc_id <> qt.query_id
        GROUP BY 1, 2),
      scored AS (
        SELECT m.query_id, m.doc_id,
               q.qconst + m.msum
                 - q.nq * CAST(floor(ln(CAST(dl.dl + 2000 AS DOUBLE))
                     * 1000000) AS BIGINT) AS score_micro
        FROM matched m JOIN dl USING (doc_id)
        JOIN qconst q USING (query_id)),
      ranked AS MATERIALIZED (
        SELECT query_id, doc_id, score_micro,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score_micro DESC, doc_id) AS rank
        FROM scored)"""

  /** Shared X351 Dirichlet-QL retrieval pipeline (top-5 per query,
    * unordered) — consumed by llm_lm_retrieval and its X370 eval.
    *
    * RESIDUAL CROSS-ENGINE RISK (documented, accepted): scores use
    * floor(ln(integer)·1e6) evaluated AT RUNTIME in both engines (JVM
    * `Math.log` here, libm `ln` in DuckDB) — the one departure from
    * the driver-folded-literal discipline the Gumbel/periodogram
    * transcendentals follow, because the ln arguments are data-derived
    * (tf·c + μ·cf spans the corpus, unfoldable). The two libms are not
    * guaranteed bit-identical: an argument whose ln·1e6 lands within
    * ~1 ulp (≈4·10⁻⁹ after scaling) of an integer boundary can floor
    * differently and flip one score by 1 micro. Per distinct argument
    * that's a ~10⁻⁸ event; the failure mode is a LOUD hash mismatch in
    * the correctness gate (never silent corruption), and ties are
    * already broken by doc_id so equal-score ordering cannot diverge.
    * Bounding it exactly would need an integer-exact ln probe (the
    * isqrtDec trick has no ln analogue without exp, another
    * transcendental) — not worth it against a detectable 10⁻⁸ flake.
    */
  private def lmRetrievalTop5(s: SparkSession, dir: String): DataFrame = {
    val mu = 2000L
    def lmu(c: org.apache.spark.sql.Column) =
      floor(log(c.cast("double")) * 1000000.0).cast("long")
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), TextOps.words(col("text")).as("_w"))
      .localCheckpoint(true) // tf, dl, cf and the query side all read it
    val tf = d.select(col("doc_id"), explode(col("_w")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dl = d.select(col("doc_id"), size(col("_w")).cast("long").as("dl"))
    val cf = tf.groupBy("w").agg(sum("tf").as("cf"))
    val ctot = cf.agg(sum("cf").as("c"))
    val qt = tf.filter(col("doc_id") % 100 === 0
        && col("doc_id") < 2400)
      .select(col("doc_id").as("query_id"), col("w"),
        col("tf").as("qtf"))
      .join(cf, "w")
      .crossJoin(broadcast(ctot)) // 1-row scalar join
      .withColumn("lc_mu_cf", lmu(lit(mu) * col("cf")))
      .localCheckpoint(true) // qconst agg + the match join both read it
    val qconst = qt.groupBy("query_id")
      .agg(sum(col("qtf") * (col("lc_mu_cf") - lmu(col("c"))))
        .as("qconst"),
        sum("qtf").as("nq"))
    val matched = qt.join(tf, Seq("w"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("qtf") *
        (lmu(col("tf") * col("c") + lit(mu) * col("cf"))
          - col("lc_mu_cf"))).as("msum"))
    val scored = matched.join(dl, "doc_id").join(qconst, "query_id")
      .withColumn("score_micro",
        col("qconst") + col("msum") - col("nq") * lmu(col("dl") + mu))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"))
  }

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  /** The X284 planted-dirt linkage feed, shared by llm_record_linkage
    * and llm_sorted_neighborhood (one definition so the two queries
    * grade the same feed): (master m_*, dirty f_* with OCR'd 'X' name
    * prefix on every 7th key, nation off-by-one on every 5th, +1.37
    * balance drift on every 3rd, segment loss on every 11th; dirty
    * ids = master id + 1_000_000).
    */
  private def linkageFeed(cust: DataFrame): (DataFrame, DataFrame) = {
    val m = cust.select(col("c_custkey").as("m_key"),
      col("c_name").as("m_name"), col("c_nationkey").as("m_nat"),
      col("c_acctbal").as("m_bal"), col("c_mktsegment").as("m_seg"))
    val f = cust.select(
      (col("c_custkey") + 1000000L).as("f_key"),
      when(col("c_custkey") % 7 === 0,
        concat(lit("X"), col("c_name"))).otherwise(col("c_name"))
        .as("f_name"),
      when(col("c_custkey") % 5 === 0, (col("c_nationkey") + 1) % 25)
        .otherwise(col("c_nationkey")).as("f_nat"),
      when(col("c_custkey") % 3 === 0, col("c_acctbal") + 1.37)
        .otherwise(col("c_acctbal")).as("f_bal"),
      when(col("c_custkey") % 11 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("f_seg"))
    (m, f)
  }

  /** KMV cardinality estimator over a sorted k-min-hash array column:
    * size(c) when the sketch is unsaturated, else ⌊(k−1)·2⁶⁰/h_k⌋.
    * The quotient is clamped at 2⁶² BEFORE the bigint cast — on a
    * pathologically tiny k-th hash Spark's non-ANSI double→long cast
    * would saturate to Long.MaxValue while DuckDB's raises, so BOTH
    * engines spell `least(·, 2⁶²)` and agree exactly (ADVICE r9;
    * clamp pinned by KmvClampSpec with a planted h_k = 3).
    */
  private[graft] def kmvEst(c: String, k: Int): Column = {
    val pow = s"cast(${k - 1} as double) * cast(1152921504606846976 as double)"
    expr(s"case when size($c) < $k then cast(size($c) as bigint) " +
      s"else cast(least(floor($pow / cast(element_at($c, $k) as double)), " +
      s"cast(4611686018427387904 as double)) as bigint) end")
  }

  /** IVF-PQ index build shared by llm_ann_ivf_pq and llm_ann_refined
    * (one definition so the two queries cannot drift). √n coarse lists
    * (FAISS guidance — the broadcast centroid table stays model-sized as
    * the corpus grows, unlike an n/c list count); the residual table is
    * checkpointed because it feeds two Lloyd loops (each re-reading it
    * per round), the encode pass, and the code/list join — recomputing
    * the 3-way join per consumer measured 9 s at sf0.1. This is the
    * "persist the index-build input" a real build does.
    */
  private case class IvfPqIndex(emb: DataFrame, coarse: DataFrame,
      cb: DataFrame, codes: DataFrame, qs: DataFrame,
      dot: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      m: Int, subDim: Int)

  private def ivfPqIndex(s: SparkSession, dir: String): IvfPqIndex = {
    val emb = Tables(s, dir, "embeddings")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val dot = VectorOps.dotFn(s)
    val (m, subDim, ksub) = (2, 32, 16)
    val nList = VectorOps.nListForCorpus(emb.count())
    val coarse = VectorOps.kMeansCentroids(emb, "vec_id", "qv", k = nList,
      iters = 2, dot = dot)
    val resid = emb
      .join(VectorOps.assignToCentroids(emb, "vec_id", "qv", coarse, dot), "vec_id")
      .join(broadcast(coarse.select(col("cid").as("centroid_id"), col("cv"))),
        "centroid_id")
      .select(col("vec_id"), col("centroid_id"),
        zip_with(col("qv"), col("cv"), (a, b) => a - b).as("rv"))
      .localCheckpoint(true)
    val cb = VectorOps.pqCodebooks(resid, "vec_id", "rv", m, subDim, ksub,
      iters = 2, dot = dot)
    val codes = VectorOps.pqEncode(resid, "vec_id", "rv", cb, m, subDim, dot = dot)
      .join(resid.select("vec_id", "centroid_id"), "vec_id")
    val qs = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
    IvfPqIndex(emb, coarse, cb, codes, qs, dot, m, subDim)
  }

  // BOUNDED-PANEL discipline (the llm_lm_retrieval lesson, r12): every
  // `vec_id % 100 === 0` query panel ALSO filters `vec_id < 2000`, so
  // the panel is 20 queries at EVERY scale instead of growing with the
  // corpus. At sf0.01/sf0.1 all vec_ids are < 2000, so the cap is a
  // no-op there (oracles unchanged); at sf1 it is what separates a
  // linear probe from the measured 199x quadratic (panel x corpus /
  // panel x centroid products — the r13 full-suite sweep's catch).

  /** Fixed 64-query evaluation panel, md5-sampled from the query set —
    * shared by the ANN evaluation queries (recall, retrieval metrics) so
    * they grade the same queries. The row_number is a global sort over
    * |queries| rows (n/100), never the corpus.
    */
  private[graft] def annPanel(qs: DataFrame): DataFrame = qs
    .withColumn("_ph", expr("cast(conv(substring(md5(concat('panel|', " +
      "cast(vec_id as string))), 1, 15), 16, 10) as bigint)"))
    .withColumn("_pr", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("_ph"), col("vec_id"))))
    .filter(col("_pr") <= 64).drop("_ph", "_pr")

  /** Deterministic "cross-encoder" weight vector for the rerank stage:
    * 64 md5-derived ints in [−1000, 1000] (1-based dim labels). A real
    * deployment loads trained weights; the PLUMBING — model-sized
    * broadcast literal, shortlist equi-join, elementwise interaction
    * s(q,d) = w·(q⊙d), per-query re-rank — is what this exercises, and
    * the md5 derivation lets the DuckDB oracle rebuild the same model.
    */
  private val CeWeights: Seq[Long] = (1 to 64).map { j =>
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ce|$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    (java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup: sha256 content hash, keep-first --------------------
    "llm_exact_dedup" -> ((s, dir) => {
      TextOps.exactDedup(Tables(s, dir, "documents"), "text", "doc_id")
        .select("doc_id", "content_sha", "n_copies")
        .orderBy("doc_id")
    }),

    // ---- fingerprint dedup: order/repetition-invariant word-set key ------
    // Keep-first = min_by argmin in ONE hash aggregation (map-side partial
    // combine, no per-key sort) — same form as TextOps.exactDedup; the
    // row_number-window spelling shuffles and sorts every row.
    "llm_fingerprint_dedup" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("wordset_fp", TextOps.wordsetFingerprint(col("text")))
        .withColumn("minhash_fp", TextOps.minWordHash(col("text")))
        .groupBy("wordset_fp")
        .agg(
          min_by(struct(col("doc_id"), col("minhash_fp")), col("doc_id")).as("_f"),
          count(lit(1)).as("n_copies"))
        .select(col("_f.doc_id").as("doc_id"), col("wordset_fp"),
          col("_f.minhash_fp").as("minhash_fp"), col("n_copies"))
        .orderBy("doc_id")
    }),

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

    // ---- persisted dedup-index roundtrip ---------------------------------
    // X53 claims "base signatures persistable" — this EXECUTES that
    // path: write the base corpus's content-sha index to parquet, read
    // it back from disk, and check tonight's batch against the WRITTEN
    // files. The oracle reads the same parquet (k1-style engine
    // roundtrip), so writer fidelity and membership logic are both
    // pinned. Base = 3/4 of the corpus plus every 20th batch doc
    // ("yesterday already ingested some of tonight's feed" — the
    // natural dups don't cross the split), so both classes live.
    "llm_sig_roundtrip" -> ((s, dir) => {
      val out = s"/tmp/graft_sig_out/${new java.io.File(dir).getName}"
      val docs = Tables(s, dir, "documents")
      docs.filter(col("doc_id") % 4 =!= 0 || col("doc_id") % 20 === 0)
        .select(col("doc_id"), sha2(col("text"), 256).as("content_sha"))
        .coalesce(1).write.mode("overwrite").parquet(out)
      val baseShas = s.read.parquet(out)
        .select(col("content_sha").as("_b")).distinct()
      // tonight's batch: the quarter held out of the base (the %20
      // overlap means some of it is already indexed — known_exact=true)
      docs.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), sha2(col("text"), 256).as("content_sha"))
        .join(baseShas, col("content_sha") === col("_b"), "left")
        .select(col("doc_id"), col("content_sha"),
          col("_b").isNotNull.as("known_exact"))
        .orderBy("doc_id")
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

    // ---- corpus snapshot diff (incremental-build change table) -----------
    // What changed between corpus v1 and v2? added / removed / changed /
    // unchanged per doc via one full-outer join of content-sha tables on
    // the near-unique id — the decision input for incremental dedup and
    // index maintenance. v2 is a deterministic mutation of v1 (both
    // engines): every 17th doc edited, every 23rd dropped, a clone of
    // every 29th added under a new id.
    "llm_snapshot_diff" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val v1 = docs.select(col("doc_id"), sha2(col("text"), 256).as("_s1"))
      val v2base = docs.filter(col("doc_id") % 23 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 17 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val added = docs.filter(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" new")).as("text"))
      val v2 = v2base.union(added)
        .select(col("doc_id"), sha2(col("text"), 256).as("_s2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("_s1").isNull, "added")
            .when(col("_s2").isNull, "removed")
            .when(col("_s1") =!= col("_s2"), "changed")
            .otherwise("unchanged").as("status"))
        .orderBy("doc_id")
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

    // ---- PageRank by power iteration (join-per-round graph rank) ---------
    // Integer nano-unit damped rank over a deterministic hub-and-spoke
    // link table derived from doc ids (the hashModelWeights argument:
    // swap the edge table — web hosts, citation graph, dup clusters —
    // keep the plan). Each round = one edge⋈rank equi-join + one
    // partial-combine sum on dst; rank table checkpointed per round.
    // Oracle replays the SAME 3 iterations as generated CTEs.
    "llm_graph_rank" -> ((s, dir) => {
      val nodes = Tables(s, dir, "documents").select(col("doc_id").as("id"))
      val members = nodes.filter(col("id") % 10 =!= 0)
        .select(col("id").as("src"), (col("id") - (col("id") % 10)).as("dst"))
      val hubs = nodes.filter(col("id") % 10 === 0 && col("id") =!= 0)
      val edges = members
        .union(hubs.select(col("id").as("src"), lit(0L).as("dst")))
        .union(hubs.select(col("id").as("src"), (col("id") + 1).as("dst")))
      graft.operators.PageRank.run(edges, nodes, iters = 3)
        .select(col("id").as("doc_id"), col("rank").as("rank_nano"),
          TextOps.round6(col("rank") / 1000000000.0).as("rank"))
        .orderBy("doc_id")
    }),

    // ---- HITS hubs & authorities (Kleinberg 1999) ------------------------
    // The two-role companion to llm_graph_rank over the SAME synthetic
    // hub-and-spoke link table: members (pointing at hubs) come out as
    // hubs, hub docs (pointed at by many members) as authorities — the
    // split one PageRank number conflates. Integer micro-units with
    // divide-by-max normalization (L2 needs an IEEE sqrt per round,
    // not bit-stable cross-engine); each round is two edge⋈score
    // equi-joins + combine sums + a 1-row max broadcast. Oracle
    // replays all 4 rounds unrolled.
    "llm_graph_hits" -> ((s, dir) => {
      val nodes = Tables(s, dir, "documents").select(col("doc_id").as("id"))
      val members = nodes.filter(col("id") % 10 =!= 0)
        .select(col("id").as("src"), (col("id") - (col("id") % 10)).as("dst"))
      val hubs = nodes.filter(col("id") % 10 === 0 && col("id") =!= 0)
      val edges = members
        .union(hubs.select(col("id").as("src"), lit(0L).as("dst")))
        .union(hubs.select(col("id").as("src"), (col("id") + 1).as("dst")))
      graft.operators.Hits.run(edges, nodes, iters = 4)
        .select(col("id").as("doc_id"), col("auth_micro"), col("hub_micro"))
        .orderBy("doc_id")
    }),

    // ---- strongly connected components (FB coloring) ---------------------
    // The directed closure CC can't give: mutual-reachability
    // components over the link table plus planted ring edges
    // (id→id+3 for id%10 ∈ {1,4} closes a 4-cycle h→h+1→h+4→h+7→h
    // in every decade). Forward-min fixpoint → per-color backward
    // flag → peel; oracle recomputes from the recursive-CTE closure.
    "llm_graph_scc" -> ((s, dir) => {
      val nodes = Tables(s, dir, "documents").select(col("doc_id").as("id"))
      val members = nodes.filter(col("id") % 10 =!= 0)
        .select(col("id").as("src"), (col("id") - (col("id") % 10)).as("dst"))
      val hubs = nodes.filter(col("id") % 10 === 0 && col("id") =!= 0)
      val rings = nodes.filter(col("id") % 10 === 1 || col("id") % 10 === 4)
        .select(col("id").as("src"), (col("id") + 3).as("dst"))
      val edges = members
        .union(hubs.select(col("id").as("src"), lit(0L).as("dst")))
        .union(hubs.select(col("id").as("src"), (col("id") + 1).as("dst")))
        .union(rings)
        .join(nodes.withColumnRenamed("id", "dst"), "dst") // existing dsts
        .select("src", "dst")
      graft.operators.Scc.components(edges, nodes)
        .select(col("id").as("doc_id"), col("scc"))
        .orderBy("doc_id")
    }),

    // ---- condensation DAG levels (dependency depth) ----------------------
    // Collapse the SCCs and read each component's longest-path level
    // — defined only once cycles are gone. Same edge synthesis as
    // llm_graph_scc; levels by iterative max propagation (rounds =
    // DAG depth).
    "llm_graph_condensation" -> ((s, dir) => {
      val nodes = Tables(s, dir, "documents").select(col("doc_id").as("id"))
      val members = nodes.filter(col("id") % 10 =!= 0)
        .select(col("id").as("src"), (col("id") - (col("id") % 10)).as("dst"))
      val hubs = nodes.filter(col("id") % 10 === 0 && col("id") =!= 0)
      val rings = nodes.filter(col("id") % 10 === 1 || col("id") % 10 === 4)
        .select(col("id").as("src"), (col("id") + 3).as("dst"))
      val edges = members
        .union(hubs.select(col("id").as("src"), lit(0L).as("dst")))
        .union(hubs.select(col("id").as("src"), (col("id") + 1).as("dst")))
        .union(rings)
        .join(nodes.withColumnRenamed("id", "dst"), "dst")
        .select("src", "dst")
        .localCheckpoint(eager = true)
      val scc = graft.operators.Scc.components(edges, nodes)
      graft.operators.Scc.condensationLevels(edges, scc)
    }),

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

    // ---- MinHash-LSH near-duplicate pairs --------------------------------
    // Candidates come from a band-key EQUI-join (12 hashes, 4 bands × 3
    // rows → ~0.63 Jaccard S-curve midpoint), then exact-Jaccard verify.
    // The all-pairs O(n²) similarity join is rejected by construction.
    "llm_near_dup" -> ((s, dir) => {
      // repartitionInput: the test corpus is one small parquet file (one
      // scan split), which would serialize the shingle explode onto a
      // single task — the caller knows its input shape, the operator
      // doesn't guess (TextOps.nearDupPairs scaladoc).
      TextOps.nearDupPairs(Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numBands = 4, rowsPerBand = 3, threshold = 0.5,
        repartitionInput = true)
        .orderBy("doc_a", "doc_b")
    }),

    // ---- EXACT set-similarity join (PPJoin prefix filter) ----------------
    // The no-false-negatives complement to llm_near_dup: candidates are
    // an equi-join on rare-first prefix tokens (provably complete for
    // Jaccard >= 0.5), then exact verification. The oracle is the
    // brute-force all-pairs join — equality proves the prefix filter
    // lossless on this corpus.
    "llm_set_sim_join" -> ((s, dir) => {
      // no materialize hook: the three consumers of the per-doc state
      // dedupe via ReusedExchange inside this one query (a checkpoint
      // measured slower — see setSimJoin scaladoc)
      TextOps.setSimJoin(Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.5)
        .orderBy("doc_a", "doc_b")
    }),

    // ---- LSH recall evaluation (exact ground truth × banded LSH) ---------
    // The tuning loop every LSH deployment needs: which TRUE pairs (from
    // the lossless prefix-filter join) did the banded MinHash find?
    // Per-pair detail rows so recall regressions are attributable to
    // specific jaccard bands, not just a summary ratio. Both sides are
    // candidate-bounded equi-joins; in production they'd share one
    // persisted signature table via the materialize hooks.
    "llm_lsh_recall" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val exact = TextOps.setSimJoin(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      val lsh = TextOps.nearDupPairs(docs, "doc_id", "text",
        shingleN = 3, numBands = 4, rowsPerBand = 3, threshold = 0.5,
        repartitionInput = true)
        .select(col("doc_a"), col("doc_b"), lit(true).as("_hit"))
      exact.join(lsh, Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          coalesce(col("_hit"), lit(false)).as("found_by_lsh"))
        .orderBy("doc_a", "doc_b")
    }),

    // ---- incremental dedup: new batch vs existing base corpus ------------
    // The production shape: dedup tonight's crawl against the corpus we
    // already have. Exact dups via content-sha equi-join; near dups via
    // BIPARTITE banded LSH (batch bands × base bands) — candidate work
    // scales with batch collisions, never |corpus|².
    "llm_incremental_dedup" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val batch = docs.filter(col("doc_id") % 4 === 0)
      val base = docs.filter(col("doc_id") % 4 =!= 0)
      TextOps.incrementalDedup(batch, base, "doc_id", "text",
        repartitionInput = true)
        .orderBy("doc_id")
    }),

    // ---- winnowing (MOSS) fingerprint per document -----------------------
    "llm_winnow_fp" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("_w"))
      d.select(col("doc_id"),
        TextOps.winnowFingerprint(col("_w"), shingleN = 3, windowK = 4).as("winnow_fp"))
        .withColumn("n_copies",
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("winnow_fp")))
        .orderBy("doc_id")
    }),

    // ---- 60-bit SimHash per document -------------------------------------
    "llm_simhash" -> ((s, dir) => {
      TextOps.simHash(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- exact substring dedup (Lee et al. 2022): cross-doc k-token spans
    // The synthetic corpus shares no long spans between non-identical
    // docs, so every 25th doc gets the SAME 18-word boilerplate appended
    // (both engines) — each then carries 9 shared 10-token windows while
    // staying a whole-doc NON-duplicate: exactly the leakage this
    // operator exists to catch and MinHash/SimHash/chunk-sha miss.
    "llm_substring_dedup" -> ((s, dir) => {
      TextOps.substringDupStats(boilerplatedDocs(s, dir), "doc_id", "aug", spanTokens = 10)
        .orderBy("doc_id")
    }),

    // ---- suffix-array longest repeats (Lee et al. 2022, ExactSubstr) -----
    // The true suffix-array form of substring dedup: prefix-doubling
    // ranks (O(log maxDocLen) shuffle rounds over (doc, pos, rank) rows,
    // suffixes never materialized), SA adjacency, LCP by binary descent
    // over the stored rank tables, left-maximal filter, top-k by LCP.
    // Unlike the fixed-window family above, no span length is chosen
    // before the scan — this answers "what ARE the longest repeats",
    // which is how Lee et al. pick what to excise. Runs on the
    // boilerplated corpus so the planted 18-word notice dominates the
    // top pairs; natural corpus repeats fill the rest. The oracle
    // materializes and sorts the O(n·len) suffix lists — viable only at
    // test scale, which is exactly the point of the distributed build.
    "llm_suffix_repeats" -> ((s, dir) => {
      graft.operators.SuffixArray.longestRepeats(
        boilerplatedDocs(s, dir), "doc_id", "aug", topK = 40, minTokens = 5)
    }),

    // ---- SA-driven duplicate-span excision list --------------------------
    // The deliverable of Lee et al.'s ExactSubstr dedup: per-doc maximal
    // spans of ≥10 tokens whose content occurs elsewhere (any doc,
    // including the doc itself). Spark derives spans from SA adjacency
    // (a position is duplicated iff an SA-neighbor suffix shares ≥10
    // tokens); the oracle recomputes them by the independent L-gram
    // method (duplicated-window flags → islands) — two different
    // algorithms required to agree on the rows. Planted boilerplate
    // surfaces as one 18-token span per injected doc.
    "llm_suffix_dup_spans" -> ((s, dir) => {
      graft.operators.SuffixArray.dupSpans(
        boilerplatedDocs(s, dir), "doc_id", "aug", spanTokens = 10)
    }),

    // ---- shared-build SA composite: repeats + excision in ONE pass -------
    // The production shape of the two queries above (X190): the rank
    // tables, SA adjacency and LCP descent are built ONCE (gated at the
    // smaller of the two thresholds — every lcp ≥ 10 pair survives a
    // level-4 gate, so the span half loses nothing), then BOTH
    // deliverables derive from the same materialized pairs frame: the
    // top-40 left-maximal repeats (tagged 'repeat') and the ≥10-token
    // excision spans (tagged 'span'), union'd with a part discriminator.
    // Until r10 this sharing claim lived in a comment; now it is an
    // executed, oracle-checked query — and the bench row prices it at
    // roughly HALF the cost of running the pair separately, which is
    // the number a 100 TB curation run cares about (one corpus-scale
    // build, k deliverables).
    "llm_suffix_shared" -> ((s, dir) => {
      import graft.operators.SuffixArray
      val docs = boilerplatedDocs(s, dir)
      val toks = SuffixArray.tokens(docs, "doc_id", "aug")
      val tables = SuffixArray.rankTables(docs, "doc_id", "aug")
      val pairs = SuffixArray.adjacentLcpFromTables(tables, toks, minTokens = 5)
      val repeats = SuffixArray.leftMaxTopK(pairs, toks, topK = 40, minTokens = 5)
        .select(lit("repeat").as("part"), col("doc_a").as("id_a"), col("pos_a"),
          col("doc_b").as("id_b"), col("pos_b"),
          col("lcp_tokens").as("n_tokens"))
      val spans = SuffixArray.spansFromPairs(pairs, "doc_id", spanTokens = 10)
        .select(lit("span").as("part"), col("doc_id").as("id_a"),
          col("span_start").as("pos_a"), lit(null).cast("long").as("id_b"),
          lit(null).cast("int").as("pos_b"), col("span_tokens").as("n_tokens"))
      val out = repeats.unionByName(spans)
        .orderBy("part", "id_a", "pos_a", "id_b", "pos_b")
        .localCheckpoint(true)
      tables.foreach(t => SuffixArray.freeCheckpoint(t._2))
      SuffixArray.freeCheckpoint(pairs)
      out
    }),

    // ---- incremental ExactSubstr excision (probe-vs-index, X191) ---------
    // The nightly-batch form of llm_suffix_dup_spans: docs split into a
    // persisted BASE corpus (doc_id % 4 != 1) and an arriving BATCH
    // (doc_id % 4 == 1 — includes every 4th boilerplate carrier, so
    // cross base↔batch duplicates exist); the excision list for the
    // UNION is computed by probing K-gram postings (the level-K
    // projection of the SA index — the only slice a fixed-K deliverable
    // needs, see SuffixArray.incrementalDupSpans scaladoc for why
    // any-length repeats still require the rebuild) instead of
    // rebuilding the suffix array. The oracle replays the FULL-REBUILD
    // L-gram algorithm on the union — incremental ≡ full recompute,
    // the X119 equivalence pattern.
    "llm_suffix_incremental" -> ((s, dir) => {
      val d = boilerplatedDocs(s, dir)
      graft.operators.SuffixArray.incrementalDupSpans(
        d.filter(col("doc_id") % 4 =!= 1), d.filter(col("doc_id") % 4 === 1),
        "doc_id", "aug", spanTokens = 10)
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

    // ---- line-level dedup (RefinedWeb/CCNet): drop cross-doc shared lines
    // The pass whole-doc dedup can't do (the docs differ) and offset-bound
    // chunk shas miss (the shared line floats per doc). Corpus text is
    // single-line, so boilerplate header/footer LINES are planted (both
    // engines); duplicate doc bodies also collapse — same rule, no
    // special case. Shuffles carry hashes and positions, never line text.
    "llm_line_dedup" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").withColumn("aug",
        concat(
          when(col("doc_id") % 10 === 0, lit(HeaderLine + "\n")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 15 === 0, lit("\n" + FooterLine)).otherwise(lit(""))))
      TextOps.lineDedup(d, "doc_id", "aug").orderBy("doc_id")
    }),

    // ---- maximal duplicate spans: the excisable form of the above --------
    // Gaps-and-islands merge of consecutive flagged windows into one row
    // per maximal run — per-DOC windows only, so the sort parallelizes
    // by document. Injected docs surface their boilerplate as a single
    // 18-token span; whole-doc duplicates surface as one doc-length run.
    "llm_dup_span_runs" -> ((s, dir) => {
      TextOps.maximalDupSpans(boilerplatedDocs(s, dir), "doc_id", "aug", spanTokens = 10)
        .orderBy("doc_id", "span_start")
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

    // ---- benchmark decontamination: n-gram overlap vs an eval set --------
    // The GPT-3/PaLM decontamination rule: a training doc sharing any
    // long-enough n-gram with a held-out benchmark is contaminated.
    // Benchmark stand-in = every 50th doc; overlap via a distinct-shingle
    // EQUI-join on the 5-gram text (rare key — join fan-out is bounded by
    // real contamination, never corpus × benchmark).
    "llm_decontaminate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      def shingled(d: org.apache.spark.sql.DataFrame, id: String) = d
        .select(col("doc_id").as(id),
          explode(TextOps.wordShingles(col("text"), 5)).as("s"))
        .distinct()
      val corpus = shingled(docs, "doc_id")
      val bench = shingled(docs.filter(col("doc_id") % 50 === 0), "bench_id")
      val overlap = corpus.join(bench, "s")
        .filter(col("doc_id") =!= col("bench_id"))
        .groupBy("doc_id")
        .agg(countDistinct("s").as("n_shared"),
          countDistinct("bench_id").as("n_bench_docs"))
      docs.select("doc_id").join(overlap, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          coalesce(col("n_bench_docs"), lit(0L)).as("n_bench_docs"))
        .withColumn("contaminated", col("n_shared") > 0)
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

    // ---- SimHash near-dup pairs: pigeonhole chunk blocking ---------------
    // Hamming <= 3 over 4 chunks of 15 bits: a qualifying pair must agree
    // exactly on >=1 chunk, so candidates come from an equi-join on
    // (chunk index, chunk value) — never an all-pairs scan.
    "llm_simhash_near_dup" -> ((s, dir) => {
      TextOps.simHashNearDup(Tables(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, chunks = 4)
        .orderBy("doc_a", "doc_b")
    }),

    // ---- SimHash near-dup via COMBINATORIAL blocking (Manku WWW'07) -------
    // Same pair semantics as llm_simhash_near_dup through the
    // web-scale blocking: buckets keyed on 3-of-6 chunk subsets (30-bit
    // keys, 20 tables) instead of single 15-bit chunks, so random
    // collisions stay ~n²/2^30 instead of n²/2^15 — the configuration
    // that holds past ~10⁵ docs (NearDupScaleBench records the
    // single-chunk cliff). The oracle here is BRUTE-FORCE all-pairs
    // Hamming — losslessness of the subset blocking proven against
    // ground truth cross-engine, not against another blocking scheme.
    "llm_simhash_blocked" -> ((s, dir) => {
      TextOps.simHashNearDupBlocked(Tables(s, dir, "documents"),
        "doc_id", "text", maxHamming = 3, chunks = 6)
        .orderBy("doc_a", "doc_b")
    }),

    // ---- fuzzy entity resolution: dirty feed vs master (PassJoin) --------
    // Record linkage under single-character typos: a dirty feed derived
    // deterministically from part names (one deletion / exact copy /
    // two-char substitution per id class) resolves back to the master
    // catalog through the two-segment pigeonhole equi-join
    // (EntityResolution.editDistance1Join) + threshold-levenshtein
    // confirm + min_by best-match. The oracle is BRUTE-FORCE all-pairs
    // levenshtein — the blocking is proven lossless against ground
    // truth, not against another blocking. LEFT semantics: the
    // distance-2 class resolves to null (no match within threshold).
    "llm_fuzzy_join" -> ((s, dir) => {
      val master = Tables(s, dir, "part").select("p_partkey", "p_name")
      val delPos = // deletion point ≥ 6, derived from the id — engine-portable
        "CAST(p_partkey % greatest(length(p_name) - 6, 1) AS INT)"
      val dirty = master.filter(col("p_partkey") % 5 <= 2).select(
        col("p_partkey").as("dirty_id"),
        when(col("p_partkey") % 5 === 0,
          expr(s"""concat(substring(p_name, 1, 5 + $delPos),
                   substring(p_name, 7 + $delPos, length(p_name)))"""))
          .when(col("p_partkey") % 5 === 1, col("p_name"))
          .otherwise(concat(
            expr("substring(p_name, 1, length(p_name) - 2)"), lit("00")))
          .as("dirty_name"))
      val pairs = graft.operators.EntityResolution.editDistance1Join(
        master, dirty, "p_partkey", "p_name", "dirty_id", "dirty_name")
      graft.operators.EntityResolution
        .resolveBest(pairs, dirty, "dirty_id", "p_partkey")
        .select(col("dirty_id"), col("p_partkey").as("master_id"),
          col("dist"))
        .orderBy("dirty_id")
    }),

    // ---- full-corpus dedup decision table --------------------------------
    // The end-to-end deliverable: one row PER CORPUS DOC with its exact
    // keep-first keeper (content sha), its near-dup cluster
    // representative (SimHash pairs -> alternating large/small-star CC —
    // exact copies share all chunks, so they land in their keeper's
    // cluster automatically), and the final keep flag (doc == its
    // cluster rep). Exercises the O(log n) star CC under an oracle;
    // llm_dup_groups covers the propagation variant.
    "llm_dedup_corpus" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("_h"))
      val pairs = TextOps.simHashNearDup(Tables(s, dir, "documents"),
        "doc_id", "text", maxHamming = 3, chunks = 4)
      val labels = graft.operators.ConnectedComponents
        .alternatingStars(pairs, "doc_a", "doc_b")
        .withColumnRenamed("node", "doc_id")
      val keeper = docs.groupBy("_h").agg(min("doc_id").as("exact_keeper"))
      docs.join(keeper, "_h")
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), col("exact_keeper"),
          coalesce(col("label"), col("doc_id")).as("group_rep"))
        .withColumn("keep", col("group_rep") === col("doc_id"))
        .orderBy("doc_id")
    }),

    // ---- leakage-safe train/val/test split (group-aware) -----------------
    // The plain md5 split (llm_train_split) leaks at evaluation time:
    // near-duplicate docs hash independently, so the val/test sets
    // contain paraphrases of training docs and eval scores inflate. Split
    // on the DUP-GROUP key instead: group_rep from the same SimHash+CC
    // machinery as llm_dedup_corpus (exact copies share a simhash, so
    // they fold into the same component), then one md5 bucket per GROUP —
    // every member inherits its group's split by construction, which the
    // spec pins as "no group straddles splits". Membership stays a pure
    // function of (salt, corpus content); the corpus-scale cost is the
    // dedup pass itself, which a pipeline runs anyway — the split adds
    // one |docs|-row projection.
    "llm_leakage_split" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"))
      val pairs = TextOps.simHashNearDup(Tables(s, dir, "documents"),
        "doc_id", "text", maxHamming = 3, chunks = 4)
      val labels = graft.operators.ConnectedComponents
        .alternatingStars(pairs, "doc_a", "doc_b")
        .withColumnRenamed("node", "doc_id")
      docs.join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("group_rep"))
        .withColumn("bucket", expr("cast(conv(substring(md5(concat('lsplit|', " +
          "cast(group_rep as string))), 1, 4), 16, 10) as int) % 100"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .select("doc_id", "group_rep", "bucket", "split")
        .orderBy("doc_id")
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

    // ---- near-dup clustering: pairs -> duplicate groups ------------------
    // Min-label propagation (one equi-join + one partial-combine agg per
    // round, O(cluster diameter) rounds) turns the pair list into groups
    // a pipeline can act on — keep min-id doc per group, drop the rest.
    "llm_dup_groups" -> ((s, dir) => {
      val pairs = TextOps.simHashNearDup(Tables(s, dir, "documents"),
        "doc_id", "text", maxHamming = 3, chunks = 4)
      graft.operators.ConnectedComponents.dupGroups(pairs, "doc_a", "doc_b")
        .orderBy("doc_id")
    }),

    // ---- duplicate-group representative by QUALITY -----------------------
    // Production keep-policy: within each near-dup cluster keep the
    // BEST-quality copy (ties to the lowest id), not the arbitrary
    // lowest id — the last step between dup detection and corpus
    // emission. Representative = one min_by argmin per group (map-side
    // combine), never a per-group sort.
    "llm_dup_rep_quality" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = TextOps.simHashNearDup(docs, "doc_id", "text",
        maxHamming = 3, chunks = 4)
      val groups = graft.operators.ConnectedComponents
        .dupGroups(pairs, "doc_a", "doc_b").select("doc_id", "group_id")
      val g = docs
        .select(col("doc_id"),
          TextOps.qualityScore(TextOps.words(col("text")), stopwords).as("quality"))
        .join(groups, Seq("doc_id"), "left")
        .withColumn("group_id", coalesce(col("group_id"), col("doc_id")))
      val reps = g.groupBy("group_id")
        .agg(min_by(col("doc_id"),
          struct((col("quality") * -1).as("_nq"), col("doc_id"))).as("_rep"))
      g.join(reps, "group_id")
        .select(col("doc_id"), col("group_id"), col("quality"),
          (col("doc_id") === col("_rep")).as("keep"))
        .orderBy("doc_id")
    }),

    // ---- exact top-k cosine (quantized) over a broadcast query set -------
    // Baseline form: |queries| × |corpus| with the query side broadcast.
    // The corpus×corpus all-pairs form is rejected — at scale use
    // llm_ann_lsh (bucket equi-join) instead.
    "llm_topk_similarity" -> ((s, dir) => {
      val base = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      val qs = base.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
      VectorOps.topK(base, qs, "vec_id", "qv", k = 5, dot = VectorOps.dotFn(s))
        .orderBy("query_id", "rank")
    }),

    // ---- exact top-k via the bounded-heap aggregate ----------------------
    // Same rows as llm_topk_similarity (the oracle is literally the same
    // SQL) from a different physical plan: the custom topk_by_long
    // TypedImperativeAggregate partial-merges k-bounded heaps map-side,
    // so the exchange carries <= k pairs per (query, partition) and no
    // per-group sort runs — vs the window form's full shuffle + sort of
    // every candidate row.
    "llm_topk_heap" -> ((s, dir) => {
      val base = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      val qs = base.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
      VectorOps.topKHeap(base, qs, "vec_id", "qv", k = 5, dot = VectorOps.dotFn(s))
        .orderBy("query_id", "rank")
    }),

    // ---- ANN top-k via sign-LSH bucket equi-join (the scale path) --------
    "llm_ann_lsh" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          VectorOps.quantize(col("embedding")).as("qv"))
      val qs = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
      VectorOps.annLsh(emb, qs, "vec_id", "qv", "embedding", k = 5, bits = 6,
        dot = VectorOps.dotFn(s))
        .orderBy("query_id", "rank")
    }),

    // ---- multi-probe ANN: own + Hamming-1 neighbor buckets ---------------
    "llm_ann_multiprobe" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          VectorOps.quantize(col("embedding")).as("qv"))
      val qs = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
      VectorOps.annLshMultiProbe(emb, qs, "vec_id", "qv", "embedding",
        k = 5, bits = 6, dot = VectorOps.dotFn(s))
        .orderBy("query_id", "rank")
    }),

    // ---- per-label centroids: the k-means centroid-update step -----------
    // Element-wise mean of each label's quantized vectors (posexplode ->
    // two partial-combine aggregations). The centroid ships as a CSV
    // string: array columns render differently across pandas/duckdb
    // readers, strings never do.
    "llm_label_centroids" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("label"), VectorOps.quantize(col("embedding")).as("qv"))
      VectorOps.centroidSums(emb, "label", "qv")
        .withColumn("centroid_csv", concat_ws(",",
          transform(col("vec_sum"),
            x => floor(x.cast("double") / col("n")).cast("long"))))
        .select(col("label"), col("n"), col("centroid_csv"))
        .orderBy("label")
    }),

    // ---- distributed k-means: 8 clusters, 3 Lloyd iterations -------------
    // Deterministic integer k-means (init = lowest-id vectors, argmin
    // bit-packed, floor-division centroids); the oracle replays the
    // identical iterations in SQL, so assignment AND distance must match
    // exactly after 3 rounds.
    "llm_kmeans" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      VectorOps.kMeans(emb, "vec_id", "qv", k = 8, iters = 3,
        dot = VectorOps.dotFn(s))
        .orderBy("vec_id")
    }),

    // ---- greedy k-center coreset: diversity-driven selection --------------
    // Farthest-point traversal (Gonzalez 1985) over the quantized
    // embeddings: the 12-row selection log whose dist_q column is the
    // non-increasing greedy radius sequence — the diversity complement
    // to llm_prototypicality's density ranking. The oracle replays all
    // 12 rounds unrolled (argmax ties to lowest id in both engines).
    "llm_coreset" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      VectorOps.kCenterGreedy(emb, "vec_id", "qv", k = 12,
        dot = VectorOps.dotFn(s))
        .orderBy("sel_idx")
    }),

    // ---- semantic dedup: cluster, then drop within-cluster near-copies ---
    // The SemDeDup shape (Abbas et al. 2023): k-means partitions the
    // corpus so the expensive pairwise cosine check runs WITHIN clusters
    // only — Σ|cluster|² work instead of |corpus|². k GROWS with the
    // corpus (kForCorpus: one 1-row scalar count, then k ≈ n/64) so
    // expected cluster size stays bounded and the pairing stays
    // ~linear — a fixed k would leave it quadratic at 100×. The later
    // (higher-id) member of each high-dot pair is flagged; `keep` is the
    // deduplicated corpus.
    "llm_semantic_dedup" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      val k = VectorOps.kForCorpus(emb.count(), SemanticClusterTarget)
      VectorOps.semanticDupFlags(emb, "vec_id", "qv", k, iters = 3,
        minDotQ = SemanticDupMinDotQ, dot = VectorOps.dotFn(s))
        .orderBy("vec_id")
    }),

    // ---- joint text+embedding curation (cross-modal capstone) ------------
    // The full curation decision in ONE pass over BOTH modalities:
    // text-side quality score ⋈ embedding-side semantic-dup flag
    // (k-means clusters + in-cluster cosine) ⋈ deterministic hash split.
    // keep = quality ≥ 0.3 AND not a semantic dup. One equi-join per
    // modality on the shared id — the shape a production curation job
    // actually runs.
    "llm_joint_curation" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("_w"))
      val scored = d.select(col("doc_id"),
        TextOps.qualityScore(col("_w"), stopwords).as("quality"))
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      val k = VectorOps.kForCorpus(emb.count(), SemanticClusterTarget)
      val flags = VectorOps.semanticDupFlags(emb, "vec_id", "qv", k, iters = 3,
        minDotQ = SemanticDupMinDotQ, dot = VectorOps.dotFn(s))
      scored
        .join(flags.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .select(col("doc_id"), col("quality"), col("centroid_id"), col("semantic_dup"))
        .withColumn("keep", col("quality") >= 0.3 && !col("semantic_dup"))
        .withColumn("split",
          when(TextOps.hashBucket(col("doc_id"), "split") < 80, "train")
            .when(TextOps.hashBucket(col("doc_id"), "split") < 90, "val")
            .otherwise("test"))
        .orderBy("doc_id")
    }),

    // ---- IVF (inverted-file) ANN: centroid lists + nProbe search ---------
    // The centroid-partitioned alternative to sign-LSH: corpus assigned to
    // nearest centroid (broadcast join + min_by argmax), queries probe
    // their 4 nearest of 25 deterministic centroids (vec_id % 20 == 0),
    // candidates come from an equi-join on centroid_id. Scanned fraction
    // ~ nProbe/nList of the corpus per query.
    "llm_ann_ivf" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      val qs = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
      // the centroid set must be corpus-INDEPENDENT too: an uncapped
      // `% 20` grows the list count linearly, and the corpus×centroid
      // list-build assignment goes n²/20 (the residual 11x after the
      // panel cap alone — r13 sweep). 100 fixed centroids keep the
      // assignment n×100 and each list n/100 — both linear; no-op at
      // <= sf0.1 (all vec_ids < 2000), so the oracle is unchanged.
      val cents = emb.filter(col("vec_id") % 20 === 0
        && col("vec_id") < 2000)
      VectorOps.ivfTopK(emb, qs, cents, "vec_id", "qv", k = 5, nProbe = 4,
        dot = VectorOps.dotFn(s))
        .orderBy("query_id", "rank")
    }),

    // ---- IVF over TRAINED lists: kMeans centroids feed the index --------
    // The production IVF shape (train → build lists → probe), composed
    // from the two primitives that already oracle: kMeansCentroids
    // (2 Lloyd rounds, √n lists — nListForCorpus) trains the coarse
    // quantizer, ivfTopK builds the inverted lists and probes the 4
    // nearest of them per query. Every stage is the broadcast/equi-join
    // shape; the oracle replays the training CTEs and reads the final
    // centroid table.
    "llm_ann_ivf_trained" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      val dot = VectorOps.dotFn(s)
      // √n lists (see nListForCorpus): an n/c list count makes the
      // broadcast coarse quantizer grow linearly with the corpus
      val nList = VectorOps.nListForCorpus(emb.count())
      val cents = VectorOps
        .kMeansCentroids(emb, "vec_id", "qv", k = nList, iters = 2, dot = dot)
        .select(col("cid").as("vec_id"), col("cv").as("qv"))
      val qs = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
      VectorOps.ivfTopK(emb, qs, cents, "vec_id", "qv", k = 5, nProbe = 4, dot = dot)
        .orderBy("query_id", "rank")
    }),

    // ---- product-quantization ANN (train -> encode -> ADC top-k) ---------
    // The compressed-index production shape: 2 subspaces × 16-centroid
    // codebooks trained by the SAME Lloyd loop as clustering, vectors
    // encoded to 2 small codes, queries scored via per-query distance
    // lookup tables (m×ksub rows — model-sized, never corpus-sized) and
    // one combine agg; top-k through the bounded heap aggregate.
    "llm_ann_pq" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      val dot = VectorOps.dotFn(s)
      val (m, subDim, ksub) = (2, 32, 16)
      val cb = VectorOps.pqCodebooks(emb, "vec_id", "qv", m, subDim, ksub,
        iters = 2, dot = dot)
      val codes = VectorOps.pqEncode(emb, "vec_id", "qv", cb, m, subDim, dot = dot)
      val qs = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
      VectorOps.pqTopK(codes, qs, cb, "vec_id", "qv", k = 5, m = m,
        subDim = subDim, dot = dot)
        .orderBy("query_id", "rank")
    }),

    // ---- IVF-PQ: coarse lists + residual PQ codes (IndexIVFPQ shape) -----
    // The full production index: a corpus-derived coarse quantizer
    // partitions vectors into lists, PQ compresses each RESIDUAL to 2
    // codes, queries probe 4 lists and score members via per-(query,
    // list) residual LUTs. Candidate work ~nProbe/nList of the corpus;
    // per-candidate work m lookups — both corpus-size-independent.
    "llm_ann_ivf_pq" -> ((s, dir) => {
      val ix = ivfPqIndex(s, dir)
      VectorOps.ivfPqTopK(ix.codes, ix.qs, ix.coarse, ix.cb, "vec_id", "qv",
        k = 5, nProbe = 4, m = ix.m, subDim = ix.subDim, dot = ix.dot)
        .orderBy("query_id", "rank")
    }),

    // ---- ANN recall evaluation: exact L2 ground truth × IVF-PQ -----------
    // The llm_lsh_recall pattern applied to vectors: which TRUE top-5
    // neighbors (exact squared-L2, brute force over the corpus — the
    // documented ground-truth evaluator, not a serving path) did the
    // compressed index return, at both grains a two-stage system cares
    // about (approx top-5, and membership in the C=20 refine shortlist)?
    // The ground truth EXCLUDES self-matches (queries are corpus
    // vectors; the index side filters self, so the exact side must too
    // — otherwise the query itself is always a structural "miss" and
    // measurable top-5 recall caps at 80%). The measured numbers are
    // LOW on this corpus (4% / 32% at sf0.01, re-recorded after the
    // self-match fix) and that is the finding, not a bug:
    // i.i.d.-random 64-d embeddings
    // are the pathological case for coarse quantization (no cluster
    // structure, PQ residual error ≈ the spread between neighbors) —
    // exactly what this evaluation exists to surface before an index
    // ships, and why llm_ann_refined's exact re-rank stage exists.
    // Index build shared with llm_ann_ivf_pq via ivfPqIndex — one
    // definition, no drift.
    "llm_ann_recall" -> ((s, dir) => {
      val ix = ivfPqIndex(s, dir)
      // Recall is evaluated on a FIXED 64-query panel, md5-sampled from
      // the query set: the exact ground truth below is a deliberate
      // brute-force (panel × corpus), and without the cap it is the one
      // plan in the repo that grows quadratically (|queries| = n/100 ⇒
      // O(n²/100) pairs). A constant panel keeps the evaluator linear in
      // the corpus at any scale while every per-query number stays exact;
      // 64 queries bound the recall estimate's own sampling error at
      // ~±6% (binomial, p≈0.5) — the resolution this eval needs.
      val panel = annPanel(ix.qs)
      val short = VectorOps.ivfPqTopK(ix.codes, panel, ix.coarse, ix.cb,
        "vec_id", "qv", k = 20, nProbe = 4, m = ix.m, subDim = ix.subDim,
        dot = ix.dot)
      val top5 = short.filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id"), lit(true).as("_h5"))
      val short20 = short
        .select(col("query_id"), col("vec_id"), lit(true).as("_h20"))
      val allPairs = panel.select(col("vec_id").as("query_id"))
        .crossJoin(ix.emb.select(col("vec_id")))
        // Queries ARE corpus vectors (vec_id % 100 == 0) and the index
        // side (ivfPqTopK) excludes self-matches, so the exact ground
        // truth must too — otherwise the query itself sits at rank 1 /
        // distance 0 and is structurally always a "miss", capping
        // measurable top-5 recall at 80% and shifting true neighbors'
        // ranks.
        .filter(col("query_id") =!= col("vec_id"))
      val exact = VectorOps.refineTopK(allPairs, ix.emb, panel,
        "vec_id", "qv", k = 5, dot = ix.dot)
      exact
        .join(top5, Seq("query_id", "vec_id"), "left")
        .join(short20, Seq("query_id", "vec_id"), "left")
        .select(col("query_id"), col("rank"), col("vec_id"), col("dist_q"),
          coalesce(col("_h5"), lit(false)).as("in_approx_top5"),
          coalesce(col("_h20"), lit(false)).as("in_shortlist20"))
        .orderBy("query_id", "rank")
    }),

    // ---- partitioned graph ANN: Vamana/HNSW-family shard index (X286) ----
    // The deployed graph-serving shape next to IVF-PQ: per-shard
    // degree-bounded proximity graph (LSH-bucketed candidate equi-join)
    // + md5-ring long-range links (deterministic Vamana random-init;
    // the ring is a Hamiltonian cycle, so reachability is guaranteed),
    // searched by 4 hops of expand-score-prune beam search from each
    // shard's entry. Graded on the SAME md5 panel and exact ground
    // truth as llm_ann_recall, so the two index families' recalls are
    // directly comparable (graph scores exact full-precision integer
    // distances — no PQ compression loss at the shortlist stage).
    "llm_ann_graph" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
        .localCheckpoint(true) // feeds edges, entries, scoring, truth
      val dot = VectorOps.dotFn(s)
      val panel = annPanel(emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000))
      val edges = VectorOps.graphAnnEdges(emb, "vec_id", "qv",
        shards = 4, bits = 4, degree = 6, ringLinks = 2, dot = dot)
        .localCheckpoint(true) // re-joined once per hop
      val g = VectorOps.graphAnnSearch(edges, emb, panel, "vec_id", "qv",
        k = 5, beam = 8, hops = 4, shards = 4, dot = dot)
      val top5 = g.filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id"), lit(true).as("_g5"))
      val beamAll = g
        .select(col("query_id"), col("vec_id"), lit(true).as("_gb"))
      val allPairs = panel.select(col("vec_id").as("query_id"))
        .crossJoin(emb.select(col("vec_id")))
        .filter(col("query_id") =!= col("vec_id"))
      VectorOps.refineTopK(allPairs, emb, panel, "vec_id", "qv", k = 5,
          dot = dot)
        .join(top5, Seq("query_id", "vec_id"), "left")
        .join(beamAll, Seq("query_id", "vec_id"), "left")
        .select(col("query_id"), col("rank"), col("vec_id"), col("dist_q"),
          coalesce(col("_g5"), lit(false)).as("in_graph_top5"),
          coalesce(col("_gb"), lit(false)).as("in_beam"))
        .orderBy("query_id", "rank")
    }),

    // ---- Rocchio pseudo-relevance feedback (X303) ------------------------
    // The classic IR feedback loop (Rocchio 1971) the retrieval stack
    // lacked: round-0 retrieves top-5 by exact integer dot, the query
    // moves toward its pseudo-relevant centroid (q' = 5q + 2*sum of
    // the 5 neighbors — dot RANKING is scale-invariant, so the
    // integer-only update needs no normalizing division), round-1
    // re-retrieves with q'. Graded by LABEL precision@10 — neighbors
    // pull the query toward its class centroid, so the uplift column
    // is the operator's own effectiveness readout. Panel-bounded
    // brute-force scoring (the ann_recall precedent).
    "llm_retrieval_feedback" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"),
          col("label"))
        .localCheckpoint(true)
      val panel = annPanel(emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000))
        .localCheckpoint(true)
      VectorOps.rocchioFeedback(emb, panel, "qv", k0 = 5, kEval = 10,
        alpha = 5L, beta = 2L, dot = VectorOps.dotFn(s))
    }),

    // ---- MMR diversity rerank (X319) ---------------------------------------
    // Serving-time dedup for retrieval (Carbonell–Goldstein SIGIR'98):
    // top-16 shortlist by exact dot, then 5 greedy picks maximizing
    // 7·rel − 3·maxsim-to-selected — a redundant corpus stops
    // returning five near-copies of the best hit. Exact integers, ties
    // to the smaller id; panel × shortlist × rounds work, never
    // corpus².
    "llm_mmr_rerank" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
        .localCheckpoint(true)
      val panel = annPanel(emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000))
      VectorOps.mmrRerank(emb, panel, "vec_id", "qv",
        shortK = 16, outK = 5, lambdaNum = 7L, lambdaDen = 10L,
        dot = VectorOps.dotFn(s))
    }),

    // ---- dimension-truncation retrieval ablation (X292) ------------------
    // The Matryoshka/MRL serving question (Kusupati et al. NeurIPS'22):
    // how much top-5 recall survives if serving ranks by only the
    // first d of 64 dims (prefix truncation — the memory/latency lever
    // an embedding service actually pulls). Exact brute-force top-5
    // under each truncated metric vs the full-dim truth on the shared
    // md5 panel; d = 64 must read recall 10⁶ exactly (built-in sanity).
    "llm_ann_dim_ablation" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
        .localCheckpoint(true)
      val dot = VectorOps.dotFn(s)
      val panel = annPanel(emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000))
        .localCheckpoint(true)
      val allPairs = panel.select(col("vec_id").as("query_id"))
        .crossJoin(emb.select(col("vec_id")))
        .filter(col("query_id") =!= col("vec_id"))
        .localCheckpoint(true) // shared by all four truncations
      def top5(d: Int) = {
        val embD = emb.select(col("vec_id"), slice(col("qv"), 1, d).as("qv"))
        val panD = panel.select(col("vec_id"), slice(col("qv"), 1, d).as("qv"))
        VectorOps.refineTopK(allPairs, embD, panD, "vec_id", "qv", k = 5,
          dot = dot).select("query_id", "vec_id")
      }
      val full = top5(64).withColumn("_hit", lit(true))
        .localCheckpoint(true) // joined against every truncation
      Seq(8, 16, 32, 64).map { d =>
        top5(d)
          .join(full, Seq("query_id", "vec_id"), "left")
          .agg(count(lit(1)).as("n_retrieved"),
            sum(when(col("_hit"), 1L).otherwise(0L)).as("n_hits"))
          .withColumn("dim", lit(d))
      }.reduce(_.unionByName(_))
        .select(col("dim"), col("n_retrieved"), col("n_hits"),
          expr("(n_hits * 1000000) div n_retrieved").as("recall_micro"))
        .orderBy("dim")
    }),

    // ---- graph-ANN insertion: DiskANN-style index maintenance (X301) -----
    // The graph index's probe-vs-index lifecycle step next to the IVF
    // and suffix-array incremental forms: each NEW vector (the held-out
    // tenth) beam-searches the BASE graph and its top-6 beam results
    // become its out-edges — per-insert cost is the beam search, which
    // GraphAnnScaleBench measured flat in corpus size (the DiskANN
    // insert argument; the back-edge RobustPrune pass is the documented
    // omission — degree bounds are re-established by periodic rebuild,
    // this emits the forward adjacency a real insert writes first).
    "llm_ann_graph_insert" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
        .localCheckpoint(true)
      val dot = VectorOps.dotFn(s)
      val base = emb.filter(col("vec_id") % 10 =!= 7)
      val batch = emb.filter(col("vec_id") % 10 === 7)
      val edges = VectorOps.graphAnnEdges(base, "vec_id", "qv",
        shards = 4, bits = 4, degree = 6, ringLinks = 2, dot = dot)
        .localCheckpoint(true)
      VectorOps.graphAnnSearch(edges, base, batch, "vec_id", "qv",
          k = 6, beam = 8, hops = 4, shards = 4, dot = dot)
        .filter(col("rank") <= 6)
        .select(col("query_id").as("vec_id"), col("rank"),
          col("vec_id").as("neighbor"), col("dist_q"))
        .orderBy("vec_id", "rank")
    }),

    // ---- IVF-PQ shortlist + exact refine (IndexRefineFlat serving shape) -
    // The deployed two-stage ANN pattern: the compressed index answers a
    // C >> k shortlist (cheap, approximate), then EXACT distances on the
    // full-precision vectors re-rank it. The corpus is touched only by
    // the shortlist's id equi-join (C vectors per query); the query
    // batch broadcasts; final top-k through the bounded heap aggregate.
    "llm_ann_refined" -> ((s, dir) => {
      val ix = ivfPqIndex(s, dir)
      val short = VectorOps.ivfPqTopK(ix.codes, ix.qs, ix.coarse, ix.cb,
        "vec_id", "qv", k = 20, nProbe = 4, m = ix.m, subDim = ix.subDim,
        dot = ix.dot)
      VectorOps.refineTopK(short, ix.emb, ix.qs, "vec_id", "qv", k = 5,
        dot = ix.dot)
        .orderBy("query_id", "rank")
    }),

    // ---- cross-encoder-style rerank over the refine shortlist ------------
    // The third stage of a deployed retrieval stack (bi-encoder ANN →
    // exact refine → cross-encoder rerank): the C=20 shortlist joins its
    // full-precision vectors, a model-sized weight vector broadcasts as a
    // plan literal, and the interaction score s(q,d) = w·(q⊙d) re-ranks
    // per query. Corpus cost is the shortlist equi-join only (C rows per
    // query); the "model" here is md5-derived so both engines rebuild it
    // (a trained checkpoint would load the same shape). All-integer
    // scores: |w·(q⊙d)| ≤ 64·10⁹ — exact in both engines.
    "llm_rerank_cross" -> ((s, dir) => {
      val ix = ivfPqIndex(s, dir)
      val short = VectorOps.ivfPqTopK(ix.codes, ix.qs, ix.coarse, ix.cb,
        "vec_id", "qv", k = 20, nProbe = 4, m = ix.m, subDim = ix.subDim,
        dot = ix.dot)
      val w = array(CeWeights.map(lit): _*)
      val cand = short.select(col("query_id"), col("vec_id"))
        .join(ix.emb.select(col("vec_id"), col("qv").as("_dv")), "vec_id")
        .join(broadcast(ix.qs.select(col("vec_id").as("query_id"),
          col("qv").as("_qv"))), "query_id")
        .withColumn("ce_score", ix.dot(col("_qv"), zip_with(col("_dv"), w,
          (d, wj) => d * wj)))
      cand.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("ce_score").desc, col("vec_id"))))
        .filter(col("rank") <= 5)
        .select("query_id", "rank", "vec_id", "ce_score")
        .orderBy("query_id", "rank")
    }),

    // ---- retrieval quality metrics: MRR / nDCG@5 / recall on the panel ---
    // The evaluation table a retrieval stack ships with: per panel query,
    // reciprocal rank of the TRUE nearest neighbor in the approx ranking,
    // binary-relevance nDCG@5 against the exact top-5, and recall@5/@20.
    // Reuses the llm_ann_recall machinery (same md5 panel, same exact
    // ground truth, same shortlist), so the numbers grade the identical
    // system. Doubles appear only in final per-query ratios (identical
    // operands both engines; round6 absorbs log2 ulp differences).
    "llm_retrieval_metrics" -> ((s, dir) => {
      val ix = ivfPqIndex(s, dir)
      val panel = annPanel(ix.qs)
      val short = VectorOps.ivfPqTopK(ix.codes, panel, ix.coarse, ix.cb,
        "vec_id", "qv", k = 20, nProbe = 4, m = ix.m, subDim = ix.subDim,
        dot = ix.dot)
        .select(col("query_id"), col("vec_id"), col("rank").as("arank"))
      val allPairs = panel.select(col("vec_id").as("query_id"))
        .crossJoin(ix.emb.select(col("vec_id")))
        .filter(col("query_id") =!= col("vec_id"))
      val gt = VectorOps.refineTopK(allPairs, ix.emb, panel,
        "vec_id", "qv", k = 5, dot = ix.dot)
        .select(col("query_id"), col("vec_id"), col("rank").as("grank"))
      val idcg = (1 to 5).map(i => 1.0 / (math.log(i + 1) / math.log(2))).sum
      val joined = gt.join(short, Seq("query_id", "vec_id"), "left")
      joined.groupBy("query_id")
        .agg(
          // rr: the true rank-1 neighbor's position in the approx list
          max(when(col("grank") === 1 && col("arank").isNotNull,
            col("arank"))).as("_r1pos"),
          sum(when(col("arank") <= 5, 1L).otherwise(0L)).as("_hit5"),
          sum(when(col("arank") <= 20, 1L).otherwise(0L)).as("_hit20"),
          sum(when(col("arank") <= 5,
              lit(1.0) / log2(col("arank") + 1)).otherwise(lit(0.0)))
            .as("_dcg"))
        .select(col("query_id"),
          TextOps.round6(coalesce(lit(1.0) / col("_r1pos"), lit(0.0)))
            .as("mrr"),
          TextOps.round6(col("_hit5") / lit(5.0)).as("recall5"),
          TextOps.round6(col("_hit20") / lit(5.0)).as("recall20"),
          TextOps.round6(col("_dcg") / lit(idcg)).as("ndcg5"))
        .orderBy("query_id")
    }),

    // ---- embedding-cosine near-dup pairs within LSH buckets --------------
    // Sign-LSH equi-join with Hamming-1 multi-probe. bits = 12 ≈
    // bitsForCorpus(|sf0.01 corpus|) + 1: bucket count GROWS with corpus
    // size so bucket-local pairing stays sub-quadratic (fixed bits is
    // O(n²/2^bits) — still quadratic — and was rejected); the recall a
    // finer partition loses comes back via the neighbor-bucket probes.
    // Quantized dot >= 300000 ~ cosine >= 0.3 on these unit-norm vectors.
    "llm_embed_near_dup" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          VectorOps.quantize(col("embedding")).as("qv"))
      VectorOps.cosineNearDup(emb, "vec_id", "qv", "embedding",
        bits = 12, minDotQ = 300000L, dot = VectorOps.dotFn(s))
        .orderBy("id_a", "id_b")
    }),

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

    // ---- multimodal near-dup: REAL decode -> pixel phash + Hamming join --
    // Image-dedup over the REAL codec (r12 verdict #3): per-document
    // genuine BMPs (the one ImageIO format whose pixels are
    // byte-addressable in the container, so the oracle can replay the
    // hash from the DECODED pixel bytes), block-mean perceptual hash
    // over the decoded pixels, then the SAME pigeonhole chunk-blocked
    // Hamming join the text SimHash path uses — one generic machinery,
    // two modalities. The byte-level hash survives only as the
    // corrupt-blob degradation path inside imagePixelPHash.
    "llm_multimodal_near_dup" -> ((s, dir) => {
      // every 10th doc gets a planted NEAR-COPY (one mid pixel bit
      // flipped, id = -doc_id - 1: real doc_ids are non-negative at
      // every sf, so the injected ids can NEVER collide with a genuine
      // document — an additive offset would, once the corpus outgrows
      // it) — the corpus has no natural pixel near-dups, and an empty
      // result would verify nothing (the vacuous-green trap)
      val base = s"/tmp/graft_mm_bmp/${SalesFixture.sfName(dir)}"
      val docs = Tables(s, dir, "documents").select(col("doc_id"))
      val ids = docs.unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((-col("doc_id") - 1L).as("doc_id")))
      Multimodal.bmpCorpus(s, ids, "doc_id")
        .write.mode("overwrite").parquet(base)
      val hashed = Multimodal.imagePixelPHash(s, s.read.parquet(base),
        "doc_id")
      // hotBucketCap: 8-bit pixel-hash chunks have only 256 values, so
      // at 10x data the UNCAPPED bucket join grows ~n²/256 (the r13
      // sweep measured 18.4x) — the cap bounds it to O(n·cap) with
      // detection-vs-representative preserved. 64, not 512: sf1's
      // AVERAGE bucket is ~215, so a 512 cap never engages and the
      // quadratic survives (re-measured 11.3x); 64 engages on the
      // saturated buckets while staying a no-op at sf0.01, where 551
      // pseudo-random hashes spread ~2 per bucket (max ~a dozen)
      TextOps.hammingNearDupPairs(hashed, "doc_id", "phash",
        maxHamming = 6, chunks = 8, bits = 64, hotBucketCap = 64)
        .orderBy("doc_a", "doc_b")
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

    // ---- entity canonicalization (fuzzy pairs -> CC -> canonical) --------
    // The full ER pipeline composed from proven parts: distinct part
    // names pair via the PassJoin edit-distance join (X133), clusters
    // form via alternating-star CC (X51), and each name maps to its
    // cluster's lexicographic-min canonical form ("cold ring" and
    // "old ring" unify). Oracle: brute-force levenshtein pairs + the
    // recursive-CTE CC (the llm_dedup_corpus pattern) — both STAGES of
    // the composition are ground-truth-checked end to end.
    "llm_entity_canonical" -> ((s, dir) => {
      val names = Tables(s, dir, "part")
        .groupBy("p_name").agg(count(lit(1)).as("n_rows"))
      val ma = names.select(col("p_name").as("name_b"),
        col("p_name").as("nm_b"))
      val pr = names.select(col("p_name").as("name_a"),
        col("p_name").as("nm_a"))
      val edges = graft.operators.EntityResolution
        .editDistance1Join(ma, pr, "name_b", "nm_b", "name_a", "nm_a")
        .filter(col("dist") === 1 && col("name_a") < col("name_b"))
      val labels = graft.operators.ConnectedComponents
        .alternatingStars(edges, "name_a", "name_b")
      names.join(labels, names("p_name") === labels("node"), "left")
        .select(col("p_name"),
          coalesce(col("label"), col("p_name")).as("canonical"),
          col("n_rows"))
        .orderBy("p_name")
    }),

    // ---- asymmetric containment join (quote/superset dedup) --------------
    // C(A→B) = |A∩B|/|A| over word-3-shingle sets: finds planted quote
    // pages (every 40th doc = 60% prefix of its neighbor) inside their
    // source docs — the near-superset duplication symmetric Jaccard
    // misses. Prefix filter on the contained side only; threshold and
    // prefix math in exact integer micro-units (no float boundaries).
    "llm_containment_join" -> ((s, dir) => {
      TextOps.containmentJoin(quotedDocs(s, dir), "doc_id", "aug",
          shingleN = 3, thresholdMicro = 800000L)
        .orderBy("doc_a", "doc_b")
    }),

    // ---- prototypicality pruning (Sorscher et al. 2022) ------------------
    // Squared distance to the label's floored-integer centroid, exact
    // integers end to end; bottom decile per label flagged for pruning
    // (the big-data regime drops the most redundant, centroid-nearest
    // examples). Centroid table is |labels|x dims; no window anywhere.
    "llm_prototypicality" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          VectorOps.quantize(col("embedding")).as("qv"))
      VectorOps.prototypicality(emb, "vec_id", "qv", "label",
          pruneFrac = 0.1)
        .orderBy("vec_id")
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

    // ---- weighted MinHash near-dup (tf-aware banding + exact Jw) ---------
    // The tf-aware variant of llm_near_dup's set MinHash: capped-tf
    // virtual elements, per-doc bottom-16 signature via ONE custom
    // aggregate, candidates from 2 bands of 8 equal minima (sharing a
    // single min on a small vocabulary degenerates to all-pairs),
    // k-mins estimate + exact Σmin/Σmax on candidates only.
    "llm_weighted_minhash" -> ((s, dir) => {
      TextOps.weightedMinhashPairs(Tables(s, dir, "documents"), "doc_id",
        "text", cap = 4, k = 16, bandRows = 8, salt = "wmh")
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

    // ---- Zipf rank-frequency fit -----------------------------------------
    // The rank-domain companion to llm_vocab_growth: how frequency
    // MASS distributes over the vocabulary (natural text s ≈ 1; the
    // synthetic soup's near-flat s is the honest readout). One
    // tokenize pass to the vocab table; rank + micro-ln OLS on vocab
    // rows only.
    "llm_zipf_fit" -> ((s, dir) => {
      TextOps.zipfFit(Tables(s, dir, "documents"), "text")
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

    // ---- greedy facility-location selection (X326) ------------------------
    // The third data-selection lens (operators/FacilityLocation
    // .scala): coverage_select maximizes distinct-shingle coverage,
    // the k-center coreset minimizes the worst gap; facility location
    // maximizes Σ_u max_s sim(u, s) — every corpus vector gets a
    // close representative (the CRAIG/coreset-selection objective).
    // Candidate pool = the %23 md5-free deterministic panel (~n/23,
    // model-sized, broadcast); 6 greedy rounds, each one combine agg
    // over the pinned universe×candidates table + a 1-row argmax.
    "llm_facility_select" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      graft.operators.FacilityLocation.greedySelect(
        emb.select(col("vec_id").as("id"), col("qv")),
        emb.filter(col("vec_id") % 23 === 1)
          .select(col("vec_id").as("cid"), col("qv").as("cqv")),
        k = 6)
    }),

    // ---- TextRank keywords: PageRank over word co-occurrence (X262) ------
    // The graph-based companion to RAKE's degree heuristic: window-2
    // co-occurrence edges (original-sequence lead windows; repeated
    // pairs = integer weights under one-row-one-vote), 3 nano-unit
    // PageRank rounds, top-25 total-ordered. Oracle replays the same
    // rounds through the shared pageRankCtes generator.
    "llm_textrank" -> ((s, dir) => {
      TextOps.textrankKeywords(Tables(s, dir, "documents"), "doc_id",
        "text", stopwords, iters = 3, topK = 25)
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

    // ---- personalized PageRank (seed-teleport relevance) -----------------
    // Teleport mass returns to the seed docs (id % 50 == 0) on the same
    // hub-and-spoke link table as llm_graph_rank: rank = damped
    // proximity to the flagged set (how much seed influence reaches
    // each node), the weighted complement of llm_blast_radius' hop
    // closure. Unreachable nodes hold rank 0 exactly.
    "llm_graph_ppr" -> ((s, dir) => {
      val nodes = Tables(s, dir, "documents").select(col("doc_id").as("id"))
      val members = nodes.filter(col("id") % 10 =!= 0)
        .select(col("id").as("src"), (col("id") - (col("id") % 10)).as("dst"))
      val hubs = nodes.filter(col("id") % 10 === 0 && col("id") =!= 0)
      val edges = members
        .union(hubs.select(col("id").as("src"), lit(0L).as("dst")))
        .union(hubs.select(col("id").as("src"), (col("id") + 1).as("dst")))
      val seeds = nodes.filter(col("id") % 50 === 0)
      graft.operators.PageRank.personalized(edges, nodes, seeds, iters = 3)
        .select(col("id").as("doc_id"), col("rank").as("rank_nano"),
          TextOps.round6(col("rank") / 1000000000.0).as("rank"))
        .orderBy("doc_id")
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

    // ---- per-source entropy rate (bigram conditional entropy) ------------
    // H(next|current) per source; the gap to H1 is the mutual
    // information adjacent tokens share — rich-vocabulary-in-rigid-
    // patterns text shows a low rate at high H1.
    "llm_entropy_rate" -> ((s, dir) => {
      TextOps.entropyRate(Tables(s, dir, "documents"), "doc_id",
        "source", "text")
    }),

    // ---- distribution-free median CI (order statistics) ------------------
    // Valid under any tail: ranks (n ∓ 1.96√n)/2 from ONE IEEE sqrt
    // of an exact integer, order statistics by histogram rank walk.
    "p_median_ci" -> ((s, dir) => {
      EventOps.medianCi(events(s, dir), "event_type", "value")
    }),

    // ---- BWT run-count repetitiveness (r/n) from the suffix array --------
    // The bzip2-principle per-doc repetitiveness score where TTR
    // saturates: docs with id%25 = 0 get their text DOUBLED, and
    // their r/n must drop hard. One corpus-wide SA construction
    // serves every doc's BWT; oracle sorts each doc's suffix lists
    // natively.
    "llm_bwt_runs" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 25 === 0, concat(col("text"), lit(" "),
          col("text"))).otherwise(col("text")).as("text"))
      graft.operators.SuffixArray.bwtRunStats(docs, "doc_id", "text")
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

    // ---- Ljung-Box whiteness test on the daily series --------------------
    // "Are days independent": exact integer autocovariances, r_k ppm,
    // Q in micro vs the constant-folded chi-square-7 95th percentile.
    // The honest expected answer on seasonal traffic is REJECT.
    "p_ljung_box" -> ((s, dir) => {
      EventOps.ljungBox(events(s, dir), "ts", maxLag = 7)
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

    // ---- density-based near-dup clustering, DBSCAN in SimHash space (X281)
    // CC dup groups chain through sparse bridges (one borderline pair
    // welds two clusters); DBSCAN only extends clusters through CORE
    // points (>= minPts-1 neighbors within hamming 3), demoting
    // bridges to border/noise. Exact — the pigeonhole candidates are
    // lossless — and every doc gets a (role, cluster) verdict.
    // The corpus' organic near-dups are sparse (degree ≤ 1 at verify
    // scale — everything noise, a vacuous green), so src0 is planted
    // in triplicate (exact copies at doc_id+1e6/+2e6): every src0 doc
    // gets two hamming-0 neighbors and a real core/border/noise split.
    "llm_dbscan_dedup" -> ((s, dir) =>
      graft.operators.HammingDbscan.cluster(
        TextOps.simHash(plantedTriplicate(s, dir), "doc_id", "text"),
        "doc_id", "simhash", maxHamming = 3, minPts = 3)),

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

    // ---- frequent sequential patterns in sessions (X285) -----------------
    // The ORDERED complement of p_assoc_rules' itemsets: consecutive
    // event-type bigrams/trigrams within 30-min session gaps, support
    // in both occurrences and distinct users. Window is user-
    // partitioned (parallel), agg is pattern-vocabulary-bounded.
    "p_seq_patterns" -> ((s, dir) =>
      EventOps.sequencePatterns(events(s, dir), gapMinutes = 30,
        topK = 30)),

    // ---- Fellegi-Sunter probabilistic record linkage (X284) --------------
    // A keyless dirty feed (planted perturbations: OCR'd 'X' name
    // prefix, nation off-by-one, balance drift, segment loss) links
    // back to the customer master through learned log-likelihood
    // field weights — the decision theory behind entity resolution.
    // Blocking on the name's last-3 equi-join (never a cross product);
    // m/u learned from the labeled candidates; scores exact integer
    // ln-pair sums. Output is the self-evaluating candidate table.
    "llm_record_linkage" -> ((s, dir) => {
      val (m, f) = linkageFeed(Tables(s, dir, "customer"))
      val cands = f.withColumn("_blk", substring(col("f_name"), -3, 3))
        .join(m.withColumn("_blk", substring(col("m_name"), -3, 3)),
          "_blk")
        .select(col("f_key"), col("m_key"),
          (col("f_name") === col("m_name")).as("g_name"),
          (col("f_nat") === col("m_nat")).as("g_nat"),
          (col("f_seg") === col("m_seg")).as("g_seg"),
          (floor(col("f_bal") * 100 + 0.5)
            === floor(col("m_bal") * 100 + 0.5)).as("g_bal"),
          (col("f_key") === col("m_key") + 1000000L).as("truth"))
      graft.operators.RecordLinkage.fellegiSunter(cands,
        Seq("g_name", "g_nat", "g_seg", "g_bal"), "truth",
        Seq("f_key", "m_key"))
    }),

    // ---- unsupervised linkage parameter fit by EM (X325) ------------------
    // The extension X284's scaladoc promises: with NO truth column,
    // m/u/p are latent and fixed-round EM over the comparison-PATTERN
    // counts recovers them (Winkler '88; operators/RecordLinkage.scala
    // emFit). Same feed, same blocking, same four comparison fields —
    // but the truth flag is withheld from the algorithm and only the
    // oracle replay checks the arithmetic. One combine agg to ≤16
    // pattern rows, then 5 model-sized EM rounds on the micro grid
    // (NANO product chains, clamped params, floored divisions).
    "llm_linkage_em" -> ((s, dir) => {
      val (m, f) = linkageFeed(Tables(s, dir, "customer"))
      val cands = f.withColumn("_blk", substring(col("f_name"), -3, 3))
        .join(m.withColumn("_blk", substring(col("m_name"), -3, 3)),
          "_blk")
        .select(
          (col("f_name") === col("m_name")).as("g_name"),
          (col("f_nat") === col("m_nat")).as("g_nat"),
          (col("f_seg") === col("m_seg")).as("g_seg"),
          (floor(col("f_bal") * 100 + 0.5)
            === floor(col("m_bal") * 100 + 0.5)).as("g_bal"))
      graft.operators.RecordLinkage.emFit(cands,
        Seq("g_name", "g_nat", "g_seg", "g_bal"), rounds = 5)
    }),

    // ---- sorted-neighborhood blocking audit (X291) -----------------------
    // The OTHER standard blocking next to X284's last-3 equi-join
    // (Hernandez-Stolfo multi-pass SN): sort master+dirty records by a
    // fuzzy key, pair within a 6-rank window; a second pass with a
    // different key covers the first's blind spots (the name-tail key
    // survives the OCR'd prefix; the nation+balance key survives name
    // damage but not the planted nation shift — the union covers
    // both). Output is the blocking-quality table: candidates, cross-
    // source pairs, true matches captured, recall — per pass and for
    // the multi-pass union.
    "llm_sorted_neighborhood" -> ((s, dir) => {
      val (m, f) = linkageFeed(Tables(s, dir, "customer"))
      val recs = m.select(col("m_key").as("id"), col("m_name").as("name"),
          col("m_nat").as("nat"), col("m_bal").as("bal"))
        .unionByName(f.select(col("f_key").as("id"),
          col("f_name").as("name"), col("f_nat").as("nat"),
          col("f_bal").as("bal")))
        .localCheckpoint(true) // two SN passes sort the same table
      def stats(pass: String, pairs: DataFrame) = pairs
        .withColumn("_cross",
          (col("id_a") < lit(1000000L)) =!= (col("id_b") < lit(1000000L)))
        .withColumn("_true",
          abs(col("id_a") - col("id_b")) === lit(1000000L))
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("_cross"), 1L).otherwise(0L)).as("n_cross_pairs"),
          sum(when(col("_true"), 1L).otherwise(0L)).as("n_true_captured"))
        .withColumn("pass", lit(pass))
      val p1 = graft.operators.RecordLinkage.sortedNeighborhoodPairs(
        recs, "id", Seq(reverse(col("name"))), w = 6)
        .localCheckpoint(true) // feeds its own stats AND the union
      val p2 = graft.operators.RecordLinkage.sortedNeighborhoodPairs(
        recs, "id",
        Seq(col("nat"), floor(col("bal") * 100 + 0.5).cast("long")),
        w = 6)
        .localCheckpoint(true)
      val tot = m.agg(count(lit(1)).as("n_true_total"))
      stats("name_tail", p1)
        .unionByName(stats("nation_balance", p2))
        .unionByName(stats("multi_pass", p1.unionByName(p2).distinct()))
        .crossJoin(broadcast(tot))
        .select(col("pass"), col("n_candidates"), col("n_cross_pairs"),
          col("n_true_captured"), col("n_true_total"),
          expr("(n_true_captured * 1000000) div n_true_total")
            .as("recall_micro"))
        .orderBy("pass")
    }),

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

    // ---- MAD robust scale + robust-z outlier census (X275) ---------------
    // The 50%-breakdown scale for the heavy-tail regime where
    // sigma-based rules are circular: median and MAD via histogram
    // rank walks, the 3*1.4826 threshold folded to the integer
    // cross-multiplication |c-med|*10^4 > 44478*MAD — no float
    // boundary anywhere.
    "llm_mad_outliers" -> ((s, dir) => {
      EventOps.madOutliers(events(s, dir), "event_type", "value")
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

    // ---- capture-recapture dedup-coverage QA (X271) ----------------------
    // Two INDEPENDENT near-dup detectors (MinHash-LSH jaccard>=0.5,
    // SimHash hamming<=3) as the two "captures": Chapman's estimator
    // (n1+1)(n2+1)/(m+1) - 1 from their flagged-doc overlap estimates
    // the total dup population — est_missed = estimate minus the
    // union is the coverage gap NEITHER method can see alone.
    "llm_dedup_coverage" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      def flagged(pairs: DataFrame) = pairs
        .select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
      // both capture passes run LOOSE parameters (3-row bands, 15-bit
      // simhash chunks), so their buckets grow superlinearly on a
      // correlated corpus (18.2x at 10x data in the r13 sweep) — the
      // star caps bound both to O(n·cap); no-ops at sf0.01 (500 docs)
      graft.operators.CaptureRecapture.chapman(
        flagged(TextOps.nearDupPairs(docs, "doc_id", "text",
          shingleN = 3, numBands = 4, rowsPerBand = 3, threshold = 0.5,
          repartitionInput = true, hotBandCap = 512)),
        flagged(TextOps.simHashNearDup(docs, "doc_id", "text",
          maxHamming = 3, chunks = 4, hotBucketCap = 512)))
    }),

    // ---- weighted SSSP over the co-order graph (X270) --------------------
    // Min-plus Bellman-Ford from the flagged parts (partkey % 100 ==
    // 0): edge cost = 10^6 div co-order weight, so one strong tie
    // beats several weak hops — the effective-proximity readout
    // llm_blast_radius' hop count can't give. 6 monotone rounds,
    // surplus rounds provably no-ops; exact integer distances.
    "llm_graph_sssp" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
          rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
        .withColumn("cost", expr("1000000L DIV weight"))
      val seeds = Tables(s, dir, "part")
        .filter(col("p_partkey") % 100 === 0)
        .select(col("p_partkey").as("n"))
      graft.operators.Sssp.distances(edges, "item_a", "item_b", "cost",
          seeds, rounds = 6)
        .orderBy("n")
    }),

    // ---- sampled-source betweenness centrality (X294) --------------------
    // The broker/gateway readout the graph family lacked (PageRank
    // ranks endorsement, k-core density; betweenness ranks FLOW):
    // exact Brandes forward-σ/backward-δ per md5-sampled source on
    // the capped co-purchase projection, hop horizon 4 (the bounded-
    // diameter estimator — both truncations are the standard scale
    // knobs; full Brandes is O(nm) and never acceptable at scale).
    "llm_graph_betweenness" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
      val sym = edges.select(col("item_a").as("a"), col("item_b").as("b"))
        .unionByName(
          edges.select(col("item_b").as("a"), col("item_a").as("b")))
      val seeds = Tables(s, dir, "part")
        .filter(col("p_partkey") % 100 === 0)
        .select(col("p_partkey").as("n"))
      graft.operators.Betweenness.approx(sym, "a", "b", seeds,
        levels = 4, topK = 20)
    }),

    // ---- sampled neighborhood function / effective diameter (X307) -------
    // The ANF profile of the co-order graph from the same md5-free
    // deterministic seed panel as X294: per hop, Σ|N(src, r)| over the
    // sampled sources, the hop's fresh pairs, and the ≥90% flag whose
    // first true row is the sampled effective diameter. Exact BFS sets
    // (frontier equi-join + visited anti-join per hop); HyperANF's
    // unioned HLL registers are the documented 100 TB swap-in.
    "llm_graph_anf" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
      val sym = edges.select(col("item_a").as("a"), col("item_b").as("b"))
        .unionByName(
          edges.select(col("item_b").as("a"), col("item_a").as("b")))
      val seeds = Tables(s, dir, "part")
        .filter(col("p_partkey") % 100 === 0)
        .select(col("p_partkey").as("n"))
      graft.operators.NeighborhoodFunction.sample(sym, "a", "b",
        seeds, "n", maxHops = 5)
    }),

    // ---- per-node local clustering coefficient (X308) ---------------------
    // Watts–Strogatz lcc over the co-order graph: the node-level
    // hub-vs-clique audit the triangle LIST doesn't give. Triangle
    // counts ride the degree-ordered O(m^1.5) enumeration; lcc is one
    // exact-integer division through round6, deg < 2 ⇒ 0.
    "llm_graph_clustering" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
      graft.operators.ClusteringCoefficient
        .perNode(edges, "item_a", "item_b")
        .orderBy("node")
    }),

    // ---- Jones-Plassmann conflict-free coloring (X309) --------------------
    // Independent-set scheduling for the co-order graph: color classes
    // can be mutated in parallel with zero coordination (cluster-merge
    // / in-place-update scheduling). Every current local maximum of
    // the keyed-md5 priority colors itself per round with the mex of
    // its colored neighbors — mex computed relationally ({0} ∪ {c+1}
    // anti-join used, combine min), no generate-series fan-out.
    "llm_graph_coloring" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
      // rounds are Θ(clique number): the sf0.001 projection holds a
      // ~24-clique (any independent-set-per-round scheme needs one
      // round per clique member), so 28 covers all SFs with headroom
      graft.operators.GraphColoring
        .jonesPlassmann(edges, "item_a", "item_b", maxRounds = 28)
        .orderBy("node")
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

    // ---- Mann-Whitney U between the A/B arms (nonparametric) -------------
    // Rank-based two-sample test without a corpus sort: midranks from
    // the value histogram (the only window is over distinct cents —
    // bounded by the value DOMAIN), doubled ranks keep U exact,
    // tie-corrected normal z with one IEEE sqrt.
    "llm_ab_mannwhitney" -> ((s, dir) => {
      EventOps.mannWhitney(events(s, dir), "user_id", "value")
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

    // ---- speculative-decoding acceptance proxy (X329) ---------------------
    // The serving readout speculative decoding lives on (Leviathan et
    // al. '23 / Chen et al. '23): how often would the CHEAP draft
    // model's greedy guess match the target? Draft = corpus bigram
    // argmax (per prev word, the most frequent successor, ties to the
    // lexicographically smaller — one combine agg + combine-min, no
    // window over the corpus); acceptance = per-source share of
    // bigram positions where the draft's guess equals the actual next
    // word. Same-corpus fit gives the compressibility UPPER BOUND per
    // source — the mixture-level "how much would speculation save
    // here" number. Doc-initial tokens have no prev and are excluded.
    // The draft table is vocab-sized: plain equi-join on prev (Heaps'
    // law — no forced broadcast; AQE decides), the tfidf discipline.
    "llm_spec_accept" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          posexplode(TextOps.words(col("text"))).as(Seq("pos", "w")))
      val bigrams = toks
        .withColumn("prev",
          lag("w", 1).over(Window.partitionBy("doc_id").orderBy("pos")))
        .filter(col("prev").isNotNull)
        .localCheckpoint(true) // trains the draft AND evaluates it
      val draft = bigrams.groupBy("prev", "w").agg(count(lit(1)).as("c"))
        .groupBy("prev")
        .agg(min(struct((-col("c")).as("nc"), col("w").as("g"))).as("b"))
        .select(col("prev"), col("b.g").as("guess"))
      bigrams.join(draft, "prev")
        .groupBy("source")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("w") === col("guess"), 1L).otherwise(0L))
            .as("n_accepted"))
        .withColumn("accept_micro",
          expr("(n_accepted * 1000000) div n_bigrams"))
        .orderBy("source")
    }),

    // ---- embedding anisotropy audit (X335) ---------------------------------
    // Ethayarajh (2019)'s "how anisotropic is this space": the
    // expected cosine between RANDOM embedding pairs. Near 0 ⇒ cosine
    // similarity carries signal; large ⇒ a common direction dominates
    // and SemDeDup/prototypicality/ANN thresholds are measuring that
    // direction, not content — the audit X200's var_share approaches
    // from the variance side. Pairs are deterministic and scale-safe:
    // md5-bucket each vector (4096 buckets), pair ADJACENT rows within
    // a bucket (bucket-sized windows — never a corpus sort or an
    // all-pairs shape). cos in micro = (dot·10⁶) div (isqrt‖a‖²·
    // isqrt‖b‖²) — floored isqrt norms are ≤1/1000 relative on the
    // milli-quantized grid (norms² ~10⁶⁺); signed division truncates
    // toward zero in both engines.
    "llm_anisotropy" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
        .withColumn("b", conv(substring(md5(concat(lit("ani|"),
          col("vec_id").cast("string"))), 1, 6), 16, 10)
          .cast("long") % 4096)
      val w = Window.partitionBy("b").orderBy("vec_id")
      val dot = VectorOps.dotFn(s)
      val cos = emb
        .withColumn("rn", row_number().over(w))
        .withColumn("qv2", lead("qv", 1).over(w))
        .filter(col("rn") % 2 === 1 && col("qv2").isNotNull)
        .select(dot(col("qv"), col("qv")).as("aa"),
          dot(col("qv2"), col("qv2")).as("bb"),
          dot(col("qv"), col("qv2")).as("ab"))
        .select(((col("ab") * 1000000L).as("num")),
          greatest(TextOps.isqrt(col("aa")) * TextOps.isqrt(col("bb")),
            lit(1L)).as("den"))
        .select(expr("num div den").as("c"))
      cos.agg(count(lit(1)).as("n_pairs"),
        expr("sum(c) div count(1)").as("mean_cos_micro"),
        expr("(sum(CASE WHEN c > 500000 THEN 1 ELSE 0 END) * 1000000)"
          + " div count(1)").as("frac_above_half_micro"))
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

    // ---- Moran's I over the embedding occupancy grid (X361) ---------------
    // Are occupied embedding cells surrounded by similarly occupied
    // ones (operators/MoranI.scala)? The spatial-clustering readout
    // for shard/layout planning: high I = mass concentrates in
    // contiguous grid regions (range partitioning wins), I near
    // -1/(N-1) = hash-like scatter. Full-rectangle lattice with
    // analytic rook degrees; two shifted equi-joins, no adjacency
    // table.
    "llm_moran_grid" -> ((s, dir) => {
      val pts = Tables(s, dir, "embeddings")
        .select(
          floor(element_at(col("embedding"), 1).cast("double") * 10.0)
            .cast("long").as("cx"),
          floor(element_at(col("embedding"), 2).cast("double") * 10.0)
            .cast("long").as("cy"))
      graft.operators.MoranI.moran(pts, "cx", "cy")
    }),

    "llm_grid_join" -> ((s, dir) => {
      val pts = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000.0)
            .cast("long").as("x"),
          floor(element_at(col("embedding"), 2).cast("double") * 1000.0)
            .cast("long").as("y"))
      graft.operators.GridJoin.proximityJoin(pts, "vec_id", "x", "y",
        maxDist = 40L).orderBy("id_a", "id_b")
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

    // ---- quantile (rank) normalization -----------------------------------
    // Mid-rank fractional position from the micro-value histogram:
    // counts are exact integers, the prefix window runs over the
    // |distinct-values| aggregate (domain-bounded, not corpus-bounded),
    // and the corpus is touched by one agg + one equi-join back.
    "llm_quantile_norm" -> ((s, dir) => {
      graft.llm.FeatureOps.quantileNormalize(events(s, dir), "event_id",
        "value").orderBy("event_id")
    }),

    // ---- n-gram novelty of the odd half vs the even reference ------------
    // Incremental-ingest counterpart of decontamination: per candidate
    // doc, the share of its distinct 3-gram shingles absent from the
    // reference half — one left-anti equi-join, per-doc distinct done
    // in-row before the explode. Synthetic soup is heavily shared, so
    // low novelty IS the expected (and verified) answer.
    "llm_novelty" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      TextOps.noveltyRate(d.filter(col("doc_id") % 2 === 1),
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text", n = 3)
        .orderBy("doc_id")
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

    // ---- blast radius: bounded-hop BFS from flagged nodes ----------------
    // "Recalled" parts (partkey % 97 == 0 among graph nodes) spreading
    // through the capped co-order graph (X148, weight >= 2): min-hop
    // exposure within 3 hops. The oracle unrolls 3 frontier rounds —
    // monotone closure, surplus rounds are no-ops (the X147 argument).
    "llm_blast_radius" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
      val nodes = edges.select(col("item_a").as("n"))
        .unionAll(edges.select(col("item_b").as("n"))).distinct()
      val seeds = nodes.filter(col("n") % 97 === 0)
      graft.operators.Bfs.minHops(edges, "item_a", "item_b", seeds,
        maxHops = 3)
        .orderBy("n")
    }),

    // ---- top user journeys (most common session paths) -------------------
    // 30-minute-gap sessions rendered as ">"-joined type sequences,
    // top 25 by support. The struct-sorted path build makes the string
    // identical under any partitioning; the oracle spells the same
    // path via string_agg(ORDER BY).
    "llm_user_journeys" -> ((s, dir) => {
      EventOps.userJourneys(events(s, dir), "user_id", "ts", "event_id",
        "event_type", gapMinutes = 30, topN = 25)
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

    // ---- capped bipartite projection (co-order item graph) ---------------
    // Parts co-ordered in the same order, per-order cap 5 (smallest
    // partkeys, deterministic), weight >= 2 — the graph-construction
    // step whose whale-basket blowup the cap bounds at C(cap,2)
    // regardless of skew.
    "llm_coorder_graph" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
        .orderBy("item_a", "item_b")
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

    // ---- link prediction over the co-order graph (X258) ------------------
    // Common-neighbors / Jaccard / Adamic-Adar for NON-adjacent part
    // pairs — "which co-order edge appears next". Wedge candidates
    // come from cap-12 neighbor lists (weight DESC, id ASC —
    // deterministic), so fan-out is bounded C(12,2) per center at any
    // hub skew; all three scores are defined self-consistently on the
    // capped structure, AA in exact integer micro (10^12 div
    // micro-floored ln deg).
    "llm_link_predict" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
      graft.operators.LinkPrediction.scores(edges, "item_a", "item_b",
        cap = 12, topK = 50)
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

    // ---- k-core decomposition (iterative graph peeling) ------------------
    // 2-core of the sparse order-part bipartite graph (l_quantity < 8
    // keeps it sparse enough that peeling cascades ~14 rounds deep at
    // sf0.01 — pendant chains strip one layer per round before the
    // cyclic core stabilizes). The oracle unrolls 30 peel rounds: the
    // fixpoint is monotone, so extra rounds are no-ops and too few
    // would fail the hash gate loudly.
    "llm_graph_kcore" -> ((s, dir) => {
      val edges = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull
          && col("l_quantity") < 8)
        .select((col("l_orderkey") * 2).as("a"),
          (col("l_partkey") * 2 + 1).as("b"))
        .distinct()
      graft.operators.KCore.kCore(edges, "a", "b", k = 2)
        .orderBy("n")
    }),

    // ---- MinHash source-overlap matrix (sketch algebra) ------------------
    // Estimated pairwise shingle-Jaccard between sources from k=32
    // per-source min-hashes — the mergeable-sketch form of X79's exact
    // overlap. Deterministic md5 slot hashes make even the ESTIMATES
    // hash-comparable cross-engine.
    "llm_minhash_overlap" -> ((s, dir) => {
      TextOps.minhashSourceOverlap(Tables(s, dir, "documents"),
        "source", "text", k = 32)
        .orderBy("src_a", "src_b")
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

    // ---- z-order layout vs ingestion layout: file-skipping index ---------
    // Two 6-bit dimensions (user_id%64, event_id%64) over events, 16
    // files per layout: z-range bucketing clusters (x,y) rectangles so
    // the box query [8,15]×[16,31] touches ONE file; the round-robin
    // ingestion layout smears both dims across every file and can skip
    // nothing. The per-file min/max table is the metadata a 100 TB scan
    // consults before reading a byte.
    "llm_zorder_layout" -> ((s, dir) => {
      val ev = events(s, dir).select(
        (col("user_id") % 64).cast("int").as("x"),
        (col("event_id") % 64).cast("int").as("y"),
        col("event_id"))
      val tagged = ev
        .withColumn("layout", lit("zorder"))
        .withColumn("_z", graft.operators.ZOrder.zValue(col("x"), col("y"), 6))
        .withColumn("file", expr("_z div 256"))
        .drop("_z")
        .unionByName(ev
          .withColumn("layout", lit("ingest"))
          .withColumn("file", (col("event_id") % 16).cast("long")))
      graft.operators.ZOrder
        .skippingIndex(tagged, "layout", "file", "x", "y",
          x0 = 8, x1 = 15, y0 = 16, y1 = 31)
        .orderBy("layout", "file_id")
    }),

    // ---- Hilbert vs Z-order layout head-to-head (X312) --------------------
    // Same events, same 16-file budget, same box predicate: the
    // Hilbert key's every-step-adjacent walk gives file rectangles at
    // least as tight as Morton's seam-jumping interleave, read
    // directly off the two skipping indexes. Pure integer fold (6
    // unrolled levels) — bit-identical cross-engine.
    "llm_hilbert_layout" -> ((s, dir) => {
      val ev = events(s, dir).select(
        (col("user_id") % 64).cast("int").as("x"),
        (col("event_id") % 64).cast("int").as("y"),
        col("event_id"))
      val tagged = graft.operators.Hilbert
        .withD(ev.withColumn("layout", lit("hilbert")), "x", "y", 6, "_d")
        .withColumn("file", expr("_d div 256"))
        .drop("_d")
        .unionByName(ev
          .withColumn("layout", lit("zorder"))
          .withColumn("_z",
            graft.operators.ZOrder.zValue(col("x"), col("y"), 6))
          .withColumn("file", expr("_z div 256"))
          .drop("_z"))
      graft.operators.ZOrder
        .skippingIndex(tagged, "layout", "file", "x", "y",
          x0 = 8, x1 = 15, y0 = 16, y1 = 31)
        .orderBy("layout", "file_id")
    }),

    // ---- URL canonicalization + keep-first dedup -------------------------
    // The crawl-dedup key normalizer. documents has no URL column, so
    // both engines synthesize the same messy URLs from (doc_id, source):
    // mixed-case scheme/host, default :443 port, utm_* trackers in
    // every position the scrubber handles, fragments. Collisions are
    // structural (doc_id mod arithmetic), so real dup groups exist.
    "llm_url_dedup" -> ((s, dir) => {
      val k = (col("doc_id") % 50).cast("string")
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
        lit("://WWW."), col("source"), lit(".Example.COM"),
        when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
        lit("/docs/"), k,
        when(col("doc_id") % 3 === 0, lit("?utm_source=feed"))
          .when(col("doc_id") % 3 === 1,
            concat(lit("?id="), k, lit("&utm_campaign=x")))
          .otherwise(concat(lit("?id="), k)),
        when(col("doc_id") % 7 === 0, lit("#section-2")).otherwise(lit("")))
      TextOps.urlDedup(
        Tables(s, dir, "documents").withColumn("url", url), "doc_id", "url")
        .orderBy("doc_id")
    }),

    // ---- per-dimension embedding statistics (normalization model) --------
    // count/min/max/mean/var per component from exact integer sums —
    // |dim| groups regardless of corpus size; the integer sums are the
    // mergeable state, mean/var derived at the end.
    "llm_embed_stats" -> ((s, dir) => {
      VectorOps.dimStats(Tables(s, dir, "embeddings"), "embedding")
        .orderBy("dim")
    }),

    // ---- deterministic random projection (JL transform, 64 -> 8) ---------
    // Rademacher matrix from md5-parity signs, folded into the plan as
    // a literal: zero shuffle, zero joins — one linear scan computing
    // all 8 output components per row as exact integer sums. The
    // oracle recomputes the same signs in SQL and reduces via
    // unnest + group-by; the hash match proves the projection
    // bit-identical cross-engine.
    "llm_random_projection" -> ((s, dir) => {
      VectorOps.randomProjection(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", dims = 64, outDims = 8)
        .orderBy("vec_id", "out_dim")
    }),

    // ---- int8 scalar-quantization codec audit ----------------------------
    // Per-dimension min/max scaling to [0,255], round-tripped, with the
    // reconstruction-error table that gates "serve this corpus from
    // int8". Pure integer round-half-up arithmetic end to end — the
    // oracle replays encode+decode in SQL and the hash match proves the
    // codec is bit-identical cross-engine.
    "llm_int8_codec" -> ((s, dir) => {
      VectorOps.int8CodecAudit(Tables(s, dir, "embeddings"), "embedding")
        .orderBy("dim")
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

    // ---- incremental connected components (contract-and-solve) -----------
    // Nightly dup-group maintenance: fold the batch's edges (any pair
    // touching a %4==0 doc) into the base labels WITHOUT re-running CC
    // on the full graph — the contracted loop is bounded by the batch's
    // touch set. The oracle computes the FULL-graph fixpoint, so the
    // hash match proves incremental ≡ full recompute.
    "llm_incremental_cc" -> ((s, dir) => {
      // The pair table feeds THREE independent job chains (base CC loop,
      // contracted delta loop, new-node anti-join), each materializing
      // through its own localCheckpoint rounds — without pinning it,
      // every chain re-runs the full SimHash detection (measured ~9.5 s
      // vs ~4 s at sf0.1). The pair table is tiny (dup pairs only), so
      // this is the persisted-edge-table shape a production run uses.
      val pairs = TextOps.simHashNearDup(Tables(s, dir, "documents"),
        "doc_id", "text", maxHamming = 3, chunks = 4)
        .select("doc_a", "doc_b")
        .localCheckpoint(true)
      val isNew = (c: Column) => c % 4 === 0
      val baseEdges = pairs.filter(!isNew(col("doc_a")) && !isNew(col("doc_b")))
      val newEdges = pairs.filter(isNew(col("doc_a")) || isNew(col("doc_b")))
      val oldLabels = graft.operators.ConnectedComponents
        .labelPropagation(baseEdges, "doc_a", "doc_b")
      graft.operators.ConnectedComponents
        .incrementalLabels(oldLabels, newEdges, "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("label").as("group_id"))
        .orderBy("doc_id")
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

    // ---- triangle enumeration (degree-ordered, Suri-Vassilvitskii) -------
    // Graph = the PageRank hub topology plus intra-group member rings,
    // so triangles exist by construction (hub, k, k+1): 8 per full
    // group, 400 at sf0.01. The operator's wedge fan-out is bounded by
    // out-degree ≤ O(√m) regardless of hub degree — the celebrity-node
    // case the naive middle-vertex join dies on.
    "llm_graph_triangles" -> ((s, dir) => {
      val nodes = Tables(s, dir, "documents").select(col("doc_id").as("id"))
      val hubEdges = nodes.filter(col("id") % 10 =!= 0)
        .select(col("id").as("src"), (col("id") - (col("id") % 10)).as("dst"))
      val ringEdges = nodes.filter(col("id") % 10 >= 1 && col("id") % 10 <= 8)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
        .join(nodes.select(col("id").as("dst")), "dst") // real nodes only
        .select("src", "dst")
      graft.operators.Triangles
        .triangleList(hubEdges.unionByName(ringEdges), "src", "dst")
        .orderBy("a", "b", "c")
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

    // ---- multimodal: REAL binary payload + batched executor-side decode --
    // r12 verdict #3: the legacy family now runs the REAL codec end to
    // end. One genuine PNG per document (corpus-shaped fixture written
    // to parquet so the oracle reads the SAME bytes), decoded with
    // javax.imageio — width/height come from decoded pixels while the
    // oracle re-derives them from the container's IHDR, so a stubbed
    // decode or codec/container disagreement hash-mismatches. stubDecode
    // is reachable only as imageDecode's corrupt-blob degradation path.
    "llm_multimodal_meta" -> ((s, dir) => {
      val base = s"/tmp/graft_mm_png/${SalesFixture.sfName(dir)}"
      Multimodal.pngCorpus(s,
          Tables(s, dir, "documents").select(col("doc_id")), "doc_id")
        .write.mode("overwrite").parquet(base)
      Multimodal.decodeMeta(s, s.read.parquet(base), "doc_id",
          Multimodal.imageDecode)
        .toDF()
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL decode -> fit-24 resize -> stride-2 sample -----
    // The full video pipeline over the REAL codec: per-document
    // length-prefixed PNG-frame containers (videoCorpus), the real
    // container walk + per-frame javax.imageio decode (videoFrameMeta),
    // then fit-to-24 resize arithmetic on the DECODED dims and a
    // stride-2 frame sample — all narrow, no join back. The oracle
    // re-walks the same container bytes recursively (k17 pattern) and
    // replays the resize + stride arithmetic from the IHDR dims.
    "llm_multimodal_frames" -> ((s, dir) => {
      val base = s"/tmp/graft_mm_vid/${SalesFixture.sfName(dir)}"
      Multimodal.videoCorpus(s,
          Tables(s, dir, "documents").select(col("doc_id")), "doc_id")
        .write.mode("overwrite").parquet(base)
      val fm = Multimodal.videoFrameMeta(s, s.read.parquet(base), "doc_id")
      val longest = greatest(col("width"), col("height"))
      fm.filter(col("frame_no") % 2 === 0)
        .select(col("clip_id").as("doc_id"),
          col("frame_no").as("frame_idx"), col("n_bytes"),
          when(longest <= 24, col("width"))
            .otherwise(greatest(lit(1L),
              expr("(width * 24) div greatest(width, height)")))
            .as("width"),
          when(longest <= 24, col("height"))
            .otherwise(greatest(lit(1L),
              expr("(height * 24) div greatest(width, height)")))
            .as("height"),
          col("frame_md5"))
        .orderBy("doc_id", "frame_idx")
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

    // ---- power-iteration top principal component (X200) ------------------
    // The embedding-geometry audit SemDeDup / prototypicality / ANN all
    // implicitly assume away: does one direction hoard the variance?
    // Exact integer covariance (ONE explode² corpus pass, shuffle volume
    // d²=4096 rows per partition via map-side combine), then 8 exact
    // integer matvec+rescale rounds on the d²-row model table — the
    // corpus is never touched again. Oracle replays every round as
    // unrolled MATERIALIZED CTEs (the X56/X95 discipline).
    "llm_pca_power" -> ((s, dir) => {
      VectorOps.topPrincipalComponent(
        Tables(s, dir, "embeddings"), "embedding", rounds = 8)
    }),

    // ---- content-defined chunking dedup (X201) ---------------------------
    // The rsync/LBFS chunk-store idea at word granularity: boundaries
    // are a pure function of LOCAL content (md5(word) mod 4 == 0), so a
    // boilerplate block planted at DIFFERENT offsets in every carrier
    // still yields identical interior chunks — the shift-robustness
    // fixed shingles lack. Runs on the boilerplated corpus so cross-doc
    // chunk sharing exists to find; dedup is pure hash aggregation (no
    // pairwise compares). Global __ALL__ row = the content-addressed
    // store view (chunks dedup ACROSS sources).
    "llm_cdc_chunks" -> ((s, dir) => {
      TextOps.cdcChunkStats(boilerplatedDocs(s, dir), "doc_id", "aug",
        "source", avgChunk = 4)
    }),

    // ---- reciprocal-rank fusion hybrid retrieval (X203) ------------------
    // The modern serving shape: a LEXICAL retriever (inverted-index
    // candidates over shared low-df terms, integer-idf scoring) and a
    // DENSE retriever (quantized-dot cosine) each produce a top-20 per
    // query; RRF (Cormack et al. 2009) fuses the two rank lists with
    // Σ 1/(60+rank) in exact integer micro-units. Every score is pure
    // integer arithmetic (idf_i = 10⁶ div df; dot on quantized vectors;
    // 10⁶ div (60+rank)), so ranks and the fusion replay bit-identically.
    // Scale: lexical candidates come from the term EQUI-join with
    // high-df terms dropped (df·10 ≤ N — the stop-term prune every real
    // inverted index applies), dense is panel-bounded broadcast (the
    // X9 shape); nothing corpus×corpus.
    "llm_rank_fusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("_w"))
      val nDocs = d.count()
      val terms = d.select(col("doc_id"),
        explode(array_distinct(col("_w"))).as("w"))
      val kept = terms.groupBy("w").agg(count(lit(1)).as("df"))
        .filter(col("df") * 10 <= nDocs)
      val qTerms = terms.join(kept, "w")
        // bounded panel: < 5000 is a no-op at <= sf0.1, caps sf1
        .filter(col("doc_id") % 101 === 7 && col("doc_id") < 5000)
        .select(col("doc_id").as("q_id"), col("w"),
          expr("1000000 div df").as("idf_i"))
      val lex20 = qTerms
        .join(terms.withColumnRenamed("doc_id", "d_id"), "w")
        .filter(col("d_id") =!= col("q_id"))
        .groupBy("q_id", "d_id").agg(sum("idf_i").as("lex_score"))
        .withColumn("lex_rank", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("lex_score").desc, col("d_id"))).cast("long"))
        .filter(col("lex_rank") <= 20)
        .select("q_id", "d_id", "lex_rank")
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"),
          VectorOps.quantize(col("embedding")).as("qv"))
      val dot = VectorOps.dotFn(s)
      val emb20 = emb.filter(col("doc_id") % 101 === 7
          && col("doc_id") < 2000)
        .select(col("doc_id").as("q_id"), col("qv").as("_qqv"))
        .crossJoin(emb.select(col("doc_id").as("d_id"), col("qv")))
        .filter(col("d_id") =!= col("q_id"))
        .select(col("q_id"), col("d_id"),
          dot(col("_qqv"), col("qv")).as("emb_score"))
        .withColumn("emb_rank", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("emb_score").desc, col("d_id"))).cast("long"))
        .filter(col("emb_rank") <= 20)
        .select("q_id", "d_id", "emb_rank")
      lex20.join(emb20, Seq("q_id", "d_id"), "full_outer")
        .withColumn("rrf_micro",
          coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L))
            + coalesce(expr("1000000 div (60 + emb_rank)"), lit(0L)))
        .withColumn("_rn", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("rrf_micro").desc, col("d_id"))))
        .filter(col("_rn") <= 5)
        .select(col("q_id"), col("d_id").as("doc_id"), col("lex_rank"),
          col("emb_rank"), col("rrf_micro"))
        .orderBy("q_id", "doc_id")
    }),

    // ---- hard-negative mining (X204) -------------------------------------
    // Contrastive-training data prep: for each anchor, the top-k most
    // SIMILAR vectors with a DIFFERENT label — similar enough to be
    // informative, excluded from the positive class by supervision (the
    // in-batch-negatives upgrade every dense-retriever recipe ships).
    // Exact quantized dots, rank ties broken (dot DESC, neg_id). Scale:
    // anchors are panel-bounded and BROADCAST against the corpus (the
    // X9 shape — corpus never self-pairs); at 100 TB the corpus side
    // swaps to the IVF/PQ shortlist (X99) with this exact refine.
    "llm_hard_negatives" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"),
        col("label"), VectorOps.quantize(col("embedding")).as("qv"))
      val dot = VectorOps.dotFn(s)
      val anchors = emb.filter(col("vec_id") % 97 === 11
          && col("vec_id") < 2000)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("qv").as("_aqv"))
      emb.crossJoin(broadcast(anchors))
        .filter(col("vec_id") =!= col("q_id")
          && col("label") =!= col("q_label"))
        .select(col("q_id"), col("q_label"), col("vec_id").as("neg_id"),
          col("label").as("neg_label"), dot(col("_aqv"), col("qv")).as("dot_q"))
        .withColumn("rank", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("dot_q").desc, col("neg_id"))).cast("long"))
        .filter(col("rank") <= 8)
        .orderBy("q_id", "rank")
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

    // ---- label propagation communities (X208) ----------------------------
    // Weighted synchronous LPA over the co-order graph (X148's edges):
    // the density-aware refinement CC can't give — CC merges everything
    // reachable, LPA splits a component along weighted structure. Five
    // synchronous rounds, votes argmax'd by max(struct(w, -lbl)) — a
    // combine agg, not a window — so each round is exactly two
    // exchanges. Oracle replays every round unrolled (MATERIALIZED).
    "llm_label_prop" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
      graft.operators.LabelPropagation.communities(
        edges, "item_a", "item_b", "weight", rounds = 5)
        .orderBy("n")
    }),

    // ---- degree assortativity of the co-order graph (Newman 2002) --------
    // Do high-degree items co-occur with high-degree items? Pearson r
    // over (deg_src, deg_dst) with both orientations of every edge;
    // exact decimal moments, doubles only in the final r. Negative r
    // (hub-and-spoke disassortativity) vs positive (core-periphery)
    // is a one-number structure readout next to modularity.
    "llm_assortativity" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
        .localCheckpoint(eager = true)
      graft.operators.GraphMetrics.degreeAssortativity(
        edges, "item_a", "item_b")
    }),

    // ---- modularity of the LPA communities (Newman 2004, weighted) -------
    // The quality score for X208's partition: Q_c = 2·in_c/m₂ −
    // (tot_c/m₂)² per community plus the lbl = −1 corpus total (summed
    // over ALL communities, singletons included, before its single
    // rounding). Numerators are exact decimal integers; everything is
    // equi-joins + combine aggs over the edge list — the in-community
    // weight is the edge table joined to labels twice, never a
    // node-pair enumeration.
    // ---- rich-club coefficient curve on the co-order graph (X355) ---------
    // "Do the hub parts co-occur with each other" traced across every
    // degree threshold at once (operators/RichClub.scala): both the
    // node and edge survival curves come from cumulative windows over
    // the DEGREE-VALUE spine — no per-threshold subgraph ever
    // materializes.
    "llm_rich_club" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
      graft.operators.RichClub.curve(edges, "item_a", "item_b")
    }),

    // ---- one synchronous Louvain local-move round (X352) ------------------
    // The modularity-SEEKING move next to llm_modularity's scoring of
    // an LPA partition (operators/Louvain.scala): from singletons,
    // every node adopts its best-gain neighbor community when the
    // exact cross-multiplied gain m2·w − k_i·k_j is positive. Reports
    // how much modularity one sweep buys. NOTE: synchronous adoption
    // gives no monotonicity guarantee — Q can stay flat (two-node
    // mutual swap: each adopts the other, partition relabels only) or
    // even DROP (star graph: all leaves pile onto the hub while the
    // hub moves away); both counterexamples are pinned in LouvainSpec.
    // The per-NODE gains are individually positive, but simultaneous
    // moves interact; only sequential Louvain is monotone.
    "llm_louvain_move" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
      graft.operators.Louvain.moveRound(edges, "item_a", "item_b", "weight")
    }),

    "llm_modularity" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      // edges feed the LPA loop AND three downstream consumers — the
      // containment-join lesson: materialize once
      val edges = graft.operators.BipartiteProjection.project(
        rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
        .localCheckpoint(eager = true)
      val labels = graft.operators.LabelPropagation.communities(
        edges, "item_a", "item_b", "weight", rounds = 5)
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val deg = edges.select(col("item_a").as("n"), col("weight").as("w"))
        .unionAll(edges.select(col("item_b").as("n"), col("weight").as("w")))
        .groupBy("n").agg(sum("w").as("k"))
      val m2t = deg.agg(sum(dec(col("k"))).as("m2"))
      val tot = deg.join(labels, "n").groupBy("lbl")
        .agg(sum(dec(col("k"))).as("tot_k"), count(lit(1)).as("n_nodes"))
      val inw = edges
        .join(labels.select(col("n").as("item_a"), col("lbl").as("la")),
          "item_a")
        .join(labels.select(col("n").as("item_b"), col("lbl").as("lb")),
          "item_b")
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("lbl"))
        .agg(sum(dec(col("weight"))).as("in_w"))
      val perc = tot.join(inw, Seq("lbl"), "left")
        .select(col("lbl"), col("n_nodes"), col("tot_k"),
          coalesce(col("in_w"), lit(0).cast("decimal(38,0)")).as("in_w"))
        .crossJoin(broadcast(m2t))
      val num = (lit(2) * col("in_w") * col("m2")) -
        (col("tot_k") * col("tot_k"))
      def qOf(n: Column, m2sq: Column): Column =
        floor(n.cast("double") / m2sq.cast("double") * 1000000.0 + 0.5)
          .cast("long")
      val rows = perc.filter(col("n_nodes") >= 2)
        .select(col("lbl").cast("long").as("lbl"), col("n_nodes"),
          col("tot_k").cast("long").as("tot_k"),
          col("in_w").cast("long").as("in_w"),
          qOf(num, col("m2") * col("m2")).as("q_ppm"))
      val total = perc
        .agg(sum("n_nodes").as("n_nodes"), sum("tot_k").as("tot_k"),
          sum("in_w").as("in_w"), sum(num).as("_num"),
          first("m2").as("m2"))
        .select(lit(-1L).as("lbl"), col("n_nodes").cast("long").as("n_nodes"),
          col("tot_k").cast("long").as("tot_k"),
          col("in_w").cast("long").as("in_w"),
          qOf(col("_num"), col("m2") * col("m2")).as("q_ppm"))
      total.unionByName(rows).orderBy("lbl")
    }),

    // ---- incremental top-PC: monoid-merged covariance stats (X211) -------
    // The X107/X119 incremental discipline applied to the PCA family:
    // the base corpus's (n, Σx, Σxx) stat tables are persisted once and
    // MERGED with the nightly batch's stats by pure addition (d- and
    // d²-row tables — the base embeddings are never re-read); the
    // fixed-round iteration then runs identically. The oracle is the
    // SPLIT-OBLIVIOUS full recompute (same SQL as llm_pca_power), so
    // green means incremental ≡ full, bit for bit.
    "llm_pca_incremental" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      VectorOps.topPrincipalComponentIncremental(
        e.filter(col("vec_id") % 4 =!= 1), e.filter(col("vec_id") % 4 === 1),
        "embedding", rounds = 8)
    }),

    // ---- 2D skyline: the quality × length Pareto frontier (X210) ---------
    // Multi-objective curation: which documents are not strictly beaten
    // on BOTH quality and length? Prune-then-verify (bucket max + the
    // strictly-higher-bucket prefix max prune the corpus to frontier-
    // sized candidates; exact dominance anti-join only there). The
    // oracle runs the INDEPENDENT quadratic NOT-EXISTS dominance test.
    "llm_skyline" -> ((s, dir) => {
      val sc = Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          TextOps.words(col("text")).as("_w"))
        .select(col("doc_id"),
          floor(TextOps.qualityScore(col("_w"), stopwords) * 1000000.0
            + 0.5).cast("long").as("q_micro"),
          col("n_chars"))
      graft.operators.Skyline.skyline2D(sc, "doc_id", "q_micro", "n_chars",
        xBucketWidth = 31250L)
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

    // ---- Borůvka minimum spanning forest (X304) --------------------------
    // The single-linkage clustering backbone over the X173 proximity
    // graph: cut the forest's heaviest edges and the single-linkage
    // dendrogram falls out at any threshold — the controllable-merge
    // upgrade to the fixed-threshold CC dedup groups. Borůvka because
    // it is THE parallel MST: every component picks its min incident
    // edge simultaneously (one combine agg), components at least halve
    // per round, ⌈log₂V⌉ rounds total; contraction runs on the merge
    // graph only (one edge per live component — exponentially small).
    // Ties broken by the (w, lo, hi) total order = perturbed-distinct
    // weights, so the forest is unique and the unrolled DuckDB replay
    // lands on the identical edge set.
    "llm_graph_mst" -> ((s, dir) => {
      val pts = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000.0)
            .cast("long").as("x"),
          floor(element_at(col("embedding"), 2).cast("double") * 1000.0)
            .cast("long").as("y"))
      val prox = graft.operators.GridJoin.proximityJoin(pts, "vec_id",
        "x", "y", maxDist = 40L)
      graft.operators.Mst.boruvka(prox, "id_a", "id_b", "dist2")
        .select(col("lo").as("id_a"), col("hi").as("id_b"),
          col("w").as("dist2"))
        .orderBy("dist2", "id_a", "id_b")
    }),

    // ---- spectral bipartition of the proximity graph (X323) --------------
    // The global cut the local clusterers can't see (operators/
    // SpectralCut.scala): deflated lazy-walk power iteration lands on
    // the sign pattern of the walk matrix's second eigenvector — the
    // sparsest-cut side assignment (Cheeger) a shard planner wants,
    // where single linkage merges through any bridge and DBSCAN needs
    // a density scale. Same proximity graph as the MST family; 8
    // exact-integer rounds, every one an edge⋈vector equi-join plus
    // two 1-row scalar broadcasts; oracle unrolls all rounds as
    // MATERIALIZED CTEs over the brute-force edge relation.
    "llm_spectral_cut" -> ((s, dir) => {
      val pts = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000.0)
            .cast("long").as("x"),
          floor(element_at(col("embedding"), 2).cast("double") * 1000.0)
            .cast("long").as("y"))
      val prox = graft.operators.GridJoin.proximityJoin(pts, "vec_id",
        "x", "y", maxDist = 40L)
      graft.operators.SpectralCut.bipartition(prox, "id_a", "id_b",
          rounds = 8)
        .select(col("id").as("vec_id"), col("score_q"), col("pos_side"))
        .orderBy("vec_id")
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

    // ---- locally-dominant buddy matching of near-dup pairs (X316) ---------
    // 1:1 pairwise arbitration of the proximity graph (diff the two,
    // keep one, route to a single reviewer): every round matches every
    // edge that is BOTH endpoints' (w, lo, hi)-minimum simultaneously
    // — vertex-disjoint by construction, equal to sequential greedy
    // matching exactly. 7 rounds measured at sf0.1; oracle unrolls 12.
    "llm_dedup_matching" -> ((s, dir) => {
      val pts = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000.0)
            .cast("long").as("x"),
          floor(element_at(col("embedding"), 2).cast("double") * 1000.0)
            .cast("long").as("y"))
      graft.operators.Matching.greedy(
        graft.operators.GridJoin.proximityJoin(pts, "vec_id", "x", "y",
          maxDist = 40L), "id_a", "id_b", "dist2")
        .select(col("lo").as("id_a"), col("hi").as("id_b"),
          col("w").as("dist2"))
        .orderBy("id_a")
    }),

    // ---- single-linkage clusters at a threshold, off the forest (X315) ----
    // The deliverable X304 promised: cluster assignments at ANY merge
    // threshold from the V−1 forest edges alone — CC runs on ≤ |V|−1
    // rows instead of the full pair set, and single-linkage theory
    // says CC(forest ≤ T) = CC(all proximity edges ≤ T) exactly (the
    // forest preserves connectivity at every threshold). The ORACLE
    // computes the right-hand side — the recursive closure over the
    // FULL thresholded pair set — so the hash match is the theorem,
    // not a replay. Every point appears; untouched points are their
    // own singleton cluster.
    "llm_single_linkage" -> ((s, dir) => {
      val pts = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000.0)
            .cast("long").as("x"),
          floor(element_at(col("embedding"), 2).cast("double") * 1000.0)
            .cast("long").as("y"))
        .localCheckpoint(true) // proximity build + singleton union
      val forest = graft.operators.Mst.boruvka(
        graft.operators.GridJoin.proximityJoin(pts, "vec_id", "x", "y",
          maxDist = 40L), "id_a", "id_b", "dist2")
      val lab = graft.operators.ConnectedComponents
        .alternatingStars(forest.filter(col("w") <= 900), "lo", "hi")
      pts.select(col("vec_id"))
        .join(lab.withColumnRenamed("node", "vec_id"),
          Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("label"), col("vec_id")).as("cluster"))
        .withColumn("cluster_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("cluster")))
        .orderBy("vec_id")
    }),

    // ---- incremental MST maintenance (X313) -------------------------------
    // The index-maintenance discipline (X191/X300) applied to X304:
    // fold a batch of new points into an existing forest WITHOUT
    // re-reading the base pair set. Correctness is the cycle property:
    // every base edge the old forest dropped was the maximum of a
    // cycle that still exists unchanged, so MST(forest(base) ∪
    // batch-incident) = MST(full) exactly — and the ORACLE is the
    // full-graph replay, shared by reference. Per-batch cost:
    // |batch|·9 grid cells probed (GridJoin.proximityProbe) +
    // Borůvka over |V|-bounded forest edges + batch incidences.
    "llm_mst_incremental" -> ((s, dir) => {
      val pts = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000.0)
            .cast("long").as("x"),
          floor(element_at(col("embedding"), 2).cast("double") * 1000.0)
            .cast("long").as("y"))
        .localCheckpoint(true) // base build, probe, and probe target
      val base = pts.filter(col("vec_id") % 4 =!= 0)
      val batch = pts.filter(col("vec_id") % 4 === 0)
      val forest = graft.operators.Mst.boruvka(
        graft.operators.GridJoin.proximityJoin(base, "vec_id", "x", "y",
          maxDist = 40L), "id_a", "id_b", "dist2")
        .select(col("lo").as("id_a"), col("hi").as("id_b"),
          col("w").as("dist2"))
      val incident = graft.operators.GridJoin.proximityProbe(
        batch, pts, "vec_id", "x", "y", maxDist = 40L)
      graft.operators.Mst.boruvka(forest.unionByName(incident),
        "id_a", "id_b", "dist2")
        .select(col("lo").as("id_a"), col("hi").as("id_b"),
          col("w").as("dist2"))
        .orderBy("dist2", "id_a", "id_b")
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

    // ---- densest subgraph by BKV peeling (X375) --------------------------
    // Bahmani-Kumar-Vattani 3-approximation over the embeddings
    // proximity graph: the peel finds the planted dense cluster core
    // (at sf0.01 it lifts density 6.64 -> 9.48 by shrinking 490
    // vertices to the 113-vertex core). Edges come from the grid-cell
    // equi-join (never n^2); each peel round is one degree combine agg
    // plus two semi-joins, and the 2/3-shrink bound makes the round
    // count deterministic log_1.5|V|. The oracle replays every round
    // from the brute-force pair relation with the identical
    // cross-multiplied integer threshold.
    "llm_densest_subgraph" -> ((s, dir) => {
      val pts = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000.0)
            .cast("long").as("x"),
          floor(element_at(col("embedding"), 2).cast("double") * 1000.0)
            .cast("long").as("y"))
      val edges = graft.operators.GridJoin.proximityJoin(pts, "vec_id",
        "x", "y", maxDist = 40L).select(col("id_a"), col("id_b"))
      graft.operators.DensestSubgraph.peel(s, edges, "id_a", "id_b")
        .orderBy("round")
    }),

    // ---- greedy maximal matching / 2-approx vertex cover (X376) ----------
    // Locally-minimal edge selection (Israeli-Itai) on the sparse
    // order-part graph: a deterministic maximal matching in O(log E)
    // rounds (3 at sf0.01), the conflict-free pair-arbitration
    // primitive (1:1 linkage resolution, dedup tie-breaking). Keys are
    // md5-led but UNIQUE (pair suffix), so both engines pick identical
    // minima; the matched edge set doubles as the classical
    // 2-approximate vertex cover.
    "llm_graph_matching" -> ((s, dir) => {
      val edges = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull
          && col("l_quantity") < 8)
        .select((col("l_orderkey") * 2).as("a"),
          (col("l_partkey") * 2 + 1).as("b"))
        .distinct()
      graft.operators.MaximalMatching.matching(edges, "a", "b")
        .orderBy("a", "b")
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

    // ---- k-truss cohesive community cut (X381) ---------------------------
    // The triangle-grade filter one rung above llm_graph_kcore: the
    // 6-truss of the capped co-order projection (every surviving edge
    // closes >= 4 triangles among survivors) peels 82k edges down to
    // the one tight 60-edge community at sf0.01 over 17 monotone
    // rounds. Support per round is one wedge equi-join closed by a
    // semi probe — never n²; fan-out bounded by the projection cap.
    "llm_graph_ktruss" -> ((s, dir) => {
      val rel = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.operators.BipartiteProjection.project(rel,
        "l_orderkey", "l_partkey", cap = 5, minWeight = 1)
        .select(col("item_a").as("a"), col("item_b").as("b"))
      graft.operators.KTruss.truss(edges, "a", "b", k = 6)
        .orderBy("a", "b")
    })
  )

  // ======================================================================
  // DuckDB oracles
  // ======================================================================

  /** The X268 Neyman-allocation CTE chain (mom -> sig -> both
    * apportionments), budget-parameterized so the X277 HT-estimation
    * oracle replays the identical design at its own budget.
    */
  private def neymanAllocCtes(budget: Int): String = s"""
mom AS (
        SELECT source AS h, CAST(count(*) AS BIGINT) AS n,
               sum(CAST(len(string_split(text, ' ')) AS HUGEINT)) AS sx,
               sum(CAST(len(string_split(text, ' ')) AS HUGEINT)
                 * len(string_split(text, ' '))) AS sxx
        FROM documents GROUP BY 1),
      v AS (
        SELECT h, n, ((n * sxx - sx * sx) * 1000000000000) // (n * n)
                 AS var12
        FROM mom),
      s0 AS (
        SELECT h, n, var12,
               CAST(floor(sqrt(CAST(var12 AS DOUBLE))) AS HUGEINT) AS s
        FROM v),
      s1 AS (
        SELECT h, n, var12,
               CASE WHEN (s + 1) * (s + 1) <= var12 THEN s + 1 ELSE s END
                 AS s
        FROM s0),
      sig AS (
        SELECT h, n,
               CAST(CASE WHEN s * s > var12 THEN s - 1 ELSE s END
                 AS BIGINT) AS sigma_micro
        FROM s1),
      shp AS (SELECT h, CAST(n AS HUGEINT) AS share FROM sig),
      qp AS (
        SELECT h, ($budget * share) // t.s_tot AS q,
               $budget * share - (($budget * share) // t.s_tot) * t.s_tot AS rem
        FROM shp, (SELECT sum(share) AS s_tot FROM shp) t),
      ap AS (
        SELECT h, q + CASE WHEN rk <= l THEN 1 ELSE 0 END AS alloc_prop
        FROM (SELECT h, q, row_number() OVER (ORDER BY rem DESC, h) AS rk,
                     (SELECT $budget - sum(q) FROM qp) AS l
              FROM qp)),
      shn AS (SELECT h, CAST(n AS HUGEINT) * sigma_micro AS share FROM sig),
      qn AS (
        SELECT h, ($budget * share) // t.s_tot AS q,
               $budget * share - (($budget * share) // t.s_tot) * t.s_tot AS rem
        FROM shn, (SELECT sum(share) AS s_tot FROM shn) t),
      an AS (
        SELECT h, q + CASE WHEN rk <= l THEN 1 ELSE 0 END AS alloc_neyman
        FROM (SELECT h, q, row_number() OVER (ORDER BY rem DESC, h) AS rk,
                     (SELECT $budget - sum(q) FROM qn) AS l
              FROM qn))"""

  private val round6sql = (x: String) => s"floor(($x) * 1000000.0 + 0.5) / 1000000.0"

  /** The IVF-PQ index-build + probe CTE chain through `approx`
    * (query_id, vec_id, adist_q), shared verbatim by llm_ann_ivf_pq
    * (top-k over approx) and llm_ann_refined (shortlist over approx,
    * then exact re-rank) — one definition mirroring the Spark-side
    * `ivfPqIndex` factoring. Also defines `e` and `qv0`, which the
    * refine stage re-reads for full-precision vectors.
    */
  /** X286/X301 shared oracle CTEs: the shard graph build (nd, probes,
    * proximity top-6, md5 ring, edges, entries) over the embedding rows
    * selected by `ndWhere`, plus `qd` — exact self-excluded distances
    * from the rows selected by `qWhere` (aliased query_id) to the nd
    * set — and `b0`..`b4`, the unrolled beam hops. Callers append their
    * own final select over `b4`/`qd`.
    */
  private def graphAnnOracleCtes(ndWhere: String, qWhere: String): String = {
    val hopCtes = (1 to 4).map { h =>
      val prev = if (h == 1) "b0" else s"b${h - 1}"
      s"""c$h AS (
        SELECT DISTINCT query_id, shard, vec_id FROM (
          SELECT query_id, shard, vec_id FROM $prev
          UNION ALL
          SELECT b.query_id, b.shard, ed.dst AS vec_id
          FROM $prev b JOIN edges ed
            ON ed.shard = b.shard AND ed.src = b.vec_id)),
      b$h AS MATERIALIZED (
        SELECT query_id, shard, vec_id, dist_q FROM (
          SELECT c.query_id, c.shard, c.vec_id, qd.dist_q,
                 row_number() OVER (PARTITION BY c.query_id, c.shard
                   ORDER BY qd.dist_q, c.vec_id) AS rn
          FROM c$h c JOIN qd
            ON qd.query_id = c.query_id AND qd.vec_id = c.vec_id)
        WHERE rn <= 8)"""
    }.mkString(",\n      ")
    s"""$embedQvCte,
      nd AS (
        SELECT vec_id, qv, vec_id % 4 AS shard,
               (CASE WHEN qv[1] >= 0 THEN 1 ELSE 0 END
                + CASE WHEN qv[2] >= 0 THEN 2 ELSE 0 END
                + CASE WHEN qv[3] >= 0 THEN 4 ELSE 0 END
                + CASE WHEN qv[4] >= 0 THEN 8 ELSE 0 END) AS bkt
        FROM e WHERE $ndWhere),
      pr AS (
        SELECT vec_id AS src, shard,
               CASE f.i WHEN 0 THEN bkt ELSE xor(bkt, 1 << (f.i - 1)) END
                 AS bkt
        FROM nd CROSS JOIN (VALUES (0), (1), (2), (3), (4)) f(i)),
      prox AS MATERIALIZED (
        SELECT shard, src, dst FROM (
          SELECT p.shard, p.src, b.vec_id AS dst,
                 row_number() OVER (PARTITION BY p.shard, p.src ORDER BY
                   CAST(list_sum(list_transform(range(1, 65),
                     j -> (av.qv[j] - b.qv[j]) * (av.qv[j] - b.qv[j])))
                     AS BIGINT),
                   b.vec_id) AS rn
          FROM pr p
          JOIN nd av ON av.vec_id = p.src
          JOIN nd b ON b.shard = p.shard AND b.bkt = p.bkt
                    AND b.vec_id <> p.src)
        WHERE rn <= 6),
      rng AS MATERIALIZED (
        SELECT shard, vec_id AS src,
               row_number() OVER (PARTITION BY shard ORDER BY
                 CAST('0x' || substr(md5('ring|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                 vec_id) AS rn,
               count(*) OVER (PARTITION BY shard) AS cnt
        FROM nd),
      ring AS (
        SELECT a.shard, a.src, b.src AS dst
        FROM rng a
        CROSS JOIN (VALUES (1), (2)) s(k)
        JOIN rng b ON b.shard = a.shard
                  AND b.rn = ((a.rn - 1 + s.k) % a.cnt) + 1
        WHERE a.src <> b.src),
      edges AS MATERIALIZED (
        SELECT DISTINCT shard, src, dst FROM (
          SELECT * FROM prox UNION ALL SELECT * FROM ring)),
      entry AS (
        SELECT shard, vec_id FROM (
          SELECT shard, vec_id,
                 row_number() OVER (PARTITION BY shard ORDER BY
                   CAST('0x' || substr(md5('entry|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                   vec_id) AS rn
          FROM nd)
        WHERE rn = 1),
      pq AS ($qWhere),
      qd AS MATERIALIZED (
        SELECT q.query_id, x.vec_id,
               CAST(list_sum(list_transform(range(1, 65),
                 j -> (q.qv[j] - x.qv[j]) * (q.qv[j] - x.qv[j]))) AS BIGINT)
                 AS dist_q
        FROM pq q CROSS JOIN (SELECT vec_id, qv FROM e WHERE $ndWhere) x
        WHERE q.query_id <> x.vec_id),
      b0 AS (
        SELECT p.query_id, en.shard, en.vec_id
        FROM pq p CROSS JOIN entry en),
      $hopCtes"""
  }

  private lazy val ivfPqApproxCtes: String = s"""$embedQvCte,
      ${kmeansCtesOver("e", 64, "g",
        "(SELECT greatest(1, least(1048576, CAST(ceil(sqrt(count(*))) AS BIGINT))) FROM e)", 2)},
      resid AS (
        SELECT e.vec_id, gax2.centroid_id AS list_id,
               list_transform(range(1, 65), j -> e.qv[j] - gc1.cv[j]) AS qv
        FROM e
        JOIN gax2 ON e.vec_id = gax2.vec_id
        JOIN gc1 ON gax2.centroid_id = gc1.cid),
      r0 AS (SELECT vec_id, qv[1:32] AS qv FROM resid),
      r1 AS (SELECT vec_id, qv[33:64] AS qv FROM resid),
      ${kmeansCtesOver("r0", 32, "p0", "16", 2)},
      ${kmeansCtesOver("r1", 32, "p1", "16", 2)},
      codes AS (
        SELECT resid.list_id, c.vec_id, c.sub, c.code FROM (
          SELECT vec_id, 0 AS sub, centroid_id AS code FROM p0ax2
          UNION ALL
          SELECT vec_id, 1 AS sub, centroid_id AS code FROM p1ax2) c
        JOIN resid ON c.vec_id = resid.vec_id),
      cb AS (
        SELECT 0 AS sub, cid, cv FROM p0c1
        UNION ALL
        SELECT 1 AS sub, cid, cv FROM p1c1),
      qv0 AS (SELECT vec_id AS query_id, qv FROM e WHERE vec_id % 100 = 0),
      probes AS (
        SELECT query_id, cid AS list_id,
               list_transform(range(1, 65), j -> qq[j] - cv[j]) AS qr
        FROM (
          SELECT q.query_id, c.cid, c.cv, q.qv AS qq,
                 row_number() OVER (PARTITION BY q.query_id ORDER BY
                   CAST(list_sum(list_transform(range(1, 65),
                     j -> (q.qv[j] - c.cv[j]) * (q.qv[j] - c.cv[j]))) AS BIGINT),
                   c.cid) AS rn
          FROM qv0 q, gc1 c)
        WHERE rn <= 4),
      qsub AS (
        SELECT query_id, list_id, 0 AS sub, qr[1:32] AS qs FROM probes
        UNION ALL
        SELECT query_id, list_id, 1 AS sub, qr[33:64] AS qs FROM probes),
      lut AS (
        SELECT query_id, list_id, qsub.sub, cb.cid,
               CAST(list_sum(list_transform(range(1, 33),
                      j -> (qs[j] - cv[j]) * (qs[j] - cv[j]))) AS BIGINT) AS d
        FROM qsub JOIN cb ON qsub.sub = cb.sub),
      approx AS (
        SELECT query_id, vec_id, CAST(sum(d) AS BIGINT) AS adist_q
        FROM codes
        JOIN lut ON codes.list_id = lut.list_id AND codes.sub = lut.sub
                AND codes.code = lut.cid
        WHERE vec_id != query_id
        GROUP BY query_id, vec_id)"""

  /** Generated PageRank iteration CTEs (r1..r`iters`) replaying
    * [[graft.operators.PageRank.run]]'s integer nano-unit update —
    * requires CTEs nodes(id), n(nn), e(src,dst), outd(src,od), r0.
    */
  private def pageRankCtes(iters: Int): String =
    (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS (
        SELECT nodes.id,
               (CAST(1000000000 AS BIGINT) * 15) // (100 * (SELECT nn FROM n))
               + (85 * coalesce(inf.i, 0)) // 100 AS rank
        FROM nodes LEFT JOIN (
          SELECT e.dst AS id, sum($prev.rank // outd.od) AS i
          FROM e JOIN outd USING (src) JOIN $prev ON $prev.id = e.src
          GROUP BY e.dst) inf USING (id))"""
    }.mkString(",\n")

  /** Generated Borůvka-round CTEs replaying [[graft.operators.Mst]]:
    * per round k, the cross-component edge set (x$k), the per-component
    * minimum incident edge under the (w, lo, hi) total order (min$k, a
    * row_number window — the oracle-side spelling of the Spark combine
    * agg), the symmetric merge graph (m$k), its recursive reachability
    * closure (r$k — the contraction that the Spark side runs as
    * alternating-stars CC), min-reachable relabeling (nl$k), and the
    * advanced label table (lab$k). Requires CTEs e(lo, hi, w) and
    * lab0(id, c); must sit inside a `WITH RECURSIVE` prefix. Rounds
    * after convergence are identity (empty x$k propagates through).
    */
  private def mstRoundCtes(rounds: Int): String =
    (1 to rounds).map { k =>
      s"""x$k AS (
        SELECT e.lo, e.hi, e.w, la.c AS ca, lb.c AS cb
        FROM e
        JOIN lab${k - 1} la ON la.id = e.lo
        JOIN lab${k - 1} lb ON lb.id = e.hi
        WHERE la.c <> lb.c),
      i$k AS (
        SELECT ca AS comp, lo, hi, w, cb AS oc FROM x$k
        UNION ALL
        SELECT cb AS comp, lo, hi, w, ca AS oc FROM x$k),
      min$k AS MATERIALIZED (
        SELECT comp, lo, hi, w, oc FROM (
          SELECT i.*, row_number() OVER (PARTITION BY comp
                        ORDER BY w, lo, hi) AS rn
          FROM i$k i)
        WHERE rn = 1),
      m$k AS MATERIALIZED (
        SELECT comp AS a, oc AS b FROM min$k
        UNION
        SELECT oc, comp FROM min$k),
      r$k(a, b) AS (
        SELECT a, b FROM m$k
        UNION
        SELECT r.a, m.b FROM r$k r JOIN m$k m ON m.a = r.b
        WHERE m.b <> r.a),
      nl$k AS MATERIALIZED (
        SELECT a AS c, least(a, min(b)) AS nc FROM r$k GROUP BY a),
      lab$k AS MATERIALIZED (
        SELECT l.id, coalesce(nl.nc, l.c) AS c
        FROM lab${k - 1} l LEFT JOIN nl$k nl ON nl.c = l.c)"""
    }.mkString(",\n      ")

  /** Generated AdaBoost-round CTEs replaying [[graft.operators.AdaBoost]]:
    * per round t, the weighted (feature × bucket) class histogram h$t
    * (feature explode = 5 UNION ALL arms), per-feature totals t$t (fi=0
    * sums the whole corpus once), prefix sums c$t, the winning stump
    * g$t under the (err, fi, bucket, dir) total order with the clamped
    * integer masses and the micro-floored ln-pair vote weight, the
    * weight/score update d$t (cross-multiplied exact-integer
    * reweighting), the ensemble error e$t, and the report row r$t.
    * Requires a CTE d0(y, f0..f4, w HUGEINT, s BIGINT); g$t is
    * MATERIALIZED (referenced by both d$t and r$t — the inlining
    * gotcha).
    */
  private def adaboostRoundCtes(rounds: Int, names: Seq[String]): String = {
    val nameCase = names.zipWithIndex.map { case (n, i) =>
      if (i == names.size - 1) s"ELSE '$n'" else s"WHEN $i THEN '$n'"
    }.mkString("CASE fi ", " ", " END")
    val fSel = (0 until names.size).map { i =>
      if (i == names.size - 1) s"ELSE d.f$i" else s"WHEN $i THEN d.f$i"
    }.mkString("CASE g.fi ", " ", " END")
    (1 to rounds).map { t =>
      val p = t - 1
      val arms = (0 until names.size).map(i =>
        s"SELECT y, w, $i AS fi, f$i AS b FROM d$p").mkString("\n        UNION ALL ")
      s"""h$t AS MATERIALIZED (
        SELECT fi, b,
               sum(CASE WHEN y THEN w ELSE 0 END) AS wp,
               sum(CASE WHEN y THEN 0 ELSE w END) AS wn
        FROM ($arms)
        GROUP BY 1, 2),
      t$t AS (SELECT sum(wp) AS tp, sum(wn) AS tn FROM h$t WHERE fi = 0),
      c$t AS (
        SELECT fi, b,
               sum(wp) OVER (PARTITION BY fi ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
               sum(wn) OVER (PARTITION BY fi ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        FROM h$t),
      g$t AS MATERIALIZED (
        SELECT fi, b AS th, dir, err,
               greatest(err, 1) AS weg,
               greatest(tt.tp + tt.tn - err, 1) AS wcg,
               tt.tp + tt.tn AS wt,
               CAST(floor(ln(CAST(greatest(tt.tp + tt.tn - err, 1)
                      AS DOUBLE)) * 1000000) AS BIGINT)
                 - CAST(floor(ln(CAST(greatest(err, 1) AS DOUBLE))
                     * 1000000) AS BIGINT) AS a2
        FROM (SELECT fi, b, dir, err,
                     row_number() OVER (ORDER BY err, fi, b, dir) AS rn
              FROM (SELECT c.fi, c.b, 0 AS dir,
                           c.cn + tt.tp - c.cp AS err
                    FROM c$t c, t$t tt
                    UNION ALL
                    SELECT c.fi, c.b, 1, c.cp + tt.tn - c.cn
                    FROM c$t c, t$t tt)) x, t$t tt
        WHERE rn = 1),
      d$t AS MATERIALIZED (
        SELECT y, f0, f1, f2, f3, f4,
               w * (CASE WHEN hp <> y THEN wcg ELSE weg END) AS w,
               s + (CASE WHEN hp THEN a2 ELSE -a2 END) AS s
        FROM (
          SELECT d.y, d.f0, d.f1, d.f2, d.f3, d.f4, d.w, d.s,
                 g.wcg, g.weg, g.a2,
                 CASE WHEN g.dir = 0 THEN ($fSel) <= g.th
                      ELSE ($fSel) > g.th END AS hp
          FROM d$p d, g$t g)),
      e$t AS (SELECT sum(CASE WHEN (s > 0) <> y THEN 1 ELSE 0 END)
                AS ens_err FROM d$t),
      r$t AS (
        SELECT $t AS round, $nameCase AS feature,
               CAST(th AS BIGINT) AS threshold,
               CASE WHEN dir = 0 THEN 'le_pos' ELSE 'gt_pos' END AS dir,
               floor(CAST(err AS DOUBLE) / CAST(wt AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS eps,
               a2 AS alpha2_micro,
               CAST(e.ens_err AS BIGINT) AS ens_err
        FROM g$t, e$t e)"""
    }.mkString(",\n      ")
  }

  /** Generated MMR-round CTEs replaying [[VectorOps.mmrRerank]]: per
    * round r ≥ 2, candidate max-similarity to the selected set (m$r —
    * pair dots recomputed from el), the argmax pick p$r under the
    * (score DESC, vec_id) order, and the advanced selection sel$r.
    * Requires CTEs el(vec_id, qv) and sh(query_id, vec_id, d), plus
    * p1/sel1 for the relevance-only first pick (emitted here too).
    */
  private def mmrRoundCtes(rounds: Int, num: Long, den: Long): String = {
    val m = den - num
    val first = s"""p1 AS MATERIALIZED (
        SELECT query_id, vec_id, rel, score, 1 AS rank FROM (
          SELECT query_id, vec_id, d AS rel, $num * d AS score,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY $num * d DESC, vec_id) AS rn
          FROM sh)
        WHERE rn = 1),
      sel1 AS (SELECT query_id, vec_id FROM p1)"""
    val rest = (2 to rounds).map { r =>
      val p = r - 1
      s"""m$r AS (
        SELECT c.query_id, c.vec_id, c.d AS rel,
               max(CAST(list_sum(list_transform(range(1, 65),
                 j -> xa.qv[j] * xb.qv[j])) AS BIGINT)) AS ms
        FROM sh c
        JOIN sel$p s ON s.query_id = c.query_id
        JOIN el xa ON xa.vec_id = c.vec_id
        JOIN el xb ON xb.vec_id = s.vec_id
        WHERE NOT EXISTS (SELECT 1 FROM sel$p s2
                          WHERE s2.query_id = c.query_id
                            AND s2.vec_id = c.vec_id)
        GROUP BY 1, 2, 3),
      p$r AS MATERIALIZED (
        SELECT query_id, vec_id, rel, score, $r AS rank FROM (
          SELECT query_id, vec_id, rel, $num * rel - $m * ms AS score,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY $num * rel - $m * ms DESC, vec_id) AS rn
          FROM m$r)
        WHERE rn = 1),
      sel$r AS MATERIALIZED (
        SELECT query_id, vec_id FROM sel$p
        UNION ALL
        SELECT query_id, vec_id FROM p$r)"""
    }.mkString(",\n      ")
    s"$first,\n      $rest"
  }

  /** Generated Jones–Plassmann round CTEs replaying
    * [[graft.operators.GraphColoring]]: per round k, the local-maxima
    * winner set w$k (NOT EXISTS an uncolored neighbor with a higher
    * (h, id) priority — the oracle spelling of the Spark max-struct
    * compare), colored-neighbor colors used$k, the relational mex
    * newc$k, and the advanced col$k/u$k/e$k state. Requires CTEs
    * sym(node, nbr), pr(node, h), e0 = sym, u0 = nodes, col0 = empty.
    * Rounds after convergence are identity (empty w$k propagates).
    */
  private def jpRoundCtes(rounds: Int): String =
    (1 to rounds).map { k =>
      val p = k - 1
      s"""w$k AS MATERIALIZED (
        SELECT u.node FROM u$p u JOIN pr pu ON pu.node = u.node
        WHERE NOT EXISTS (
          SELECT 1 FROM e$p e JOIN pr pn ON pn.node = e.nbr
          WHERE e.node = u.node
            AND (pn.h > pu.h OR (pn.h = pu.h AND e.nbr > u.node)))),
      used$k AS MATERIALIZED (
        SELECT DISTINCT w.node, c.color
        FROM w$k w JOIN sym s ON s.node = w.node
        JOIN col$p c ON c.node = s.nbr),
      newc$k AS (
        SELECT x.node, min(x.cand) AS color FROM (
          SELECT node, 0 AS cand FROM w$k
          UNION ALL SELECT node, color + 1 FROM used$k) x
        LEFT JOIN used$k u2 ON u2.node = x.node AND u2.color = x.cand
        WHERE u2.node IS NULL
        GROUP BY x.node),
      col$k AS MATERIALIZED (
        SELECT * FROM col$p UNION ALL SELECT * FROM newc$k),
      u$k AS MATERIALIZED (
        SELECT u.node FROM u$p u
        WHERE NOT EXISTS (SELECT 1 FROM w$k w WHERE w.node = u.node)),
      e$k AS MATERIALIZED (
        SELECT e.node, e.nbr FROM e$p e
        WHERE NOT EXISTS (SELECT 1 FROM w$k w WHERE w.node = e.node)
          AND NOT EXISTS (SELECT 1 FROM w$k w WHERE w.node = e.nbr))"""
    }.mkString(",\n      ")

  /** Shared SCC-closure CTE block (for a `WITH RECURSIVE` prefix):
    * the synthetic link table + ring edges, reachability closure,
    * mutual pairs, and `sccs(id, scc, n_nodes is separate)` — scc =
    * min mutual partner including self. Used by llm_graph_scc and
    * llm_graph_condensation so the two oracles cannot drift.
    */
  private val sccClosureCtes: String = """nodes AS (
        SELECT doc_id AS id FROM documents),
      e0 AS (
        SELECT id AS src, id - (id % 10) AS dst FROM nodes WHERE id % 10 <> 0
        UNION ALL
        SELECT id, 0 FROM nodes WHERE id % 10 = 0 AND id <> 0
        UNION ALL
        SELECT id, id + 1 FROM nodes WHERE id % 10 = 0 AND id <> 0
        UNION ALL
        SELECT id, id + 3 FROM nodes WHERE id % 10 IN (1, 4)),
      e AS (SELECT e0.src, e0.dst FROM e0 JOIN nodes n ON n.id = e0.dst),
      reach(a, b) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b),
      mutual AS (
        SELECT r1.a AS v, r1.b AS u FROM reach r1
        JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
      sccs AS MATERIALIZED (
        SELECT n.id, least(n.id, coalesce(min(m.u), n.id)) AS scc
        FROM nodes n LEFT JOIN mutual m ON m.v = n.id
        GROUP BY n.id)"""

  /** Generated HITS iteration CTEs replaying [[graft.operators.Hits]]:
    * per round, authority raw = sum of in-neighbor hub scores then ×10⁶
    * div max, hub raw = sum of out-neighbor FRESH authority scores then
    * the same normalization. Requires CTEs nodes(id), e(src, dst),
    * h0(id, s). arN/hrN are referenced twice (scalar max + join) —
    * MATERIALIZED, the unrolled-loop-oracle rule.
    */
  private def hitsCtes(iters: Int): String =
    (1 to iters).map { k =>
      s"""ar$k AS MATERIALIZED (
        SELECT e.dst AS id, CAST(sum(h.s) AS BIGINT) AS r
        FROM e JOIN h${k - 1} h ON h.id = e.src GROUP BY e.dst),
      a$k AS MATERIALIZED (
        SELECT nodes.id,
               CAST(coalesce(ar.r, 0) * 1000000
                    // (SELECT max(r) FROM ar$k) AS BIGINT) AS s
        FROM nodes LEFT JOIN ar$k ar USING (id)),
      hr$k AS MATERIALIZED (
        SELECT e.src AS id, CAST(sum(a.s) AS BIGINT) AS r
        FROM e JOIN a$k a ON a.id = e.dst GROUP BY e.src),
      h$k AS MATERIALIZED (
        SELECT nodes.id,
               CAST(coalesce(hr.r, 0) * 1000000
                    // (SELECT max(r) FROM hr$k) AS BIGINT) AS s
        FROM nodes LEFT JOIN hr$k hr USING (id))"""
    }.mkString(",\n      ")

  /** Generated absorbing-chain value-iteration CTEs replaying one
    * [[graft.llm.EventOps.markovRemovalAttribution]] scenario: `tag_k`
    * holds p(s) after k sweeps of
    * p(s) = (Σ_t ppm(s→t)·v(t)) div 10⁶, v(conv)=10⁶, v(null)=0,
    * rows touching `removed` dropped (ppm denominators unchanged).
    * Requires CTEs tr(prev, next, ppm) and tot(prev, t).
    */
  private def markovScenarioCtes(tag: String, removed: Option[String],
      rounds: Int): String = {
    // a transition INTO the removed state is worth 0 (redirect-to-null);
    // the removed state's own rows drop; ppm denominators never change
    val rmCase = removed.map(c => s"WHEN t.next = '$c' THEN 0\n").getOrElse("")
    val rmPrev = removed.map(c => s"WHERE t.prev <> '$c'").getOrElse("")
    val r0 = s"${tag}0 AS (SELECT prev AS s, CAST(0 AS BIGINT) AS p FROM tot)"
    val steps = (1 to rounds).map { k =>
      s"""$tag$k AS (
        SELECT t.prev AS s,
               CAST(coalesce(sum(t.ppm * CASE WHEN t.next = 'conv' THEN 1000000
                             WHEN t.next = 'null' THEN 0
                             ${rmCase}ELSE coalesce(p.p, 0) END), 0)
                    // 1000000 AS BIGINT) AS p
        FROM tr t LEFT JOIN $tag${k - 1} p ON p.s = t.next
        $rmPrev
        GROUP BY t.prev)"""
    }
    (r0 +: steps).mkString(",\n      ")
  }

  /** Generated PERSONALIZED PageRank iteration CTEs replaying
    * [[graft.operators.PageRank.personalized]]: teleport lands on seed
    * nodes only. Requires CTEs st(id, is_seed), ns(n_seeds),
    * e(src,dst), outd(src,od), r0.
    */
  private def pprCtes(iters: Int): String =
    (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS (
        SELECT st.id,
               CASE WHEN st.is_seed = 1
                    THEN (CAST(1000000000 AS BIGINT) * 15)
                         // (100 * (SELECT n_seeds FROM ns))
                    ELSE 0 END
               + (85 * coalesce(inf.i, 0)) // 100 AS rank
        FROM st LEFT JOIN (
          SELECT e.dst AS id, sum($prev.rank // outd.od) AS i
          FROM e JOIN outd USING (src) JOIN $prev ON $prev.id = e.src
          GROUP BY e.dst) inf USING (id))"""
    }.mkString(",\n")

  private val wordsetFpSql =
    "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"

  /** Word-3-gram shingles + distinct (doc, shingle) pairs as a CTE. */
  private val shinglesCte = """
    wdocs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    shing AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 3
                  THEN list_transform(range(1, len(ws) - 1),
                                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                  ELSE [] END AS shs
      FROM wdocs),
    expl AS (
      SELECT DISTINCT doc_id, s
      FROM (SELECT doc_id, unnest(shs) AS s FROM shing))
  """

  private val simhashBitSums =
    (0 until 60)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS bs$b")
      .mkString(", ")
  private val simhashCombine =
    (0 until 60).map(b => s"(CASE WHEN bs$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")

  /** SimHash near-dup candidate pairs as a CTE chain ending in `pairs`
    * (doc_a, doc_b, sim_a, sim_b) — shared by the pair query and the
    * dup-groups clustering oracle.
    */
  /** Temperature-scaled (α=0.5) source mixture weights — ONE definition
    * shared by the weights query and the sampling query that applies
    * them (`llm_mixture_sample`). sqrt is IEEE-exact in both engines;
    * the per-source table reduces over |sources| rows.
    */
  private def mixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val per = Tables(s, dir, "documents")
      .select(col("source"), size(TextOps.words(col("text"))).cast("long").as("_t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("_t").as("n_tokens"))
    val tot = per.agg(sum("n_tokens").cast("double").as("_tot"))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("token_share",
        TextOps.round6(col("n_tokens").cast("double") / col("_tot")))
      .withColumn("_pq",
        floor(sqrt(col("n_tokens").cast("double") / col("_tot")) * 1000000.0 + 0.5)
          .cast("long"))
    val z = scored.agg(sum("_pq").cast("double").as("_z"))
    scored.crossJoin(broadcast(z))
      .withColumn("mix_weight", TextOps.round6(col("_pq").cast("double") / col("_z")))
      .withColumn("boost", TextOps.round6(col("mix_weight") / col("token_share")))
      .select("source", "n_docs", "n_tokens", "token_share", "mix_weight", "boost")
  }

  /** Oracle twin of [[mixtureWeights]], ending in CTE
    * `mixw(source, n_docs, n_tokens, token_share, mix_weight, boost)`.
    */
  private lazy val mixtureCtes: String = s"""d AS (
        SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS t
        FROM documents),
      per AS (SELECT source, count(*) AS n_docs,
                     CAST(sum(t) AS BIGINT) AS n_tokens
              FROM d GROUP BY source),
      tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot FROM per),
      sc AS (
        SELECT source, n_docs, n_tokens,
               ${round6sql("n_tokens / tot")} AS token_share,
               CAST(floor(sqrt(n_tokens / tot) * 1000000.0 + 0.5) AS BIGINT) AS pq
        FROM per, tot),
      z AS (SELECT CAST(sum(pq) AS DOUBLE) AS z FROM sc),
      m AS (
        SELECT source, n_docs, n_tokens, token_share,
               ${round6sql("pq / z")} AS mix_weight
        FROM sc, z),
      mixw AS (
        SELECT source, n_docs, n_tokens, token_share, mix_weight,
               ${round6sql("mix_weight / token_share")} AS boost
        FROM m)"""

  /** The ONE SQL spelling of TextOps.qualityScore over a `ws` word-array
    * column — shared by every oracle that scores quality, mirroring the
    * single Scala definition (round-5 verdict: thresholds and formulas
    * must live in exactly one place per engine).
    */
  private[queries] lazy val qualitySqlCol: String = round6sql(
    "(least(len(ws), 200) / 200.0) * 0.5" +
    " + (len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE)) * 0.3" +
    " + (len(list_filter(ws, x -> x IN (" +
    stopwords.map(w => s"'$w'").mkString(", ") +
    "))) / CAST(len(ws) AS DOUBLE)) * 0.2")

  /** SimHash chunk-bucket candidate pairs over an arbitrary (doc_id,
    * text) relation — `simhashPairsCte` is the `documents` instance;
    * llm_incremental_curate runs it over the v1 ∪ batch union.
    */
  /** The planted-triplicate corpus shared by the DBSCAN pair
    * (llm_dbscan_dedup / llm_bcubed_eval): organic near-dups are too
    * sparse at verify scale (degree ≤ 1 — everything noise, a vacuous
    * green), so src0 ships in triplicate (exact copies at
    * doc_id+1e6/+2e6) and the clustering has real cores to find.
    */
  private def plantedTriplicate(s: SparkSession, dir: String): DataFrame = {
    val d0 = Tables(s, dir, "documents").select("doc_id", "text", "source")
    val plant = d0.filter(col("source") === "src0")
    d0.select("doc_id", "text")
      .union(plant.select((col("doc_id") + 1000000L).as("doc_id"),
        col("text")))
      .union(plant.select((col("doc_id") + 2000000L).as("doc_id"),
        col("text")))
  }

  /** Oracle twin of [[plantedTriplicate]] + the full hamming-DBSCAN
    * chain (maxHamming 3, minPts 3), ending in CTE
    * `dbs(doc_id, n_neighbors, role, cluster_id)` — shared by
    * llm_dbscan_dedup and llm_bcubed_eval. Must follow WITH RECURSIVE.
    */
  private lazy val dbscanCtes: String = s"""docs3 AS MATERIALIZED (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000, text FROM documents
          WHERE source = 'src0'
        UNION ALL SELECT doc_id + 2000000, text FROM documents
          WHERE source = 'src0'),
      ${simhashPairsCteOver("docs3")},
      e AS MATERIALIZED (
        SELECT doc_a, doc_b FROM pairs
        WHERE bit_count(xor(sim_a, sim_b)) <= 3),
      sym AS MATERIALIZED (
        SELECT doc_a AS doc, doc_b AS nbr FROM e
        UNION ALL SELECT doc_b, doc_a FROM e),
      deg AS MATERIALIZED (
        SELECT doc, CAST(count(*) AS BIGINT) AS n_neighbors
        FROM sym GROUP BY 1),
      core AS MATERIALIZED (
        SELECT doc FROM deg WHERE n_neighbors >= 2),
      ce AS (
        SELECT doc_a, doc_b FROM e
        WHERE doc_a IN (SELECT doc FROM core)
          AND doc_b IN (SELECT doc FROM core)),
      csym AS (
        SELECT doc_a AS node, doc_b AS nbr FROM ce
        UNION ALL SELECT doc_b, doc_a FROM ce),
      reach(node, label) AS (
        SELECT node, node FROM csym
        UNION
        SELECT s.node, r.label FROM csym s JOIN reach r ON s.nbr = r.node),
      cc AS (SELECT node, min(label) AS group_id FROM reach GROUP BY node),
      corec AS MATERIALIZED (
        SELECT c.doc, coalesce(cc.group_id, c.doc) AS cluster_id
        FROM core c LEFT JOIN cc ON cc.node = c.doc),
      bord AS (
        SELECT s.doc, min(k.cluster_id) AS b_cluster
        FROM sym s JOIN corec k ON k.doc = s.nbr
        GROUP BY 1),
      dbs AS MATERIALIZED (
        SELECT d.doc_id,
               CAST(coalesce(deg.n_neighbors, 0) AS BIGINT) AS n_neighbors,
               CASE WHEN corec.doc IS NOT NULL THEN 'core'
                    WHEN bord.b_cluster IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role,
               CAST(CASE WHEN corec.doc IS NOT NULL THEN corec.cluster_id
                         ELSE bord.b_cluster END AS BIGINT) AS cluster_id
        FROM docs3 d
        LEFT JOIN deg ON deg.doc = d.doc_id
        LEFT JOIN corec ON corec.doc = d.doc_id
        LEFT JOIN bord ON bord.doc = d.doc_id)"""

  private def simhashPairsCteOver(src: String) = s"""
      tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM $src),
      hh AS (
        SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM tok),
      bs AS (SELECT doc_id, $simhashBitSums FROM hh GROUP BY doc_id),
      sims AS (SELECT doc_id, $simhashCombine AS simhash FROM bs),
      ch AS (
        SELECT doc_id, simhash, i AS ci, (simhash >> (i * 15)) & 32767 AS cv
        FROM sims, generate_series(0, 3) t(i)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sim_a, b.simhash AS sim_b
        FROM ch a JOIN ch b
          ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)"""

  private lazy val simhashPairsCte: String = simhashPairsCteOver("documents")

  private def signBucketSqlBits(bits: Int): String =
    (0 until bits)
      .map(i => s"(CASE WHEN CAST(embedding[${i + 1}] AS DOUBLE) >= 0.0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
  private val signBucketSql = signBucketSqlBits(6)

  /** Exact top-5 cosine (quantized) as row_number SQL — the oracle for
    * BOTH the window-form (`llm_topk_similarity`) and heap-aggregate
    * (`llm_topk_heap`) Spark plans, which must produce identical rows.
    */
  private val topkSimilaritySql = """
      WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        FROM embeddings),
      qs AS (SELECT vec_id AS query_id, qv AS qq FROM q WHERE vec_id % 100 = 0),
      d AS (
        SELECT query_id, vec_id,
               CAST(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * qv[i])) AS BIGINT) AS dot_q
        FROM qs, q WHERE vec_id != query_id),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, vec_id) AS "rank"
        FROM d)
      SELECT query_id, "rank", vec_id, dot_q
      FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"
    """

  /** Deterministic k-means oracle: the same fixed Lloyd iterations the
    * Spark operator runs (`iters` assignments, `iters - 1` floor-division
    * centroid updates, argmin bit-packed as (dist² << 8) | cid), unrolled
    * as a generated CTE chain. 64 dims pinned (the embeddings table).
    */
  /** CTE chain for the k-means iterations, ending in `ax$iters`
    * (vec_id, centroid_id, dist_q) — shared by the llm_kmeans oracle and
    * the semantic-dedup composite built on top of the assignment.
    * `kExpr` is any scalar SQL expression (a literal, or a subquery that
    * derives k from the corpus size à la kForCorpus); init centroids get
    * DENSE cids 0..k-1 (rank over the k lowest ids) and the argmin packs
    * them into the low [[graft.llm.VectorOps.CidBits]] = 20 bits,
    * mirroring the Spark operator exactly.
    */
  /** Lloyd-loop CTE chain over an arbitrary source CTE `src(vec_id, qv)`
    * with `dims`-wide vectors, all CTE names prefixed `p` — the
    * generalization that lets the PQ oracle replay one loop PER SUBSPACE
    * next to the full-vector loops the k-means/SemDeDup/IVF oracles use.
    * Ends with `${p}ax$iters` (vec_id, centroid_id, dist_q); the trained
    * codebook is `${p}c${iters-1}`.
    */
  private def kmeansCtesOver(src: String, dims: Int, p: String,
      kExpr: String, iters: Int): String = {
    val init = s"""${p}c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv
        FROM (SELECT vec_id, qv FROM $src ORDER BY vec_id LIMIT $kExpr))"""
    def assign(i: Int) = s"""
      ${p}a$i AS (
        SELECT vec_id,
               min((CAST(list_sum(list_transform(range(1, ${dims + 1}),
                      j -> (qv[j] - cv[j]) * (qv[j] - cv[j]))) AS BIGINT) << 20) | cid) AS k
        FROM $src, ${p}c${i - 1} GROUP BY vec_id),
      ${p}ax$i AS (SELECT vec_id, k & 1048575 AS centroid_id, k >> 20 AS dist_q FROM ${p}a$i)"""
    def update(i: Int) = s"""
      ${p}c$i AS (
        SELECT centroid_id AS cid,
               list(CAST(floor(s / CAST(n AS DOUBLE)) AS BIGINT) ORDER BY j) AS cv
        FROM (
          SELECT centroid_id, j, sum($src.qv[j]) AS s, count(*) AS n
          FROM ${p}ax$i JOIN $src USING (vec_id), range(1, ${dims + 1}) t(j)
          GROUP BY 1, 2)
        GROUP BY centroid_id)"""
    val rounds = (1 until iters).map(i => assign(i) + "," + update(i)).mkString(",")
    s"""$init,
      $rounds,
      ${assign(iters)}"""
  }

  /** Shared CTE stack for the co-order-graph LPA queries
    * (llm_label_prop, llm_modularity): the capped bipartite projection
    * (`e`: a < bb edges, `sym`: both directions) and 5 synchronous LPA
    * rounds ending in `l5` (n, lbl). Round CTEs referenced twice are
    * MATERIALIZED (the inlining gotcha).
    */
  private def coorderLpaCtes: String = {
    val rounds = (1 to 5).map { r =>
      s"""v$r AS MATERIALIZED (
        SELECT s.n, l.lbl, CAST(sum(s.w) AS BIGINT) AS vw
        FROM sym s JOIN l${r - 1} l ON l.n = s.m
        GROUP BY s.n, l.lbl),
      l$r AS MATERIALIZED (
        SELECT n, lbl FROM (
          SELECT n, lbl,
                 row_number() OVER (PARTITION BY n
                   ORDER BY vw DESC, lbl) AS rk
          FROM v$r)
        WHERE rk = 1)"""
    }.mkString(",\n      ")
    s"""$coorderBaseCtes,
      l0 AS (SELECT DISTINCT n, n AS lbl FROM sym),
      $rounds"""
  }

  /** The co-order projected graph (rel → capped → e → sym) shared by
    * the LPA stack and the Louvain move round. */
  private def coorderBaseCtes: String =
    """rel AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      capped AS (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5),
      e AS MATERIALIZED (
        SELECT x.i AS a, y.i AS bb, CAST(count(*) AS BIGINT) AS w
        FROM capped x JOIN capped y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      sym AS MATERIALIZED (
        SELECT a AS n, bb AS m, w FROM e
        UNION ALL
        SELECT bb AS n, a AS m, w FROM e)"""

  /** The X284 planted-dirt linkage feed as oracle CTEs (m, f) —
    * shared by llm_record_linkage and llm_sorted_neighborhood.
    */
  private val linkageFeedCtes = """m AS (
        SELECT c_custkey AS m_key, c_name AS m_name,
               c_nationkey AS m_nat, c_acctbal AS m_bal,
               c_mktsegment AS m_seg
        FROM customer),
      f AS (
        SELECT c_custkey + 1000000 AS f_key,
               CASE WHEN c_custkey % 7 = 0 THEN 'X' || c_name
                    ELSE c_name END AS f_name,
               CASE WHEN c_custkey % 5 = 0 THEN (c_nationkey + 1) % 25
                    ELSE c_nationkey END AS f_nat,
               CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1.37
                    ELSE c_acctbal END AS f_bal,
               CASE WHEN c_custkey % 11 = 0 THEN 'UNKNOWN'
                    ELSE c_mktsegment END AS f_seg
        FROM customer)"""

  /** X332 RBO: both rankings from one panel×corpus dot pass, the
    * max(ra, rb) entry-depth trick, and the SAME JVM-folded
    * (1−p)·p^(d−1) micro weight table EvalOps.rbo uses, as VALUES.
    * `lazy` — referenced from the map. */
  private lazy val rankRboOracleSql: String = {
    val wd = graft.llm.EvalOps.rboWeights(20, pNum = 9, pDen = 10)
    val wsum = wd.map(_._2).sum
    val values = wd.map { case (d, w) => s"($d, $w)" }.mkString(", ")
    s"""
      WITH $embedQvCte,
      qs AS (SELECT vec_id AS query_id, qv AS qq FROM e
             WHERE vec_id % 100 = 0),
      sc AS MATERIALIZED (
        SELECT qs.query_id, e.vec_id,
               CAST(list_sum(list_transform(range(1, len(qq) + 1),
                 i -> qq[i] * e.qv[i])) AS BIGINT) AS s_full,
               CAST(list_sum(list_transform(range(1, 33),
                 i -> qq[i] * e.qv[i])) AS BIGINT) AS s_half
        FROM qs, e WHERE e.vec_id != qs.query_id),
      ta AS (
        SELECT query_id, vec_id, rn AS ra FROM (
          SELECT query_id, vec_id, row_number() OVER (
            PARTITION BY query_id ORDER BY s_full DESC, vec_id) AS rn
          FROM sc) WHERE rn <= 20),
      tb AS (
        SELECT query_id, vec_id, rn AS rb FROM (
          SELECT query_id, vec_id, row_number() OVER (
            PARTITION BY query_id ORDER BY s_half DESC, vec_id) AS rn
          FROM sc) WHERE rn <= 20),
      m AS (
        SELECT ta.query_id, greatest(ta.ra, tb.rb) AS mx
        FROM ta JOIN tb USING (query_id, vec_id)),
      xd AS (
        SELECT query_id, d, count(*) AS x
        FROM m, (SELECT unnest(generate_series(1, 20)) AS d) ds
        WHERE mx <= d GROUP BY 1, 2),
      w AS (SELECT * FROM (VALUES $values) AS t(d, wd)),
      r AS (
        SELECT query_id, sum((x * wd) // d) AS t, max(x) AS n_common
        FROM xd JOIN w USING (d) GROUP BY 1)
      SELECT q.query_id,
             CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
             CAST(coalesce((t * 1000000) // $wsum, 0) AS BIGINT)
               AS rbo_micro
      FROM qs q LEFT JOIN r USING (query_id)
      ORDER BY query_id
    """
  }

  /** The trained-NB lang-ID replay (trigram model, add-one smoothing,
    * unseen-mass floor, (score DESC, lang) argmax), shared by
    * llm_langid_trained and llm_mcnemar so the two oracles cannot
    * drift. Ends at CTE `r` (doc_id, lang_true, cand, rn). */
  private lazy val nbLangCtes: String = """base AS (
        SELECT doc_id, lang, text FROM documents WHERE length(text) >= 3),
      ex AS (
        SELECT doc_id, lang, text,
               unnest(range(1, CAST(length(text) AS BIGINT) - 1)) AS i
        FROM base),
      tri AS (SELECT doc_id, lang, substr(text, CAST(i AS INT), 3) AS g FROM ex),
      dg AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY doc_id, g),
      lg AS (SELECT lang, g, count(*) AS clg FROM tri GROUP BY lang, g),
      nl AS (SELECT lang, CAST(sum(clg) AS BIGINT) AS nlt FROM lg GROUP BY lang),
      v AS (SELECT count(DISTINCT g) AS vv FROM lg),
      model AS (
        SELECT lang, g,
               CAST(floor(ln((clg + 1) / CAST(nlt + vv AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT) AS li
        FROM lg JOIN nl USING (lang), v),
      fl AS (
        SELECT lang,
               CAST(floor(ln(1.0 / CAST(nlt + vv AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT) AS fl
        FROM nl, v),
      dt AS (
        SELECT doc_id, lang AS lang_true,
               CAST(greatest(length(text) - 2, 0) AS BIGINT) AS n
        FROM documents),
      seen AS (
        SELECT dg.doc_id, model.lang, CAST(sum(c * li) AS BIGINT) AS s,
               CAST(sum(c) AS BIGINT) AS sn
        FROM dg JOIN model USING (g) GROUP BY dg.doc_id, model.lang),
      sc AS (
        SELECT dt.doc_id, dt.lang_true, fl.lang,
               coalesce(seen.s, 0) + (dt.n - coalesce(seen.sn, 0)) * fl.fl AS score
        FROM dt CROSS JOIN fl
        LEFT JOIN seen ON seen.doc_id = dt.doc_id AND seen.lang = fl.lang),
      r AS (
        SELECT doc_id, lang_true, lang AS cand,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, lang) AS rn
        FROM sc)"""

  /** X330 best-of-n: 8 branches over the ranked panel, each with the
    * static power expressions iⁿ − (i−1)ⁿ and Nⁿ in HUGEINT — the
    * exact with-replacement order-statistic estimator EvalOps.bestOfN
    * computes in decimal(38,0). `lazy` — referenced from the map. */
  private lazy val bestOfNOracleSql: String = {
    def pw(e: String, n: Int): String =
      (1 to n).map(_ => s"CAST(($e) AS HUGEINT)").mkString(" * ")
    val branches = (1 to 8).map { n =>
      s"""SELECT CAST($n AS BIGINT) AS n,
               CAST((SELECT count(*) FROM ranked) AS BIGINT) AS n_panel,
               CAST(sum(CAST(s AS HUGEINT)
                        * (${pw("i", n)} - ${pw("i - 1", n)}))
                    // (${pw("(SELECT count(*) FROM ranked)", n)})
                 AS BIGINT) AS exp_max_micro
        FROM ranked"""
    }.mkString("\n        UNION ALL\n        ")
    s"""
      WITH panel AS (
        SELECT doc_id,
               CAST(floor(($qualitySqlCol) * 1000000.0) AS BIGINT) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        WHERE substr(md5('bon|' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
      ranked AS MATERIALIZED (
        SELECT s, row_number() OVER (ORDER BY s, doc_id) AS i FROM panel)
      SELECT * FROM (
        $branches)
      ORDER BY n
    """
  }

  /** X326 facility-location greedy: 6 unrolled rounds — per round the
    * excluded-candidate gain agg, the (gain DESC, cid) argmax, the
    * best_u update, and the cumulative total — over the materialized
    * universe×candidates similarity relation. `lazy` — referenced from
    * the oracle map. */
  private lazy val facilitySelectOracleSql: String = {
    val rounds = (1 to 6).map { k =>
      val excl = if (k == 1) ""
      else "\n        WHERE s.cid NOT IN (" +
        (1 until k).map(j => s"SELECT cid FROM p$j")
          .mkString(" UNION ALL ") + ")"
      s"""g$k AS MATERIALIZED (
        SELECT s.cid, sum(greatest(s.s - b.b, 0)) AS gain
        FROM sims s JOIN b${k - 1} b USING (id)$excl
        GROUP BY 1),
      p$k AS MATERIALIZED (
        SELECT cid, gain FROM g$k ORDER BY gain DESC, cid LIMIT 1),
      b$k AS MATERIALIZED (
        SELECT b.id, greatest(b.b, coalesce(w.s, 0)) AS b
        FROM b${k - 1} b LEFT JOIN (
          SELECT sims.id, sims.s FROM sims JOIN p$k ON sims.cid = p$k.cid
        ) w USING (id)),
      t$k AS (SELECT sum(b) AS total FROM b$k)"""
    }.mkString(",\n      ")
    val out = (1 to 6).map(k =>
      s"""SELECT CAST($k AS BIGINT) AS round, p$k.cid AS cand_id,
               CAST(p$k.gain AS BIGINT) AS gain_q,
               CAST(t$k.total AS BIGINT) AS total_q
        FROM p$k, t$k""").mkString("\n        UNION ALL\n        ")
    s"""
      WITH $embedQvCte,
      cnd AS MATERIALIZED (
        SELECT vec_id AS cid, qv AS cqv FROM e WHERE vec_id % 23 = 1),
      sims AS MATERIALIZED (
        SELECT u.vec_id AS id, cnd.cid,
               greatest(CAST(list_sum(list_transform(
                 range(1, len(u.qv) + 1), i -> u.qv[i] * cnd.cqv[i]))
                 AS BIGINT), 0) AS s
        FROM e u CROSS JOIN cnd),
      b0 AS MATERIALIZED (
        SELECT vec_id AS id, CAST(0 AS BIGINT) AS b FROM e),
      $rounds
      SELECT * FROM (
        $out)
      ORDER BY round
    """
  }

  /** X325 EM linkage fit: 5 unrolled EM rounds over the comparison-
    * pattern table, replaying RecordLinkage.emFit's fixed-point
    * arithmetic (NANO product chains, [1000, 999000] clamps, floored
    * nonnegative divisions). */
  private lazy val linkageEmOracleSql: String = {
    val fields = Seq("g_name", "g_nat", "g_seg", "g_bal")
    def caseOf(f: String, kind: String): String =
      s"CASE WHEN $f THEN ${kind}_$f ELSE 1000000 - ${kind}_$f END"
    def prodOf(kind: String): String =
      fields.tail.foldLeft(s"(${caseOf(fields.head, kind)} * 1000)")(
        (a, f) => s"(($a * ${caseOf(f, kind)}) // 1000000)")
    def estep(k: Int, parName: String): String = s"""e$k AS MATERIALIZED (
        SELECT g_name, g_nat, g_seg, g_bal, n, p,
               ${fields.map(f => s"m_$f, u_$f").mkString(", ")},
               (num * 1000000) // greatest(num + den2, 1) AS w
        FROM (
          SELECT pat.*, par.*,
                 (p * ${prodOf("m")}) // 1000000 AS num,
                 ((1000000 - p) * ${prodOf("u")}) // 1000000 AS den2
          FROM pat CROSS JOIN $parName par))"""
    def cl(x: String): String = s"greatest(least($x, 999000), 1000)"
    def mstep(k: Int): String = s"""par$k AS MATERIALIZED (
        SELECT ${cl("sum(n * w) // sum(n)")} AS p,
               ${fields.map { f =>
      cl(s"(sum(CASE WHEN $f THEN n * w ELSE 0 END) * 1000000)" +
        s" // greatest(sum(n * w), 1)") + s" AS m_$f,\n               " +
        cl(s"(sum(CASE WHEN $f THEN n * (1000000 - w) ELSE 0 END)" +
          s" * 1000000) // greatest(sum(n * (1000000 - w)), 1)") +
        s" AS u_$f"
    }.mkString(",\n               ")}
        FROM e$k)"""
    val rounds = (1 to 5).map(k =>
      estep(k, s"par${k - 1}") + ",\n      " + mstep(k))
      .mkString(",\n      ")
    s"""
      WITH $linkageFeedCtes,
      pat AS MATERIALIZED (
        SELECT (f_name = m_name) AS g_name,
               (f_nat = m_nat) AS g_nat,
               (f_seg = m_seg) AS g_seg,
               (floor(f_bal * 100 + 0.5) = floor(m_bal * 100 + 0.5))
                 AS g_bal,
               count(*) AS n
        FROM f JOIN m ON right(f_name, 3) = right(m_name, 3)
        GROUP BY 1, 2, 3, 4),
      par0 AS (
        SELECT CAST(500000 AS BIGINT) AS p,
               ${fields.map(f =>
      s"CAST(900000 AS BIGINT) AS m_$f, CAST(100000 AS BIGINT) AS u_$f")
      .mkString(",\n               ")}),
      $rounds,
      ${estep(6, "par5")}
      SELECT g_name, g_nat, g_seg, g_bal, CAST(n AS BIGINT) AS n_pairs,
             CAST(w AS BIGINT) AS w_match_micro,
             CAST(p AS BIGINT) AS p_micro,
             ${fields.map(f =>
      s"CAST(m_$f AS BIGINT) AS m_$f, CAST(u_$f AS BIGINT) AS u_$f")
      .mkString(",\n             ")}
      FROM e6 ORDER BY 1, 2, 3, 4
    """
  }

  private val embedQvCte = """e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        FROM embeddings)"""

  private def kmeansCtes(kExpr: String, iters: Int): String =
    s"""$embedQvCte,
      ${kmeansCtesOver("e", 64, "", kExpr, iters)}"""

  private def kmeansSql(k: Int, iters: Int): String = s"""
      WITH ${kmeansCtes(k.toString, iters)}
      SELECT vec_id, centroid_id, dist_q FROM ax$iters ORDER BY vec_id
    """

  /** Corpus-dependent cluster count, the SQL twin of
    * [[graft.llm.VectorOps.kForCorpus]]: ceil(n / target), clamped to
    * [1, 2^20]. Evaluated by DuckDB as a scalar subquery in the init
    * CTE's LIMIT.
    */
  private def kForCorpusSqlFor(target: Int): String =
    s"(SELECT greatest(1, least(1048576, CAST(ceil(count(*) / $target.0) AS BIGINT))) FROM e)"

  private val kForCorpusSql: String = kForCorpusSqlFor(SemanticClusterTarget)

  /** Shared CTE stack for the SemDeDup queries: corpus-derived-k k-means
    * (3 rounds) + in-cluster pair scan at the [[SemanticDupMinDotQ]]
    * threshold, ending in `withc` (vec_id, qv, centroid_id) and `dups`
    * (flagged vec_ids).
    */
  private def semanticDupCtes: String = s"""
      ${kmeansCtes(kForCorpusSql, iters = 3)},
      withc AS (SELECT e.vec_id, e.qv, ax3.centroid_id
                FROM e JOIN ax3 ON e.vec_id = ax3.vec_id),
      dups AS (
        SELECT DISTINCT b.vec_id
        FROM withc a JOIN withc b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        WHERE CAST(list_sum(list_transform(range(1, 65),
                i -> a.qv[i] * b.qv[i])) AS BIGINT) >= $SemanticDupMinDotQ)"""

  /** Block-mean perceptual-hash bit terms: bit b = 1 iff window b's mean
    * byte ≥ global mean, by exact cross-multiplication. Bit 63's literal
    * is spelled `(-q - 1)` because `-2^63` won't parse as a single
    * BIGINT literal.
    */
  /** DuckDB expression: the unsigned byte at 0-based offset `off` of
    * the hex column `hx` (the k16 strpos trick, factored — the
    * multimodal oracles parse BMP headers and pixel arrays with it). */
  private def hexByteAt(off: String): String =
    s"((strpos('0123456789ABCDEF', substr(hx, 2*($off) + 1, 1)) - 1) * 16" +
      s" + (strpos('0123456789ABCDEF', substr(hx, 2*($off) + 2, 1)) - 1))"

  /** DuckDB expression: little-endian u32 at 0-based byte offset `off`
    * (BMP header fields). */
  private def hexLe32(off: Int): String =
    s"(${hexByteAt(off.toString)} + 256 * ${hexByteAt((off + 1).toString)}" +
      s" + 65536 * ${hexByteAt((off + 2).toString)}" +
      s" + 16777216 * ${hexByteAt((off + 3).toString)})"

  /** DuckDB expression: big-endian u32 whose 8 hex digits start at
    * 1-based hex position `hpos1` (PNG IHDR fields, 4-byte frame
    * length prefixes). */
  private def hexBe32(hpos1: String): String =
    s"CAST(list_sum(list_transform(range(8), i -> " +
      s"(strpos('0123456789ABCDEF', substr(hx, ($hpos1) + i, 1)) - 1)" +
      s" * 16 ** (7 - i))) AS BIGINT)"

  private val blockhashExpr: String = (0 until 64).map { b =>
    val ws = s"(($b * n) // 64 + 1)"
    val we = s"((${b + 1} * n) // 64)"
    val wlen = s"($we - ($b * n) // 64)"
    val bit = if (b == 63) "(-9223372036854775807 - 1)" else (1L << b).toString
    s"(CASE WHEN $wlen > 0 AND coalesce(list_sum(bytes[$ws:$we]), 0) * n >= total * $wlen THEN $bit ELSE 0 END)"
  }.mkString(" + ")

  private val minhashSigs =
    (0 until 12).map(i => s"min(md5('$i|' || s)) AS h$i").mkString(", ")
  private val bandKeys =
    (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, md5(h${b * 3} || h${b * 3 + 1} || h${b * 3 + 2}) AS bkey FROM sigs")
      .mkString(" UNION ALL ")

  private val langScoreCols = langMarkers.map { case (lang, ms) =>
    val inList = ms.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(ws, x -> x IN ($inList))) AS s_$lang"
  }.mkString(", ")
  private val langArgmax = {
    val g = langMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")
    val cases = langMarkers
      .map { case (l, _) => s"WHEN s_$l = greatest($g) THEN '$l'" }
      .mkString(" ")
    s"CASE $cases END"
  }

  /** Full-recompute PCA replay — shared by llm_pca_power and the
    * split-oblivious llm_pca_incremental oracle. */
  private lazy val pcaPowerSql: String = {
      val rounds = (1 to 8).map { r =>
        val prev = if (r == 1) "v0" else s"v${r - 1}"
        s"""w$r AS MATERIALIZED (
        SELECT m.i, CAST(sum(m.c * v.vv) AS BIGINT) AS w
        FROM mat m JOIN $prev v ON v.j = m.j GROUP BY m.i),
      v$r AS MATERIALIZED (
        SELECT w.i AS j, CAST((w.w * 100000) // mx.m AS BIGINT) AS vv
        FROM w$r w, (SELECT max(abs(w)) AS m FROM w$r) mx)"""
      }.mkString(",\n      ")
      s"""
      WITH e AS (
        SELECT list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        FROM embeddings),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
      x AS (SELECT generate_subscripts(qv, 1) - 1 AS i, unnest(qv) AS xi, qv
            FROM e),
      p AS (SELECT i, xi, generate_subscripts(qv, 1) - 1 AS j, unnest(qv) AS xj
            FROM x),
      sx AS (SELECT i, CAST(sum(xi) AS BIGINT) AS sxi FROM x GROUP BY i),
      sxx AS (SELECT i, j, CAST(sum(xi * xj) AS BIGINT) AS sxx
              FROM p GROUP BY i, j),
      mat AS MATERIALIZED (
        SELECT s.i, s.j,
               CAST((nn.n * s.sxx - a.sxi * b.sxi) // (nn.n * nn.n) AS BIGINT) AS c
        FROM sxx s, nn, sx a, sx b WHERE a.i = s.i AND b.i = s.j),
      v0 AS (SELECT i AS j, CAST(100000 AS BIGINT) AS vv FROM sx),
      $rounds,
      wf AS (SELECT m.i, CAST(sum(m.c * v.vv) AS BIGINT) AS w
             FROM mat m JOIN v8 v ON v.j = m.j GROUP BY m.i),
      rq AS (SELECT CAST(sum(v.vv * w.w) AS BIGINT) AS num,
                    CAST(sum(v.vv * v.vv) AS BIGINT) AS den
             FROM wf w JOIN v8 v ON v.j = w.i),
      tr AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM mat WHERE i = j)
      SELECT 'eigenvalue_q' AS stat, CAST(-1 AS BIGINT) AS dim,
             ${round6sql("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)")} AS value
      FROM rq
      UNION ALL
      SELECT 'loading', CAST(j AS BIGINT),
             ${round6sql("CAST(vv AS DOUBLE) / 100000.0")}
      FROM v8
      UNION ALL
      SELECT 'var_share', CAST(-1 AS BIGINT),
             ${round6sql(
               "CAST(num AS DOUBLE) / (CAST(den AS DOUBLE) * CAST(t AS DOUBLE))")}
      FROM rq, tr
      ORDER BY stat, dim
    """
    }

  val oracleSql: Map[String, String] = Map(
    "llm_exact_dedup" -> """
      SELECT doc_id, content_sha, n_copies FROM (
        SELECT doc_id, sha256(text) AS content_sha,
               count(*) OVER (PARTITION BY sha256(text)) AS n_copies,
               row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        FROM documents)
      WHERE rn = 1 ORDER BY doc_id
    """,

    "llm_fingerprint_dedup" -> s"""
      SELECT doc_id, wordset_fp, minhash_fp, n_copies FROM (
        SELECT doc_id, wordset_fp,
               list_min(list_transform(string_split(text, ' '), w -> md5(w))) AS minhash_fp,
               count(*) OVER (PARTITION BY wordset_fp) AS n_copies,
               row_number() OVER (PARTITION BY wordset_fp ORDER BY doc_id) AS rn
        FROM (SELECT doc_id, text, $wordsetFpSql AS wordset_fp FROM documents))
      WHERE rn = 1 ORDER BY doc_id
    """,

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

    "llm_langid_trained" -> s"""
      WITH $nbLangCtes
      SELECT doc_id, lang_true AS lang, cand AS pred_lang,
             (lang_true = cand) AS correct
      FROM r WHERE rn = 1 ORDER BY doc_id
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
      val rounds = (1 to 10).map { r =>
        val p = r - 1
        s"""      z$r AS (
        SELECT doc, CAST(floor(CAST(sum(c * wt) AS DOUBLE) / sum(c)) AS BIGINT) AS z
        FROM fc JOIN w$p USING (b) GROUP BY doc),
      e$r AS MATERIALIZED (
        SELECT doc,
               least(1000000, greatest(0, (z + 2000) * 250)) - y * 1000000 AS e,
               CASE WHEN y = 1 THEN nd.n0 ELSE nd.n1 END AS cw
        FROM (z$r JOIN lab USING (doc)) CROSS JOIN nd),
      g$r AS (
        SELECT b, sum(c * e * cw) AS g FROM fc JOIN e$r USING (doc) GROUP BY b),
      w$r AS MATERIALIZED (
        SELECT b, wt - least(300, greatest(-300,
                        CAST(floor(CAST(coalesce(g, 0) AS DOUBLE)
                                  / (CAST(nd.n0 AS DOUBLE) * nd.n1 * 200.0)) AS BIGINT))) AS wt
        FROM (w$p LEFT JOIN g$r USING (b)) CROSS JOIN nd)"""
      }.mkString(",\n")
      val curveUnion = (1 to 10).map(r =>
        s"SELECT $r AS k, sum(abs(e)) AS n FROM e$r").mkString("\n        UNION ALL ")
      s"""
      WITH tok AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS w FROM documents),
      fc AS MATERIALIZED (
        SELECT doc, CAST('0x' || substr(md5('clf|' || w), 1, 4) AS INT) % 4096 AS b,
               count(*) AS c
        FROM tok GROUP BY doc, b),
      lab AS MATERIALIZED (
        SELECT doc_id AS doc,
               CASE WHEN len(list_filter(string_split(text, ' '),
                      w -> w IN ('the', 'a', 'of', 'to', 'and'))) * 1000
                    >= 61 * len(string_split(text, ' '))
                    THEN 1 ELSE 0 END AS y
        FROM documents),
      nd AS MATERIALIZED (
        SELECT sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS n0,
               sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS n1
        FROM lab),
      w0 AS MATERIALIZED (
        SELECT CAST(g AS INT) AS b, CAST(0 AS BIGINT) AS wt
        FROM generate_series(0, 4095) t(g)),
$rounds,
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

    // 28 unrolled Jones-Plassmann rounds (generator above) over the
    // co-order graph — rounds track the clique number (24 measured at
    // sf0.001); convergence rounds are identity.
    "llm_graph_coloring" -> s"""
      WITH rel AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      bcap AS (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5),
      pedges AS (
        SELECT x.i AS ia, y.i AS ib
        FROM bcap x JOIN bcap y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      sym AS MATERIALIZED (
        SELECT ia AS node, ib AS nbr FROM pedges
        UNION ALL
        SELECT ib AS node, ia AS nbr FROM pedges),
      pr AS MATERIALIZED (
        SELECT node,
               CAST('0x' || substr(md5('jp|' || CAST(node AS VARCHAR)),
                 1, 15) AS BIGINT) AS h
        FROM (SELECT DISTINCT node FROM sym)),
      e0 AS (SELECT node, nbr FROM sym),
      u0 AS (SELECT DISTINCT node FROM sym),
      col0 AS (SELECT node, 0 AS color FROM u0 WHERE 1 = 0),
      ${jpRoundCtes(28)}
      SELECT node, color FROM col28
      ORDER BY node
    """,

    // quadratic three-join triangle closure (oracle form; the Spark
    // side runs the degree-ordered orientation) over the shared
    // co-order projection.
    "llm_graph_clustering" -> """
      WITH rel AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      bcap AS (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5),
      pedges AS MATERIALIZED (
        SELECT x.i AS ia, y.i AS ib
        FROM bcap x JOIN bcap y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      deg AS (
        SELECT n, count(*) AS d FROM (
          SELECT ia AS n FROM pedges
          UNION ALL SELECT ib FROM pedges)
        GROUP BY n),
      tri AS (
        SELECT e1.ia AS a, e1.ib AS b, e2.ib AS c
        FROM pedges e1
        JOIN pedges e2 ON e2.ia = e1.ib
        JOIN pedges e3 ON e3.ia = e1.ia AND e3.ib = e2.ib),
      tn AS (
        SELECT n, count(*) AS tri_n FROM (
          SELECT a AS n FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        GROUP BY n)
      SELECT d.n AS node, CAST(d.d AS BIGINT) AS degree,
             CAST(coalesce(t.tri_n, 0) AS BIGINT) AS n_triangles,
             CASE WHEN d.d >= 2
                  THEN floor(CAST(2 * coalesce(t.tri_n, 0) AS DOUBLE)
                         / CAST(d.d * (d.d - 1) AS DOUBLE)
                         * 1000000.0 + 0.5) / 1000000.0
                  ELSE 0.0 END AS lcc
      FROM deg d LEFT JOIN tn t ON t.n = d.n
      ORDER BY node
    """,

    // 5 unrolled BFS hops over the X294 co-order graph; cumulative
    // visited-set CTEs MATERIALIZED (each feeds the next hop AND its
    // count row).
    "llm_graph_anf" -> {
      val hops = (1 to 5).map { r =>
        s"""v$r AS MATERIALIZED (
        SELECT DISTINCT src, node FROM (
          SELECT src, node FROM v${r - 1}
          UNION ALL
          SELECT v.src, e.b AS node
          FROM v${r - 1} v JOIN sym e ON e.a = v.node))"""
      }.mkString(",\n      ")
      val rows = (0 to 5).map { r =>
        val newly =
          if (r == 0) s"(SELECT count(*) FROM v0)"
          else s"(SELECT count(*) FROM v$r) - (SELECT count(*) FROM v${r - 1})"
        s"SELECT $r AS hop, (SELECT count(*) FROM v$r) AS reached, $newly AS newly"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH rel AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      bcap AS (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5),
      pedges AS (
        SELECT x.i AS ia, y.i AS ib
        FROM bcap x JOIN bcap y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      sym AS MATERIALIZED (
        SELECT ia AS a, ib AS b FROM pedges
        UNION ALL
        SELECT ib AS a, ia AS b FROM pedges),
      v0 AS MATERIALIZED (
        SELECT DISTINCT p_partkey AS src, p_partkey AS node
        FROM part WHERE p_partkey % 100 = 0),
      $hops,
      tot AS (SELECT count(*) AS fin FROM v5),
      rows AS ($rows)
      SELECT hop, CAST(reached AS BIGINT) AS reached,
             CAST(newly AS BIGINT) AS newly,
             (reached * 10 >= 9 * tot.fin) AS reaches90
      FROM rows, tot
      ORDER BY hop
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

    "llm_vocab" -> """
      SELECT word, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word ORDER BY word
    """,

    "llm_near_dup" -> s"""
      WITH $shinglesCte,
      sigs AS (SELECT doc_id, $minhashSigs FROM expl GROUP BY doc_id),
      bands AS ($bandKeys),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      sets AS (
        SELECT doc_id, list(s) AS ss, count(*) AS c
        FROM expl GROUP BY doc_id),
      verified AS (
        SELECT doc_a, doc_b, x.c AS ca, y.c AS cb,
               CAST(len(list_intersect(x.ss, y.ss)) AS BIGINT) AS inter
        FROM cand
        JOIN sets x ON doc_a = x.doc_id
        JOIN sets y ON doc_b = y.doc_id)
      SELECT doc_a, doc_b, ca, cb, inter, jaccard FROM (
        SELECT *, ${round6sql("inter / CAST(ca + cb - inter AS DOUBLE)")} AS jaccard
        FROM verified)
      WHERE jaccard >= 0.5
      ORDER BY doc_a, doc_b
    """,

    // Brute-force all-pairs exact Jaccard: the oracle for the prefix-
    // filtered join — any pair the filter dropped would fail the hash.
    "llm_set_sim_join" -> s"""
      WITH $shinglesCte,
      sets AS (
        SELECT doc_id, list(s) AS ss, count(*) AS c
        FROM expl GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.c AS ca, b.c AS cb,
               CAST(len(list_intersect(a.ss, b.ss)) AS BIGINT) AS inter
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, ca, cb, inter, jaccard FROM (
        SELECT *, ${round6sql("inter / CAST(ca + cb - inter AS DOUBLE)")} AS jaccard
        FROM pairs)
      WHERE jaccard >= 0.5
      ORDER BY doc_a, doc_b
    """,

    // Exact side = the brute-force all-pairs truth; LSH side replays the
    // banded candidate join + verify; left join marks which true pairs
    // the bands caught.
    "llm_lsh_recall" -> s"""
      WITH $shinglesCte,
      sets AS (
        SELECT doc_id, list(s) AS ss, count(*) AS c
        FROM expl GROUP BY doc_id),
      exact AS (
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 ${round6sql(
                   "len(list_intersect(a.ss, b.ss)) / CAST(a.c + b.c - len(list_intersect(a.ss, b.ss)) AS DOUBLE)")} AS jaccard
          FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
        WHERE jaccard >= 0.5),
      sigs AS (SELECT doc_id, $minhashSigs FROM expl GROUP BY doc_id),
      bands AS ($bandKeys),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      lshv AS (
        SELECT doc_a, doc_b FROM (
          SELECT doc_a, doc_b,
                 ${round6sql(
                   "len(list_intersect(x.ss, y.ss)) / CAST(x.c + y.c - len(list_intersect(x.ss, y.ss)) AS DOUBLE)")} AS j
          FROM cand
          JOIN sets x ON doc_a = x.doc_id
          JOIN sets y ON doc_b = y.doc_id)
        WHERE j >= 0.5)
      SELECT e.doc_a, e.doc_b, e.jaccard,
             (l.doc_a IS NOT NULL) AS found_by_lsh
      FROM exact e LEFT JOIN lshv l USING (doc_a, doc_b)
      ORDER BY e.doc_a, e.doc_b
    """,

    // Sigs/sets are computed once over all documents; the bipartite split
    // happens in the candidate join's side predicates (doc_id % 4).
    "llm_incremental_dedup" -> s"""
      WITH $shinglesCte,
      sigs AS (SELECT doc_id, $minhashSigs FROM expl GROUP BY doc_id),
      bands AS ($bandKeys),
      sets AS (
        SELECT doc_id, list(s) AS ss, count(*) AS c
        FROM expl GROUP BY doc_id),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.doc_id % 4 = 0 AND b.doc_id % 4 != 0),
      near AS (
        SELECT doc_a, count(*) AS n_near FROM (
          SELECT doc_a, doc_b,
                 ${round6sql(
                   "len(list_intersect(x.ss, y.ss)) / CAST(x.c + y.c - len(list_intersect(x.ss, y.ss)) AS DOUBLE)")} AS j
          FROM cand
          JOIN sets x ON doc_a = x.doc_id
          JOIN sets y ON doc_b = y.doc_id)
        WHERE j >= 0.5 GROUP BY doc_a),
      sha AS (SELECT doc_id, sha256(text) AS content_sha FROM documents),
      basesha AS (
        SELECT DISTINCT content_sha FROM sha WHERE doc_id % 4 != 0)
      SELECT sh.doc_id, sh.content_sha,
             (basesha.content_sha IS NOT NULL) AS exact_dup,
             coalesce(near.n_near, 0) AS n_near,
             (basesha.content_sha IS NULL AND near.doc_a IS NULL) AS keep
      FROM sha sh
      LEFT JOIN basesha ON sh.content_sha = basesha.content_sha
      LEFT JOIN near ON sh.doc_id = near.doc_a
      WHERE sh.doc_id % 4 = 0
      ORDER BY sh.doc_id
    """,

    "llm_winnow_fp" -> s"""
      WITH wdocs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(ws) >= 3
                    THEN list_transform(range(1, len(ws) - 1),
                                        i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                    ELSE [] END AS hs
        FROM wdocs),
      mins AS (
        SELECT doc_id,
               CASE WHEN len(hs) >= 4
                    THEN list_transform(range(1, len(hs) - 2), i -> list_min(hs[i:i+3]))
                    WHEN len(hs) > 0 THEN [list_min(hs)]
                    ELSE [] END AS ms
        FROM sh),
      fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(ms)), '')) AS winnow_fp
        FROM mins)
      SELECT doc_id, winnow_fp,
             count(*) OVER (PARTITION BY winnow_fp) AS n_copies
      FROM fp ORDER BY doc_id
    """,

    "llm_simhash" -> s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      hh AS (
        SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM tok),
      bs AS (SELECT doc_id, $simhashBitSums FROM hh GROUP BY doc_id)
      SELECT doc_id, $simhashCombine AS simhash
      FROM bs ORDER BY doc_id
    """,

    "llm_substring_dedup" -> s"""
      WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 25 = 0 THEN text || ' $Boilerplate'
                    ELSE text END AS text
        FROM documents),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM aug),
      sp AS (
        SELECT doc_id, ws,
               unnest(range(1, greatest(1, CAST(len(ws) AS BIGINT) - 8))) AS i
        FROM w),
      spans AS (SELECT doc_id, md5(array_to_string(ws[i:i+9], ' ')) AS h FROM sp),
      g AS (
        SELECT h, count(DISTINCT doc_id) AS ndocs
        FROM spans GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
      pd AS (
        SELECT s.doc_id, count(*) AS n_dup_spans, max(g.ndocs) AS max_span_docs
        FROM spans s JOIN g USING (h) GROUP BY s.doc_id),
      base AS (
        SELECT doc_id, greatest(0, CAST(len(ws) AS BIGINT) - 9) AS n_spans FROM w)
      SELECT b.doc_id, b.n_spans,
             coalesce(pd.n_dup_spans, 0) AS n_dup_spans,
             coalesce(pd.max_span_docs, 0) AS max_span_docs,
             CASE WHEN b.n_spans > 0
                  THEN ${round6sql("coalesce(pd.n_dup_spans, 0) / CAST(b.n_spans AS DOUBLE)")}
                  ELSE 0.0 END AS dup_frac
      FROM base b LEFT JOIN pd USING (doc_id)
      ORDER BY b.doc_id
    """,

    // Brute-force suffix-array replay: materialize every suffix's word
    // list (O(n·len) — oracle-only, the engine never does this), sort by
    // DuckDB's native list comparison (lexicographic, shorter-prefix
    // first — exactly the sentinel order of the prefix-doubling build),
    // LCP of adjacent suffixes via first-mismatch position, then the
    // same left-maximal filter and (lcp DESC, ids) top-k.
    "llm_suffix_repeats" -> s"""
      WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 25 = 0 THEN text || ' $Boilerplate'
                    ELSE text END AS text
        FROM documents),
      tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM aug),
      suf AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos, ws[CAST(i AS INTEGER):] AS s,
               CASE WHEN i > 1 THEN ws[CAST(i AS INTEGER) - 1] ELSE NULL END AS pw
        FROM (SELECT doc_id, ws,
                     unnest(range(1, CAST(len(ws) AS BIGINT) + 1)) AS i
              FROM tok)),
      ord AS (
        SELECT *, row_number() OVER (ORDER BY s, doc_id, pos) AS r FROM suf),
      pr AS (
        SELECT a.doc_id AS doc_a, a.pos AS pos_a, a.s AS sa, a.pw AS pwa,
               b.doc_id AS doc_b, b.pos AS pos_b, b.s AS sb, b.pw AS pwb
        FROM ord a JOIN ord b ON b.r = a.r + 1),
      lc AS (
        -- nullif guard: list_position returns 0 (not NULL) when no
        -- mismatch exists, i.e. one suffix is a prefix of the other —
        -- there the LCP is the shorter length
        SELECT doc_a, pos_a, doc_b, pos_b, pwa, pwb,
               CAST(coalesce(
                 nullif(list_position(list_transform(
                   range(1, least(len(sa), len(sb)) + 1),
                   i -> sa[i] = sb[i]), false), 0) - 1,
                 least(len(sa), len(sb))) AS BIGINT) AS lcp_tokens
        FROM pr)
      SELECT doc_a, pos_a, doc_b, pos_b, lcp_tokens
      FROM lc
      WHERE (pwa IS DISTINCT FROM pwb OR (pwa IS NULL AND pwb IS NULL))
        AND lcp_tokens >= 5
      ORDER BY lcp_tokens DESC, doc_a, pos_a, doc_b, pos_b
      LIMIT 40
    """,

    // Shared-build composite oracle: the repeat half replays the suffix
    // sort + LCP + left-max + top-k, the span half replays the
    // INDEPENDENT L-gram islands algorithm (same as llm_suffix_dup_spans
    // — the two halves must agree with ONE Spark build).
    "llm_suffix_shared" -> s"""
      WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 25 = 0 THEN text || ' $Boilerplate'
                    ELSE text END AS text
        FROM documents),
      tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM aug),
      suf AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos, ws[CAST(i AS INTEGER):] AS s,
               CASE WHEN i > 1 THEN ws[CAST(i AS INTEGER) - 1] ELSE NULL END AS pw
        FROM (SELECT doc_id, ws,
                     unnest(range(1, CAST(len(ws) AS BIGINT) + 1)) AS i
              FROM tok)),
      ord AS (
        SELECT *, row_number() OVER (ORDER BY s, doc_id, pos) AS r FROM suf),
      pr AS (
        SELECT a.doc_id AS doc_a, a.pos AS pos_a, a.s AS sa, a.pw AS pwa,
               b.doc_id AS doc_b, b.pos AS pos_b, b.s AS sb, b.pw AS pwb
        FROM ord a JOIN ord b ON b.r = a.r + 1),
      lc AS (
        SELECT doc_a, pos_a, doc_b, pos_b, pwa, pwb,
               CAST(coalesce(
                 nullif(list_position(list_transform(
                   range(1, least(len(sa), len(sb)) + 1),
                   i -> sa[i] = sb[i]), false), 0) - 1,
                 least(len(sa), len(sb))) AS BIGINT) AS lcp_tokens
        FROM pr),
      rep AS (
        SELECT doc_a, pos_a, doc_b, pos_b, lcp_tokens
        FROM lc
        WHERE (pwa IS DISTINCT FROM pwb OR (pwa IS NULL AND pwb IS NULL))
          AND lcp_tokens >= 5
        ORDER BY lcp_tokens DESC, doc_a, pos_a, doc_b, pos_b
        LIMIT 40),
      sp AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos,
               md5(array_to_string(ws[CAST(i AS INTEGER):CAST(i AS INTEGER) + 9], ' ')) AS h
        FROM (SELECT doc_id, ws,
                     unnest(range(1, greatest(CAST(len(ws) AS BIGINT) - 8, 1))) AS i
              FROM tok)),
      g AS (SELECT h FROM sp GROUP BY h HAVING count(*) >= 2),
      f AS (SELECT DISTINCT doc_id, pos FROM sp JOIN g USING (h)),
      isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM f),
      spans AS (
        SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
               CAST(max(pos) - min(pos) + 10 AS BIGINT) AS span_tokens
        FROM isl
        GROUP BY doc_id, grp)
      SELECT part, id_a, pos_a, id_b, pos_b, n_tokens FROM (
        SELECT 'repeat' AS part, doc_a AS id_a, pos_a,
               doc_b AS id_b, pos_b, lcp_tokens AS n_tokens
        FROM rep
        UNION ALL
        SELECT 'span' AS part, doc_id AS id_a, span_start AS pos_a,
               CAST(NULL AS BIGINT) AS id_b, CAST(NULL AS INTEGER) AS pos_b,
               span_tokens AS n_tokens
        FROM spans)
      ORDER BY part, id_a, pos_a, id_b, pos_b
    """,

    // Full-rebuild oracle for the INCREMENTAL query: the L-gram islands
    // algorithm over the whole union corpus, oblivious to the base/batch
    // split — if the probe-vs-index Spark side drops or invents a span
    // anywhere (batch docs, base docs newly duplicated by the batch, or
    // runs that fuse across the two), the hash mismatches.
    "llm_suffix_incremental" -> s"""
      WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 25 = 0 THEN text || ' $Boilerplate'
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

    // Independent-algorithm oracle: duplicated 10-gram flags (count of
    // OCCURRENCES ≥ 2 — within-doc repeats count, unlike the
    // cross-doc-only llm_substring_dedup family) merged into maximal
    // runs by gaps-and-islands. A run of r flagged starts is one
    // duplicated span of r + 9 tokens — provably the same spans the
    // suffix-array side derives from adjacent-suffix LCPs.
    "llm_suffix_dup_spans" -> s"""
      WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 25 = 0 THEN text || ' $Boilerplate'
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

    "llm_line_dedup" -> s"""
      WITH aug AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 10 = 0 THEN '$HeaderLine' || chr(10) ELSE '' END)
               || text ||
               (CASE WHEN doc_id % 15 = 0 THEN chr(10) || '$FooterLine' ELSE '' END) AS text
        FROM documents),
      w AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug),
      l AS (
        SELECT doc_id, ls,
               unnest(range(1, CAST(len(ls) AS BIGINT) + 1)) AS pos
        FROM w),
      lh AS (SELECT doc_id, pos, md5(ls[pos]) AS h, ls[pos] AS line FROM l),
      common AS (
        SELECT h FROM (SELECT DISTINCT h, doc_id FROM lh)
        GROUP BY h HAVING count(*) >= 2),
      kept AS (
        SELECT doc_id, pos, line FROM lh
        WHERE h NOT IN (SELECT h FROM common)),
      agg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS clean_text
        FROM kept GROUP BY doc_id),
      base AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines FROM w)
      SELECT b.doc_id, b.n_lines,
             b.n_lines - coalesce(a.n_kept, 0) AS n_dropped,
             coalesce(a.clean_text, '') AS clean_text
      FROM base b LEFT JOIN agg a USING (doc_id)
      ORDER BY b.doc_id
    """,

    "llm_dup_span_runs" -> s"""
      WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 25 = 0 THEN text || ' $Boilerplate'
                    ELSE text END AS text
        FROM documents),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM aug),
      sp AS (
        SELECT doc_id, ws,
               unnest(range(1, greatest(1, CAST(len(ws) AS BIGINT) - 8))) AS i
        FROM w),
      spans AS (SELECT doc_id, i AS pos, md5(array_to_string(ws[i:i+9], ' ')) AS h FROM sp),
      g AS (
        SELECT h FROM spans GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
      f AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        FROM spans JOIN g USING (h))
      SELECT doc_id, min(pos) AS span_start, count(*) + 9 AS span_tokens
      FROM f GROUP BY doc_id, isl
      ORDER BY doc_id, span_start
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

    "llm_lm_retrieval" -> s"""
      WITH $lmRetrievalSqlCtes
      SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
             CAST(score_micro AS BIGINT) AS score_micro
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank
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

    "llm_decontaminate" -> """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(CASE WHEN len(ws) >= 5
            THEN list_transform(range(1, len(ws) - 3),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])
            ELSE [] END) AS s
          FROM w)),
      b AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 50 = 0),
      o AS (
        SELECT sh.doc_id, count(DISTINCT sh.s) AS n_shared,
               count(DISTINCT b.bench_id) AS n_bench_docs
        FROM sh JOIN b ON sh.s = b.s AND sh.doc_id != b.bench_id
        GROUP BY sh.doc_id)
      SELECT d.doc_id,
             coalesce(o.n_shared, 0) AS n_shared,
             coalesce(o.n_bench_docs, 0) AS n_bench_docs,
             (coalesce(o.n_shared, 0) > 0) AS contaminated
      FROM documents d LEFT JOIN o ON d.doc_id = o.doc_id
      ORDER BY d.doc_id
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

    "llm_sig_roundtrip" -> s"""
      WITH batch AS (
        SELECT doc_id, sha256(text) AS content_sha
        FROM documents WHERE doc_id % 4 = 0),
      b AS (
        SELECT DISTINCT content_sha AS bsha
        FROM read_parquet('/tmp/graft_sig_out/__SF__/*.parquet'))
      SELECT doc_id, content_sha,
             (content_sha IN (SELECT bsha FROM b)) AS known_exact
      FROM batch ORDER BY doc_id
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

    "llm_snapshot_diff" -> s"""
      WITH v1 AS (SELECT doc_id, sha256(text) AS s1 FROM documents),
      v2 AS (
        SELECT doc_id,
               sha256(CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END) AS s2
        FROM documents WHERE doc_id % 23 <> 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, sha256(text || ' new') AS s2
        FROM documents WHERE doc_id % 29 = 0)
      SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             CASE WHEN v1.doc_id IS NULL THEN 'added'
                  WHEN v2.doc_id IS NULL THEN 'removed'
                  WHEN s1 <> s2 THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM v1 FULL OUTER JOIN v2 USING (doc_id)
      ORDER BY doc_id
    """,

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

    "llm_graph_rank" -> s"""
      WITH nodes AS (SELECT doc_id AS id FROM documents),
      n AS (SELECT count(*) AS nn FROM nodes),
      e AS (
        SELECT id AS src, id - (id % 10) AS dst FROM nodes WHERE id % 10 <> 0
        UNION ALL
        SELECT id AS src, 0 AS dst FROM nodes WHERE id % 10 = 0 AND id <> 0
        UNION ALL
        SELECT id AS src, id + 1 AS dst FROM nodes WHERE id % 10 = 0 AND id <> 0),
      outd AS (SELECT src, count(*) AS od FROM e GROUP BY src),
      r0 AS (
        SELECT id, CAST(1000000000 AS BIGINT) // (SELECT nn FROM n) AS rank
        FROM nodes),
      ${pageRankCtes(3)}
      SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank_nano,
             ${round6sql("rank / 1000000000.0")} AS rank
      FROM r3 ORDER BY doc_id
    """,

    // Unrolled HITS replay over the SAME synthetic link table: 4 rounds
    // of a ← Σ in-hub ×10⁶ // max, then h ← Σ out-authority likewise.
    "llm_graph_hits" -> s"""
      WITH nodes AS (SELECT doc_id AS id FROM documents),
      e AS MATERIALIZED (
        SELECT id AS src, id - (id % 10) AS dst FROM nodes WHERE id % 10 <> 0
        UNION ALL
        SELECT id AS src, 0 AS dst FROM nodes WHERE id % 10 = 0 AND id <> 0
        UNION ALL
        SELECT id AS src, id + 1 AS dst FROM nodes
        WHERE id % 10 = 0 AND id <> 0),
      h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS s FROM nodes),
      ${hitsCtes(4)}
      SELECT a4.id AS doc_id, a4.s AS auth_micro, h4.s AS hub_micro
      FROM a4 JOIN h4 ON a4.id = h4.id
      ORDER BY doc_id
    """,

    // SCC from first principles: recursive-CTE reachability closure,
    // mutual pairs, component id = min mutual partner (incl. self).
    "llm_graph_scc" -> s"""
      WITH RECURSIVE $sccClosureCtes
      SELECT id AS doc_id, CAST(scc AS BIGINT) AS scc
      FROM sccs ORDER BY doc_id
    """,

    // Condensation replay: condensed edges over the closure-derived
    // SCCs, longest-path levels by a recursive (component, depth)
    // enumeration — max depth per component IS the level.
    "llm_graph_condensation" -> s"""
      WITH RECURSIVE $sccClosureCtes,
      ce AS MATERIALIZED (
        SELECT DISTINCT sa.scc AS s, sb.scc AS t
        FROM e JOIN sccs sa ON sa.id = e.src
        JOIN sccs sb ON sb.id = e.dst
        WHERE sa.scc <> sb.scc),
      lvl(n, d) AS (
        SELECT DISTINCT scc, 0 FROM sccs
        UNION
        SELECT ce.t, l.d + 1 FROM lvl l JOIN ce ON ce.s = l.n)
      SELECT c.scc, c.n_nodes, CAST(max(l.d) AS BIGINT) AS level
      FROM (SELECT scc, CAST(count(*) AS BIGINT) AS n_nodes
            FROM sccs GROUP BY 1) c
      JOIN lvl l ON l.n = c.scc
      GROUP BY c.scc, c.n_nodes
      ORDER BY c.scc
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

    "llm_simhash_near_dup" -> s"""
      WITH $simhashPairsCte
      SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
      FROM pairs
      WHERE bit_count(xor(sim_a, sim_b)) <= 3
      ORDER BY doc_a, doc_b
    """,

    // Brute-force ground truth (no blocking at all): every doc pair's
    // exact Hamming distance — proves the subset blocking lossless.
    "llm_simhash_blocked" -> s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      hh AS (
        SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM tok),
      bs AS (SELECT doc_id, $simhashBitSums FROM hh GROUP BY doc_id),
      sims AS (SELECT doc_id, $simhashCombine AS simhash FROM bs)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM sims a JOIN sims b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY doc_a, doc_b
    """,

    // Brute-force ground truth: every (dirty, master) pair's exact
    // levenshtein (length prefilter only cuts |len diff| > 1, which the
    // threshold already implies) — proves the PassJoin segment blocking
    // lossless for distance <= 1.
    "llm_fuzzy_join" -> """
      WITH d AS (
        SELECT p_partkey AS dirty_id,
               CASE
                 WHEN p_partkey % 5 = 0 THEN
                   substr(p_name, 1,
                          5 + CAST(p_partkey % greatest(length(p_name) - 6, 1) AS INT))
                   || substr(p_name,
                             7 + CAST(p_partkey % greatest(length(p_name) - 6, 1) AS INT),
                             length(p_name))
                 WHEN p_partkey % 5 = 1 THEN p_name
                 ELSE substr(p_name, 1, length(p_name) - 2) || '00'
               END AS dirty_name
        FROM part WHERE p_partkey % 5 <= 2),
      pairs AS (
        SELECT d.dirty_id, m.p_partkey AS master_id,
               levenshtein(d.dirty_name, m.p_name) AS dist
        FROM d, part m
        WHERE abs(length(d.dirty_name) - length(m.p_name)) <= 1
          AND levenshtein(d.dirty_name, m.p_name) <= 1),
      best AS (SELECT dirty_id, min(dist) AS dist FROM pairs GROUP BY 1),
      pick AS (
        SELECT p.dirty_id, min(p.master_id) AS master_id, b.dist
        FROM pairs p JOIN best b ON p.dirty_id = b.dirty_id
                                AND p.dist = b.dist
        GROUP BY p.dirty_id, b.dist)
      SELECT d.dirty_id, pick.master_id, CAST(pick.dist AS INT) AS dist
      FROM d LEFT JOIN pick ON d.dirty_id = pick.dirty_id
      ORDER BY d.dirty_id
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

    // Same recursive closure as llm_dup_groups plus the sha keep-first
    // join, LEFT-joined back to every corpus doc — the Spark side runs
    // alternating large/small-star CC, so this oracle pins BOTH
    // implementations to the identical fixpoint.
    "llm_dedup_corpus" -> s"""
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
      sha AS (SELECT doc_id, sha256(text) AS h FROM documents),
      keeper AS (SELECT h, min(doc_id) AS exact_keeper FROM sha GROUP BY h)
      SELECT s.doc_id, keeper.exact_keeper,
             coalesce(cc.group_id, s.doc_id) AS group_rep,
             (coalesce(cc.group_id, s.doc_id) = s.doc_id) AS keep
      FROM sha s
      JOIN keeper ON s.h = keeper.h
      LEFT JOIN cc ON s.doc_id = cc.node
      ORDER BY s.doc_id
    """,

    // Same recursive-CTE dup groups as llm_dedup_corpus, then one md5
    // bucket per GROUP key — the leakage guarantee is structural in both
    // engines (members inherit the group's bucket).
    "llm_leakage_split" -> s"""
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
        SELECT d.doc_id, coalesce(cc.group_id, d.doc_id) AS group_rep
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.node),
      b AS (
        SELECT doc_id, group_rep,
               CAST('0x' || substr(md5('lsplit|' || CAST(group_rep AS VARCHAR)), 1, 4) AS INT) % 100 AS bucket
        FROM rep)
      SELECT doc_id, group_rep, bucket,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM b ORDER BY doc_id
    """,

    // Recursive closure over the same simhash pair list: every node's
    // group is the min doc_id reachable through near-dup edges — the SQL
    // fixpoint the Spark min-label propagation must agree with exactly.
    "llm_dup_groups" -> s"""
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
      cc AS (SELECT node, min(label) AS group_id FROM reach GROUP BY node)
      SELECT node AS doc_id, group_id,
             count(*) OVER (PARTITION BY group_id) AS group_size
      FROM cc ORDER BY doc_id
    """,

    "llm_dup_rep_quality" -> s"""
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
      q AS (
        SELECT doc_id, $qualitySqlCol AS quality
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      g AS (
        SELECT q.doc_id, coalesce(cc.group_id, q.doc_id) AS group_id, q.quality
        FROM q LEFT JOIN cc ON q.doc_id = cc.node),
      reps AS (
        SELECT group_id, doc_id AS rep_id FROM (
          SELECT group_id, doc_id,
                 row_number() OVER (PARTITION BY group_id
                                    ORDER BY quality DESC, doc_id) AS rn
          FROM g)
        WHERE rn = 1)
      SELECT g.doc_id, g.group_id, g.quality,
             (g.doc_id = reps.rep_id) AS keep
      FROM g JOIN reps USING (group_id)
      ORDER BY g.doc_id
    """,

    "llm_kmeans" -> kmeansSql(k = 8, iters = 3),

    // 12 unrolled farthest-point rounds; every CTE MATERIALIZED (round
    // state is referenced twice — the inlining gotcha)
    "llm_coreset" -> {
      val k = 12
      def d2(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, 65), " +
          s"j -> ($a.qv[j] - $b.cv[j]) * ($a.qv[j] - $b.cv[j]))) AS BIGINT)"
      val rounds = (2 to k).map { i =>
        s"""
      s$i AS MATERIALIZED (
        SELECT vec_id, qv, qv AS cv, best FROM st${i - 1}
        ORDER BY best DESC, vec_id LIMIT 1),
      st$i AS MATERIALIZED (
        SELECT st.vec_id, st.qv,
               least(st.best, ${d2("st", s"s$i")}) AS best
        FROM st${i - 1} st, s$i)"""
      }.mkString(",")
      val out = (2 to k)
        .map(i => s"SELECT $i AS sel_idx, vec_id, best AS dist_q FROM s$i")
        .mkString(" UNION ALL ")
      s"""
      WITH $embedQvCte,
      s1 AS MATERIALIZED (
        SELECT vec_id, qv, qv AS cv FROM e ORDER BY vec_id LIMIT 1),
      st1 AS MATERIALIZED (
        SELECT e.vec_id, e.qv, ${d2("e", "s1")} AS best FROM e, s1),$rounds
      SELECT 1 AS sel_idx, vec_id, CAST(0 AS BIGINT) AS dist_q FROM s1
      UNION ALL $out
      ORDER BY sel_idx
    """
    },

    "llm_semantic_dedup" -> s"""
      WITH $semanticDupCtes
      SELECT w.vec_id, w.centroid_id,
             (dups.vec_id IS NOT NULL) AS semantic_dup
      FROM withc w LEFT JOIN dups ON w.vec_id = dups.vec_id
      ORDER BY w.vec_id
    """,

    "llm_joint_curation" -> s"""
      WITH $semanticDupCtes,
      q AS (
        SELECT doc_id,
               $qualitySqlCol AS quality
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      j AS (
        SELECT q.doc_id, q.quality, w.centroid_id,
               (dups.vec_id IS NOT NULL) AS semantic_dup,
               CAST('0x' || substr(md5('split|' || CAST(q.doc_id AS VARCHAR)), 1, 4) AS INT) % 100 AS b
        FROM q
        JOIN withc w ON q.doc_id = w.vec_id
        LEFT JOIN dups ON w.vec_id = dups.vec_id)
      SELECT doc_id, quality, centroid_id, semantic_dup,
             (quality >= 0.3 AND NOT semantic_dup) AS keep,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM j ORDER BY doc_id
    """,

    "llm_topk_similarity" -> topkSimilaritySql,

    // Identical oracle BY DESIGN: the heap-aggregate plan must reproduce
    // the window-form rows exactly (rank and tie-break included).
    "llm_topk_heap" -> topkSimilaritySql,

    "llm_ann_lsh" -> s"""
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv,
               $signBucketSql AS bucket
        FROM embeddings),
      qs AS (SELECT vec_id AS query_id, qv AS qq, bucket FROM e WHERE vec_id % 100 = 0),
      d AS (
        SELECT query_id, e.vec_id, e.bucket,
               CAST(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * e.qv[i])) AS BIGINT) AS dot_q
        FROM qs JOIN e ON qs.bucket = e.bucket AND e.vec_id != qs.query_id),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, vec_id) AS "rank"
        FROM d)
      SELECT query_id, "rank", vec_id, bucket, dot_q
      FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"
    """,

    "llm_ann_multiprobe" -> s"""
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv,
               $signBucketSql AS bucket
        FROM embeddings),
      qs AS (
        SELECT query_id, qq, unnest(probes) AS bucket FROM (
          SELECT vec_id AS query_id, qv AS qq,
                 [bucket, ${(0 until 6).map(i => s"xor(bucket, ${1L << i})").mkString(", ")}] AS probes
          FROM e WHERE vec_id % 100 = 0)),
      d AS (
        SELECT query_id, e.vec_id, e.bucket,
               CAST(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * e.qv[i])) AS BIGINT) AS dot_q
        FROM qs JOIN e ON qs.bucket = e.bucket AND e.vec_id != qs.query_id),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, vec_id) AS "rank"
        FROM d)
      SELECT query_id, "rank", vec_id, bucket, dot_q
      FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"
    """,

    "llm_label_centroids" -> """
      WITH e AS (
        SELECT label,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        FROM embeddings),
      ex AS (
        SELECT label, i AS pos, qv[i] AS v
        FROM e, unnest(range(1, len(qv) + 1)) t(i)),
      ps AS (
        SELECT label, pos, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
        FROM ex GROUP BY label, pos),
      agg AS (
        SELECT label, max(n) AS n,
               list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS cent
        FROM ps GROUP BY label)
      SELECT label, CAST(n AS BIGINT) AS n,
             array_to_string(cent, ',') AS centroid_csv
      FROM agg ORDER BY label
    """,

    "llm_ann_ivf" -> """
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        FROM embeddings),
      c AS (SELECT vec_id AS cid, qv AS cv FROM e WHERE vec_id % 20 = 0),
      ad AS (
        SELECT e.vec_id, e.qv, c.cid,
               CAST(list_sum(list_transform(range(1, len(e.qv) + 1), i -> e.qv[i] * c.cv[i])) AS BIGINT) AS cdot
        FROM e, c),
      asg AS (
        SELECT vec_id, qv, cid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
          FROM ad)
        WHERE rn = 1),
      qp AS (
        SELECT vec_id AS query_id, qv AS qq, cid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
          FROM ad WHERE vec_id % 100 = 0)
        WHERE rn <= 4),
      d AS (
        SELECT qp.query_id, a.vec_id, a.cid,
               CAST(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * a.qv[i])) AS BIGINT) AS dot_q
        FROM qp JOIN asg a ON qp.cid = a.cid AND a.vec_id != qp.query_id),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, vec_id) AS "rank"
        FROM d)
      SELECT query_id, "rank", vec_id, cid AS centroid_id, dot_q
      FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"
    """,

    "llm_ann_ivf_trained" -> s"""
      WITH ${kmeansCtes(
        "(SELECT greatest(1, least(1048576, CAST(ceil(sqrt(count(*))) AS BIGINT))) FROM e)",
        iters = 2)},
      ad AS (
        SELECT e.vec_id, e.qv, c1.cid,
               CAST(list_sum(list_transform(range(1, len(e.qv) + 1), i -> e.qv[i] * c1.cv[i])) AS BIGINT) AS cdot
        FROM e, c1),
      asg AS (
        SELECT vec_id, qv, cid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
          FROM ad)
        WHERE rn = 1),
      qp AS (
        SELECT vec_id AS query_id, qv AS qq, cid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
          FROM ad WHERE vec_id % 100 = 0)
        WHERE rn <= 4),
      dd AS (
        SELECT qp.query_id, a.vec_id, a.cid,
               CAST(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * a.qv[i])) AS BIGINT) AS dot_q
        FROM qp JOIN asg a ON qp.cid = a.cid AND a.vec_id != qp.query_id),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, vec_id) AS "rank"
        FROM dd)
      SELECT query_id, "rank", vec_id, cid AS centroid_id, dot_q
      FROM r WHERE "rank" <= 5 ORDER BY query_id, "rank"
    """,

    // Two subspace Lloyd loops (the generalized kmeansCtesOver), encode
    // = final assignment, codebook = final update, ADC = LUT join + sum.
    "llm_ann_pq" -> s"""
      WITH $embedQvCte,
      s0 AS (SELECT vec_id, qv[1:32] AS qv FROM e),
      s1 AS (SELECT vec_id, qv[33:64] AS qv FROM e),
      ${kmeansCtesOver("s0", 32, "p0", "16", 2)},
      ${kmeansCtesOver("s1", 32, "p1", "16", 2)},
      codes AS (
        SELECT vec_id, 0 AS sub, centroid_id AS code FROM p0ax2
        UNION ALL
        SELECT vec_id, 1 AS sub, centroid_id AS code FROM p1ax2),
      cb AS (
        SELECT 0 AS sub, cid, cv FROM p0c1
        UNION ALL
        SELECT 1 AS sub, cid, cv FROM p1c1),
      qs AS (
        SELECT vec_id AS query_id, 0 AS sub, qv FROM s0 WHERE vec_id % 100 = 0
        UNION ALL
        SELECT vec_id AS query_id, 1 AS sub, qv FROM s1 WHERE vec_id % 100 = 0),
      lut AS (
        SELECT query_id, qs.sub, cid,
               CAST(list_sum(list_transform(range(1, 33),
                      j -> (qs.qv[j] - cv[j]) * (qs.qv[j] - cv[j]))) AS BIGINT) AS d
        FROM qs JOIN cb ON qs.sub = cb.sub),
      approx AS (
        SELECT query_id, vec_id, CAST(sum(d) AS BIGINT) AS adist_q
        FROM codes JOIN lut ON codes.sub = lut.sub AND codes.code = lut.cid
        WHERE vec_id != query_id
        GROUP BY query_id, vec_id)
      SELECT query_id, "rank", vec_id, adist_q FROM (
        SELECT query_id, vec_id, adist_q,
               row_number() OVER (PARTITION BY query_id ORDER BY adist_q, vec_id) AS "rank"
        FROM approx)
      WHERE "rank" <= 5
      ORDER BY query_id, "rank"
    """,

    // Coarse Lloyd loop (prefix g) + residuals + two residual-subspace
    // Lloyd loops (p0/p1) + probe ranking + per-(query, list) LUT join.
    "llm_ann_ivf_pq" -> s"""
      WITH $ivfPqApproxCtes
      SELECT query_id, "rank", vec_id, adist_q FROM (
        SELECT query_id, vec_id, adist_q,
               row_number() OVER (PARTITION BY query_id ORDER BY adist_q, vec_id) AS "rank"
        FROM approx)
      WHERE "rank" <= 5
      ORDER BY query_id, "rank"
    """,

    "llm_ann_recall" -> s"""
      WITH $ivfPqApproxCtes,
      pq AS (
        SELECT query_id, qv FROM (
          SELECT query_id, qv,
                 row_number() OVER (ORDER BY
                   CAST('0x' || substr(md5('panel|' || CAST(query_id AS VARCHAR)), 1, 15) AS BIGINT),
                   query_id) AS pr
          FROM qv0)
        WHERE pr <= 64),
      ar AS (
        SELECT query_id, vec_id, rn FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY adist_q, vec_id) AS rn
          FROM approx)
        WHERE rn <= 20),
      ex AS (
        SELECT q.query_id, x.vec_id,
               CAST(list_sum(list_transform(range(1, 65),
                 j -> (q.qv[j] - x.qv[j]) * (q.qv[j] - x.qv[j]))) AS BIGINT) AS dist_q
        FROM pq q CROSS JOIN e x
        WHERE q.query_id <> x.vec_id),
      er AS (
        SELECT query_id, vec_id, dist_q,
               row_number() OVER (PARTITION BY query_id ORDER BY dist_q, vec_id) AS "rank"
        FROM ex)
      SELECT er.query_id, er."rank", er.vec_id, er.dist_q,
             (ar.rn IS NOT NULL AND ar.rn <= 5) AS in_approx_top5,
             (ar.rn IS NOT NULL) AS in_shortlist20
      FROM er LEFT JOIN ar
        ON er.query_id = ar.query_id AND er.vec_id = ar.vec_id
      WHERE er."rank" <= 5
      ORDER BY er.query_id, er."rank"
    """,

    // Replays the shard graph (LSH-bucketed top-6 proximity edges +
    // 2-successor md5 ring), the per-shard entries, and all 4 beam
    // hops as unrolled MATERIALIZED CTEs; qd doubles as the exact
    // ground-truth distance table (self-excluded, so each hop's join
    // onto qd applies the same self-match filter as the Spark side).
    "llm_ann_graph" -> s"""
      WITH ${graphAnnOracleCtes("1 = 1",
        """SELECT query_id, qv FROM (
          SELECT query_id, qv,
                 row_number() OVER (ORDER BY
                   CAST('0x' || substr(md5('panel|' || CAST(query_id AS VARCHAR)), 1, 15) AS BIGINT),
                   query_id) AS prn
          FROM (SELECT vec_id AS query_id, qv FROM e WHERE vec_id % 100 = 0))
        WHERE prn <= 64""")},
      gr AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY dist_q, vec_id) AS grank
        FROM b4),
      er AS (
        SELECT query_id, vec_id, dist_q,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY dist_q, vec_id) AS "rank"
        FROM qd)
      SELECT er.query_id, er."rank", er.vec_id, er.dist_q,
             (gr.grank IS NOT NULL AND gr.grank <= 5) AS in_graph_top5,
             (gr.grank IS NOT NULL) AS in_beam
      FROM er LEFT JOIN gr
        ON er.query_id = gr.query_id AND er.vec_id = gr.vec_id
      WHERE er."rank" <= 5
      ORDER BY er.query_id, er."rank"
    """,

    // Replays the base-only graph build and the batch vectors' beam
    // searches (same generator as llm_ann_graph), then the top-6
    // beam results as each inserted vector's new out-edges.
    "llm_ann_graph_insert" -> s"""
      WITH ${graphAnnOracleCtes("vec_id % 10 <> 7",
        "SELECT vec_id AS query_id, qv FROM e WHERE vec_id % 10 = 7")}
      SELECT qid AS vec_id, CAST(rn AS INTEGER) AS "rank",
             nb AS neighbor, dist_q
      FROM (
        SELECT query_id AS qid, vec_id AS nb, dist_q,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY dist_q, vec_id) AS rn
        FROM b4)
      WHERE rn <= 6
      ORDER BY vec_id, "rank"
    """,

    // Replays round-0 dot retrieval, the integer Rocchio update
    // (5q + 2*sum of the top-5), round-1 retrieval, and both label
    // precision@10 counts.
    "llm_mmr_rerank" -> s"""
      WITH el AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))
                 AS qv
        FROM embeddings),
      pq AS (
        SELECT vec_id AS query_id, qv FROM (
          SELECT vec_id, qv,
                 row_number() OVER (ORDER BY
                   CAST('0x' || substr(md5('panel|'
                     || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                   vec_id) AS prn
          FROM el WHERE vec_id % 100 = 0)
        WHERE prn <= 64),
      sh AS MATERIALIZED (
        SELECT query_id, vec_id, d FROM (
          SELECT p.query_id, x.vec_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   j -> p.qv[j] * x.qv[j])) AS BIGINT) AS d,
                 row_number() OVER (PARTITION BY p.query_id ORDER BY
                   CAST(list_sum(list_transform(range(1, 65),
                     j -> p.qv[j] * x.qv[j])) AS BIGINT) DESC,
                   x.vec_id) AS rn
          FROM pq p CROSS JOIN el x
          WHERE p.query_id <> x.vec_id)
        WHERE rn <= 16),
      ${mmrRoundCtes(5, 7L, 10L)}
      SELECT query_id, rank, vec_id, CAST(rel AS BIGINT) AS rel,
             CAST(score AS BIGINT) AS mmr_scaled
      FROM (${(1 to 5).map(r => s"SELECT * FROM p$r")
        .mkString("\n            UNION ALL ")})
      ORDER BY query_id, rank
    """,

    "llm_retrieval_feedback" -> s"""
      WITH el AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv,
               label
        FROM embeddings),
      pq AS (
        SELECT vec_id AS query_id, qv, label AS qlabel FROM (
          SELECT vec_id, qv, label,
                 row_number() OVER (ORDER BY
                   CAST('0x' || substr(md5('panel|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                   vec_id) AS prn
          FROM el WHERE vec_id % 100 = 0)
        WHERE prn <= 64),
      sc0 AS MATERIALIZED (
        SELECT p.query_id, x.vec_id, x.label AS xl,
               CAST(list_sum(list_transform(range(1, 65),
                 j -> p.qv[j] * x.qv[j])) AS BIGINT) AS d
        FROM pq p CROSS JOIN el x
        WHERE p.query_id <> x.vec_id),
      rk0 AS MATERIALIZED (
        SELECT query_id, vec_id, xl,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY d DESC, vec_id) AS rn
        FROM sc0),
      fbp AS (
        SELECT r.query_id, gs.j, CAST(sum(x.qv[gs.j]) AS BIGINT) AS s
        FROM (SELECT query_id, vec_id FROM rk0 WHERE rn <= 5) r
        JOIN el x USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, 65)) AS j) gs
        GROUP BY 1, 2),
      fb AS (SELECT query_id, list(s ORDER BY j) AS vs FROM fbp GROUP BY 1),
      moved AS (
        SELECT p.query_id,
               list_transform(range(1, 65),
                 j -> p.qv[j] * 5 + fb.vs[j] * 2) AS qv
        FROM pq p JOIN fb USING (query_id)),
      sc1 AS MATERIALIZED (
        SELECT m.query_id, x.vec_id, x.label AS xl,
               CAST(list_sum(list_transform(range(1, 65),
                 j -> m.qv[j] * x.qv[j])) AS BIGINT) AS d
        FROM moved m CROSS JOIN el x
        WHERE m.query_id <> x.vec_id),
      rk1 AS (
        SELECT query_id, xl,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY d DESC, vec_id) AS rn
        FROM sc1),
      h0 AS (
        SELECT r.query_id,
               CAST(sum(CASE WHEN r.xl = p.qlabel THEN 1 ELSE 0 END)
                 AS BIGINT) AS hits_r0
        FROM rk0 r JOIN pq p USING (query_id)
        WHERE r.rn <= 10 GROUP BY 1),
      h1 AS (
        SELECT r.query_id,
               CAST(sum(CASE WHEN r.xl = p.qlabel THEN 1 ELSE 0 END)
                 AS BIGINT) AS hits_r1
        FROM rk1 r JOIN pq p USING (query_id)
        WHERE r.rn <= 10 GROUP BY 1)
      SELECT p.query_id, p.qlabel AS label, h0.hits_r0, h1.hits_r1,
             h1.hits_r1 - h0.hits_r0 AS uplift
      FROM pq p JOIN h0 USING (query_id) JOIN h1 USING (query_id)
      ORDER BY p.query_id
    """,

    // Replays the shared panel, the per-truncation brute-force top-5
    // (distance over qv[1:d] only), and the hit counts vs d = 64.
    "llm_ann_dim_ablation" -> {
      val dims = Seq(8, 16, 32, 64)
      val topCtes = dims.map { d =>
        s"""t$d AS MATERIALIZED (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY
                   CAST(list_sum(list_transform(range(1, ${d + 1}),
                     j -> (qq[j] - xq[j]) * (qq[j] - xq[j]))) AS BIGINT),
                   vec_id) AS rn
          FROM ex)
        WHERE rn <= 5)"""
      }.mkString(",\n      ")
      val statRows = dims.map { d =>
        s"""SELECT $d AS dim, CAST(count(*) AS BIGINT) AS n_retrieved,
               CAST(sum(CASE WHEN f.query_id IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        FROM t$d t LEFT JOIN t64 f
          ON t.query_id = f.query_id AND t.vec_id = f.vec_id"""
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH $embedQvCte,
      qv0 AS (SELECT vec_id AS query_id, qv FROM e WHERE vec_id % 100 = 0),
      pq AS (
        SELECT query_id, qv FROM (
          SELECT query_id, qv,
                 row_number() OVER (ORDER BY
                   CAST('0x' || substr(md5('panel|' || CAST(query_id AS VARCHAR)), 1, 15) AS BIGINT),
                   query_id) AS pr
          FROM qv0)
        WHERE pr <= 64),
      ex AS MATERIALIZED (
        SELECT q.query_id, x.vec_id, q.qv AS qq, x.qv AS xq
        FROM pq q CROSS JOIN e x
        WHERE q.query_id <> x.vec_id),
      $topCtes,
      st AS (
        $statRows)
      SELECT dim, n_retrieved, n_hits,
             (n_hits * 1000000) // n_retrieved AS recall_micro
      FROM st
      ORDER BY dim
    """
    },

    "llm_ann_refined" -> s"""
      WITH $ivfPqApproxCtes,
      short AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY adist_q, vec_id) AS rn
          FROM approx)
        WHERE rn <= 20),
      rer AS (
        SELECT s.query_id, s.vec_id,
               CAST(list_sum(list_transform(range(1, 65),
                 j -> (q.qv[j] - x.qv[j]) * (q.qv[j] - x.qv[j]))) AS BIGINT) AS dist_q
        FROM short s
        JOIN e x ON s.vec_id = x.vec_id
        JOIN qv0 q ON s.query_id = q.query_id)
      SELECT query_id, "rank", vec_id, dist_q FROM (
        SELECT query_id, vec_id, dist_q,
               row_number() OVER (PARTITION BY query_id ORDER BY dist_q, vec_id) AS "rank"
        FROM rer)
      WHERE "rank" <= 5
      ORDER BY query_id, "rank"
    """,

    // Same md5-derived weight vector as the Spark side (1-based dim
    // labels), same integer interaction score w·(q⊙d), same per-query
    // re-rank of the C=20 shortlist.
    "llm_rerank_cross" -> s"""
      WITH $ivfPqApproxCtes,
      short AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY adist_q, vec_id) AS rn
          FROM approx)
        WHERE rn <= 20),
      wv AS (
        SELECT list_transform(range(1, 65),
                 j -> (CAST('0x' || substr(md5('ce|' || CAST(j AS VARCHAR)), 1, 4) AS INT) % 2001) - 1000) AS w),
      scored AS (
        SELECT s.query_id, s.vec_id,
               CAST(list_sum(list_transform(range(1, 65),
                 j -> q.qv[j] * x.qv[j] * w[j])) AS BIGINT) AS ce_score
        FROM short s
        JOIN e x ON s.vec_id = x.vec_id
        JOIN qv0 q ON s.query_id = q.query_id
        CROSS JOIN wv)
      SELECT query_id, "rank", vec_id, ce_score FROM (
        SELECT query_id, vec_id, ce_score,
               row_number() OVER (PARTITION BY query_id ORDER BY ce_score DESC, vec_id) AS "rank"
        FROM scored)
      WHERE "rank" <= 5
      ORDER BY query_id, "rank"
    """,

    // Same panel, ground truth, and shortlist as llm_ann_recall; binary
    // relevance vs the exact top-5. log2 may differ from the JVM's by an
    // ulp — round6 absorbs it.
    "llm_retrieval_metrics" -> s"""
      WITH $ivfPqApproxCtes,
      pq AS (
        SELECT query_id, qv FROM (
          SELECT query_id, qv,
                 row_number() OVER (ORDER BY
                   CAST('0x' || substr(md5('panel|' || CAST(query_id AS VARCHAR)), 1, 15) AS BIGINT),
                   query_id) AS pr
          FROM qv0)
        WHERE pr <= 64),
      ar AS (
        SELECT query_id, vec_id, rn AS arank FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY adist_q, vec_id) AS rn
          FROM approx)
        WHERE rn <= 20),
      ex AS (
        SELECT q.query_id, x.vec_id,
               CAST(list_sum(list_transform(range(1, 65),
                 j -> (q.qv[j] - x.qv[j]) * (q.qv[j] - x.qv[j]))) AS BIGINT) AS dist_q
        FROM pq q CROSS JOIN e x
        WHERE q.query_id <> x.vec_id),
      gt AS (
        SELECT query_id, vec_id, grank FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY dist_q, vec_id) AS grank
          FROM ex)
        WHERE grank <= 5),
      j AS (
        SELECT gt.query_id, gt.grank, ar.arank
        FROM gt LEFT JOIN ar
          ON gt.query_id = ar.query_id AND gt.vec_id = ar.vec_id)
      SELECT query_id,
             ${round6sql("coalesce(1.0 / max(CASE WHEN grank = 1 THEN arank END), 0.0)")} AS mrr,
             ${round6sql("sum(CASE WHEN arank <= 5 THEN 1 ELSE 0 END) / 5.0")} AS recall5,
             ${round6sql("sum(CASE WHEN arank <= 20 THEN 1 ELSE 0 END) / 5.0")} AS recall20,
             ${round6sql(
               "sum(CASE WHEN arank <= 5 THEN 1.0 / log2(arank + 1) ELSE 0.0 END) / " +
               "(1.0/log2(2.0) + 1.0/log2(3.0) + 1.0/log2(4.0) + 1.0/log2(5.0) + 1.0/log2(6.0))")} AS ndcg5
      FROM j
      GROUP BY query_id
      ORDER BY query_id
    """,

    "llm_embed_near_dup" -> s"""
      WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv,
               ${signBucketSqlBits(12)} AS b0
        FROM embeddings),
      l AS (
        SELECT vec_id AS id_a, qv AS va, unnest(
          [b0, ${(0 until 12).map(i => s"xor(b0, ${1L << i})").mkString(", ")}]) AS bucket
        FROM e)
      SELECT id_a, id_b, bucket, dot_q FROM (
        SELECT l.id_a, e.vec_id AS id_b, e.b0 AS bucket,
               CAST(list_sum(list_transform(range(1, len(va) + 1), i -> va[i] * e.qv[i])) AS BIGINT) AS dot_q
        FROM l JOIN e ON l.bucket = e.b0 AND l.id_a < e.vec_id)
      WHERE dot_q >= 300000
      ORDER BY id_a, id_b
    """,

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

    // The phash is replayed from the DECODED pixel bytes: the BMP
    // header names the pixel-array offset (byte 10, LE) and dims
    // (18/22, LE); rows are bottom-up, 3 bytes BGR per pixel, padded
    // to 4 bytes — exactly the byte order imagePixelPHash reconstructs
    // from the javax.imageio decode (MultimodalCodecSpec pins the
    // layout against the real writer). A stubbed hash over container
    // bytes would mismatch on every row.
    "llm_multimodal_near_dup" -> s"""
      WITH hdrsrc AS (
        SELECT doc_id, hex(payload) AS hx
        FROM read_parquet('/tmp/graft_mm_bmp/__SF__/*.parquet')),
      hdr AS (
        SELECT doc_id, hx, ${hexLe32(10)} AS off0,
               ${hexLe32(18)} AS w, ${hexLe32(22)} AS h
        FROM hdrsrc),
      raw AS (
        SELECT doc_id, 3 * w * h AS n,
               list_transform(range(3 * w * h), i ->
                 ${hexByteAt("off0 + ((i // 3) // w) * (((3 * w + 3) // 4) * 4) + ((i // 3) % w) * 3 + (i % 3)")}) AS bytes
        FROM hdr),
      tot AS (SELECT doc_id, n, bytes, list_sum(bytes) AS total FROM raw),
      ph AS (SELECT doc_id, CAST($blockhashExpr AS BIGINT) AS phash FROM tot),
      ch AS (
        SELECT doc_id, phash, i AS ci, (phash >> (i * 8)) & 255 AS cv
        FROM ph, generate_series(0, 7) t(i)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.phash AS ph_a, b.phash AS ph_b
        FROM ch a JOIN ch b
          ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
      FROM pairs WHERE bit_count(xor(ph_a, ph_b)) <= 6
      ORDER BY doc_a, doc_b
    """,

    // Brute-force pairs + recursive-CTE min-label CC — both stages of
    // the Spark composition checked against ground truth at once.
    "llm_entity_canonical" -> """
      WITH RECURSIVE names AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS n_rows
        FROM part GROUP BY 1),
      e AS (
        SELECT a.p_name AS na, b.p_name AS nb
        FROM names a JOIN names b
          ON a.p_name < b.p_name
         AND abs(length(a.p_name) - length(b.p_name)) <= 1
         AND levenshtein(a.p_name, b.p_name) = 1),
      sym AS (
        SELECT na AS node, nb AS nbr FROM e
        UNION ALL SELECT nb, na FROM e),
      reach(node, label) AS (
        SELECT node, node FROM sym
        UNION
        SELECT s.node, r.label FROM sym s JOIN reach r ON s.nbr = r.node),
      cc AS (SELECT node, min(label) AS canonical FROM reach GROUP BY node)
      SELECT n.p_name, coalesce(cc.canonical, n.p_name) AS canonical,
             n.n_rows
      FROM names n LEFT JOIN cc ON n.p_name = cc.node
      ORDER BY p_name
    """,

    // Brute force: every pair sharing a shingle, exact intersection
    // counts, same integer micro-unit threshold — proves the prefix
    // filter lossless for the asymmetric measure.
    "llm_containment_join" -> s"""
      WITH aug AS (
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 40 = 1 AND p.text IS NOT NULL
                    THEN substr(p.text, 1, CAST((p.n_chars * 6) // 10 AS INT))
                    ELSE d.text END AS aug
        FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1),
      w AS (SELECT doc_id, string_split(aug, ' ') AS ws FROM aug),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
            THEN list_transform(range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
            ELSE [] END) AS s
          FROM w)),
      sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, sa.c AS ca, sb.c AS cb, inter,
             ${round6sql("inter / CAST(sa.c AS DOUBLE)")} AS containment
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE inter * 1000000 >= sa.c * 800000
      ORDER BY doc_a, doc_b
    """,

    // Same floored-integer centroid and exact integer dist2; threshold
    // via quantile_cont ≡ Spark percentile (X32 identity).
    "llm_prototypicality" -> s"""
      WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        FROM embeddings),
      x AS (
        SELECT vec_id, label, generate_subscripts(qv, 1) AS pos,
               unnest(qv) AS v
        FROM q),
      cs AS (
        SELECT label, pos, CAST(sum(v) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM x GROUP BY label, pos),
      cent AS (
        SELECT label, pos, n,
               CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) AS c
        FROM cs),
      d AS (
        SELECT x.vec_id, x.label, max(cent.n) AS n,
               CAST(sum((x.v - cent.c) * (x.v - cent.c)) AS BIGINT) AS dist2
        FROM x JOIN cent ON x.label = cent.label AND x.pos = cent.pos
        GROUP BY x.vec_id, x.label),
      t AS (
        SELECT label, quantile_cont(dist2, 0.1) AS thr FROM d GROUP BY label)
      SELECT d.vec_id, d.label, d.n AS n_label, d.dist2,
             floor(t.thr * 1000000.0 + 0.5) / 1000000.0 AS thr,
             CAST(CASE WHEN d.dist2 <= t.thr THEN 1 ELSE 0 END AS INT) AS prune
      FROM d JOIN t USING (label)
      ORDER BY vec_id
    """,

    // Same discounted-ratio spelling; the phrase flag cross-multiplies
    // RAKE replay: same runs, same once-floored micro word scores,
    // integer phrase sums, total top-k order
    // Weighted-MinHash replay: same virtual-element hashes, per-doc
    // bottom-16 as sorted distinct list prefix, 2 bands of 8, k-mins
    // estimate and exact capped-tf Jaccard on banded candidates.
    "llm_weighted_minhash" -> """
      WITH tf AS MATERIALIZED (
        SELECT doc, w, least(CAST(count(*) AS BIGINT), 4) AS tf
        FROM (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2),
      virt AS (
        SELECT doc,
               CAST('0x' || substr(md5('wmh|' || w || '|'
                 || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) AS h
        FROM (SELECT doc, w, unnest(range(1, tf + 1)) AS i FROM tf)),
      sig AS MATERIALIZED (
        SELECT doc, (list_sort(list_distinct(list(h))))[1:16] AS sig
        FROM virt GROUP BY doc),
      sig16 AS MATERIALIZED (SELECT doc, sig FROM sig WHERE len(sig) = 16),
      bands AS MATERIALIZED (
        SELECT doc, b,
               md5(CAST(b AS VARCHAR) || ','
                 || array_to_string(sig[b*8+1:b*8+8], ',')) AS key
        FROM sig16, unnest(range(0, 2)) AS t(b)),
      cand AS MATERIALIZED (
        SELECT DISTINCT a.doc AS doc_a, b2.doc AS doc_b
        FROM bands a JOIN bands b2
          ON a.b = b2.b AND a.key = b2.key AND a.doc < b2.doc),
      est AS MATERIALIZED (
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_filter(
                   (list_sort(list_distinct(sa.sig || sb.sig)))[1:16],
                   x -> list_contains(sa.sig, x)
                        AND list_contains(sb.sig, x)))
                 * 1000000 // 16 AS BIGINT) AS est_ppm
        FROM cand c
        JOIN sig16 sa ON sa.doc = c.doc_a
        JOIN sig16 sb ON sb.doc = c.doc_b),
      tot AS MATERIALIZED (
        SELECT doc, CAST(sum(tf) AS BIGINT) AS t FROM tf GROUP BY 1),
      ms AS MATERIALIZED (
        SELECT c.doc_a, c.doc_b,
               CAST(sum(least(ta.tf, tb.tf)) AS BIGINT) AS smin
        FROM cand c
        JOIN tf ta ON ta.doc = c.doc_a
        JOIN tf tb ON tb.doc = c.doc_b AND tb.w = ta.w
        GROUP BY 1, 2)
      SELECT e.doc_a, e.doc_b, e.est_ppm,
             CAST(coalesce(ms.smin, 0) * 1000000
               // (xa.t + xb.t - coalesce(ms.smin, 0)) AS BIGINT) AS jw_ppm
      FROM est e
      LEFT JOIN ms ON ms.doc_a = e.doc_a AND ms.doc_b = e.doc_b
      JOIN tot xa ON xa.doc = e.doc_a
      JOIN tot xb ON xb.doc = e.doc_b
      ORDER BY e.doc_a, e.doc_b
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

    // BWT replay: per doc, native list-sort of the suffix slices
    // (shorter-prefix-first — the SA's past-end sentinel order),
    // preceding word (or ^), lag run count.
    "llm_bwt_runs" -> s"""
      WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 25 = 0 THEN text || ' ' || text
                    ELSE text END AS text
        FROM documents),
      tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM aug),
      suf AS (
        SELECT doc_id, ws[CAST(i AS INTEGER):] AS s,
               CASE WHEN i > 1 THEN ws[CAST(i AS INTEGER) - 1]
                    ELSE '^' END AS bw
        FROM (SELECT doc_id, ws,
                     unnest(range(1, CAST(len(ws) AS BIGINT) + 1)) AS i
              FROM tok)),
      ord AS (
        SELECT doc_id, bw,
               lag(bw) OVER (PARTITION BY doc_id ORDER BY s) AS pbw
        FROM suf)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN pbw IS NULL OR pbw <> bw THEN 1 ELSE 0 END)
               AS BIGINT) AS bwt_runs,
             ${round6sql(
        "sum(CASE WHEN pbw IS NULL OR pbw <> bw THEN 1 ELSE 0 END)" +
        " / CAST(count(*) AS DOUBLE)")} AS run_ratio
      FROM ord GROUP BY doc_id
      ORDER BY doc_id
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

    // Replays exact DBSCAN over the shared simhash pair CTEs: degree
    // census, core filter, recursive-CTE CC restricted to core-core
    // edges, border argmin, all LEFT-joined back onto every doc.
    "llm_dbscan_dedup" -> s"""
      WITH RECURSIVE $dbscanCtes
      SELECT doc_id, n_neighbors, role, cluster_id
      FROM dbs ORDER BY doc_id
    """,

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

    // Replays the perturbed feed, the last-3 blocking join, the
    // smoothed m/u counts, and every ln-pair weight.
    "llm_record_linkage" -> {
      def lmuSql(x: String): String =
        s"CAST(floor(ln(CAST(($x) AS DOUBLE)) * 1000000.0) AS BIGINT)"
      val fields = Seq("name", "nat", "seg", "bal")
      val wCols = fields.map { f =>
        s"""CAST(sum(CASE WHEN truth AND g_$f THEN 1 ELSE 0 END) AS BIGINT) AS ma_$f,
               CAST(sum(CASE WHEN NOT truth AND g_$f THEN 1 ELSE 0 END) AS BIGINT) AS ua_$f"""
      }.mkString(",\n               ")
      val scoreExpr = fields.map { f =>
        s"""CASE WHEN g_$f
             THEN ${lmuSql(s"(ma_$f + 1) * (nu + 2)")}
                  - ${lmuSql(s"(nm + 2) * (ua_$f + 1)")}
             ELSE ${lmuSql(s"(nm - ma_$f + 1) * (nu + 2)")}
                  - ${lmuSql(s"(nm + 2) * (nu - ua_$f + 1)")} END"""
      }.mkString("\n           + ")
      val nAgree = fields.map(f => s"CASE WHEN g_$f THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH $linkageFeedCtes,
      c AS MATERIALIZED (
        SELECT f_key, m_key,
               (f_name = m_name) AS g_name,
               (f_nat = m_nat) AS g_nat,
               (f_seg = m_seg) AS g_seg,
               (floor(f_bal * 100 + 0.5) = floor(m_bal * 100 + 0.5))
                 AS g_bal,
               (f_key = m_key + 1000000) AS truth
        FROM f JOIN m ON right(f_name, 3) = right(m_name, 3)),
      w AS (
        SELECT CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS nm,
               CAST(sum(CASE WHEN truth THEN 0 ELSE 1 END) AS BIGINT) AS nu,
               $wCols
        FROM c),
      s AS (
        SELECT f_key, m_key, $nAgree AS n_agree,
           $scoreExpr AS score,
           truth
        FROM c CROSS JOIN w)
      SELECT f_key, m_key, CAST(n_agree AS INT) AS n_agree,
             CAST(score AS BIGINT) AS score_micro,
             CASE WHEN score >= 4000000 THEN 'link'
                  WHEN score >= 0 THEN 'possible'
                  ELSE 'nonlink' END AS verdict,
             truth AS is_match
      FROM s ORDER BY f_key, m_key
    """
    },

    // Unrolls all 5 EM rounds over the 16-row pattern table as
    // MATERIALIZED CTEs — the same micro/NANO fixed-point arithmetic
    // emFit runs, so parameters and posteriors match to the last unit.
    "llm_linkage_em" -> linkageEmOracleSql,

    // Replays both SN passes: the (keys…, id) total-order row_number,
    // the 5-forward-offset pair join, and the per-pass + union stats.
    "llm_sorted_neighborhood" -> s"""
      WITH $linkageFeedCtes,
      recs AS MATERIALIZED (
        SELECT m_key AS id, m_name AS name, m_nat AS nat, m_bal AS bal
        FROM m
        UNION ALL
        SELECT f_key, f_name, f_nat, f_bal FROM f),
      r1 AS MATERIALIZED (
        SELECT id, row_number() OVER (ORDER BY reverse(name), id) AS rn
        FROM recs),
      p1 AS MATERIALIZED (
        SELECT a.id AS id_a, b.id AS id_b
        FROM r1 a
        CROSS JOIN (VALUES (1), (2), (3), (4), (5)) o(k)
        JOIN r1 b ON b.rn = a.rn + o.k),
      r2 AS MATERIALIZED (
        SELECT id, row_number() OVER (ORDER BY nat,
          CAST(floor(bal * 100 + 0.5) AS BIGINT), id) AS rn
        FROM recs),
      p2 AS MATERIALIZED (
        SELECT a.id AS id_a, b.id AS id_b
        FROM r2 a
        CROSS JOIN (VALUES (1), (2), (3), (4), (5)) o(k)
        JOIN r2 b ON b.rn = a.rn + o.k),
      u AS (
        SELECT DISTINCT id_a, id_b FROM (
          SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_true_total FROM m),
      st AS (
        SELECT 'name_tail' AS pass,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(sum(CASE WHEN (id_a < 1000000) <> (id_b < 1000000)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_pairs,
               CAST(sum(CASE WHEN abs(id_a - id_b) = 1000000
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_true_captured
        FROM p1
        UNION ALL
        SELECT 'nation_balance',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN (id_a < 1000000) <> (id_b < 1000000)
                 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN abs(id_a - id_b) = 1000000
                 THEN 1 ELSE 0 END) AS BIGINT)
        FROM p2
        UNION ALL
        SELECT 'multi_pass',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN (id_a < 1000000) <> (id_b < 1000000)
                 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN abs(id_a - id_b) = 1000000
                 THEN 1 ELSE 0 END) AS BIGINT)
        FROM u)
      SELECT pass, n_candidates, n_cross_pairs, n_true_captured,
             n_true_total,
             (n_true_captured * 1000000) // n_true_total AS recall_micro
      FROM st CROSS JOIN tot
      ORDER BY pass
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

    // Replays BOTH detectors (the llm_near_dup and llm_dup_groups CTE
    // blocks side by side — no name collisions by construction) and
    // the Chapman arithmetic in HUGEINT.
    "llm_dedup_coverage" -> s"""
      WITH $shinglesCte,
      sigs AS (SELECT doc_id, $minhashSigs FROM expl GROUP BY doc_id),
      bands AS ($bandKeys),
      mcand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      sets AS (
        SELECT doc_id, list(s) AS ss, count(*) AS c
        FROM expl GROUP BY doc_id),
      mpairs AS (
        SELECT doc_a, doc_b FROM (
          SELECT doc_a, doc_b,
                 ${round6sql(
                   "len(list_intersect(x.ss, y.ss)) / CAST(x.c + y.c - len(list_intersect(x.ss, y.ss)) AS DOUBLE)")}
                   AS jaccard
          FROM mcand
          JOIN sets x ON doc_a = x.doc_id
          JOIN sets y ON doc_b = y.doc_id)
        WHERE jaccard >= 0.5),
      $simhashPairsCte,
      spairs AS (
        SELECT doc_a, doc_b FROM pairs
        WHERE bit_count(xor(sim_a, sim_b)) <= 3),
      m1 AS (SELECT DISTINCT d FROM (
        SELECT doc_a AS d FROM mpairs UNION ALL SELECT doc_b FROM mpairs)),
      m2 AS (SELECT DISTINCT d FROM (
        SELECT doc_a AS d FROM spairs UNION ALL SELECT doc_b FROM spairs)),
      st AS (
        SELECT CAST((SELECT count(*) FROM m1) AS BIGINT) AS n1,
               CAST((SELECT count(*) FROM m2) AS BIGINT) AS n2,
               CAST((SELECT count(*) FROM m1 JOIN m2 USING (d))
                 AS BIGINT) AS overlap,
               CAST((SELECT count(*) FROM
                 (SELECT d FROM m1 UNION SELECT d FROM m2)) AS BIGINT)
                 AS n_union)
      SELECT n1, n2, overlap, n_union,
             CAST((CAST(n1 + 1 AS HUGEINT) * (n2 + 1)) // (overlap + 1) - 1
               AS BIGINT) AS chapman_est,
             CAST(greatest(
               (CAST(n1 + 1 AS HUGEINT) * (n2 + 1)) // (overlap + 1) - 1
                 - n_union, 0) AS BIGINT) AS est_missed
      FROM st
    """,

    // Unrolls 6 MATERIALIZED min-plus rounds over the same projected
    // edge list; monotonicity makes surplus rounds no-ops (too few
    // would fail the hash loudly).
    "llm_graph_sssp" -> {
      val rounds = (1 to 6).map { r =>
        val prev = s"d${r - 1}"
        s"""      d$r AS MATERIALIZED (
        SELECT n, min(dist) AS dist FROM (
          SELECT n, dist FROM $prev
          UNION ALL
          SELECT e.b AS n, $prev.dist + e.w AS dist
          FROM sym e JOIN $prev ON e.a = $prev.n)
        GROUP BY n)"""
      }.mkString(",\n")
      s"""
      WITH rel AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      bcap AS (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5),
      edges AS (
        SELECT x.i AS ia, y.i AS ib,
               1000000 // CAST(count(*) AS BIGINT) AS w
        FROM bcap x JOIN bcap y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      sym AS (
        SELECT ia AS a, ib AS b, w FROM edges
        UNION ALL
        SELECT ib AS a, ia AS b, w FROM edges),
      d0 AS (
        SELECT DISTINCT p_partkey AS n, CAST(0 AS BIGINT) AS dist
        FROM part WHERE p_partkey % 100 = 0),
$rounds
      SELECT n, CAST(dist AS BIGINT) AS dist FROM d6 ORDER BY n
    """
    },

    // Replays the capped projection, the md5 seed set, 4 forward BFS
    // levels with exact σ path counts, and the backward dependency
    // accumulation with per-edge micro quantization — every level a
    // MATERIALIZED CTE (each feeds the next level AND the vis union).
    "llm_graph_betweenness" -> {
      val lmax = 4
      val fwd = (1 to lmax).map { l =>
        s"""f$l AS MATERIALIZED (
        SELECT src, n, $l AS d, CAST(sum(sigma) AS BIGINT) AS sigma FROM (
          SELECT f.src, e.b AS n, f.sigma
          FROM f${l - 1} f JOIN sym e ON e.a = f.n) t
        WHERE NOT EXISTS (SELECT 1 FROM v${l - 1} v
                          WHERE v.src = t.src AND v.n = t.n)
        GROUP BY src, n),
      v$l AS MATERIALIZED (
        SELECT * FROM v${l - 1} UNION ALL SELECT * FROM f$l)"""
      }.mkString(",\n      ")
      val bwd = ((lmax - 1) to 0 by -1).map { l =>
        s"""b$l AS MATERIALIZED (
        SELECT a.src, a.v AS n,
               CAST(sum((CAST(a.sv AS HUGEINT)
                 * (1000000 + coalesce(d2.delta, 0))) // a.sw)
                 AS BIGINT) AS delta
        FROM adj a LEFT JOIN dall${l + 1} d2
          ON d2.src = a.src AND d2.n = a.w
        WHERE a.dv = $l
        GROUP BY 1, 2),
      dall$l AS MATERIALIZED (
        SELECT * FROM dall${l + 1} UNION ALL SELECT * FROM b$l)"""
      }.mkString(",\n      ")
      s"""
      WITH rel AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      bcap AS (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5),
      pedges AS (
        SELECT x.i AS ia, y.i AS ib
        FROM bcap x JOIN bcap y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      sym AS (
        SELECT ia AS a, ib AS b FROM pedges
        UNION ALL
        SELECT ib AS a, ia AS b FROM pedges),
      f0 AS (
        SELECT DISTINCT p_partkey AS src, p_partkey AS n, 0 AS d,
               CAST(1 AS BIGINT) AS sigma
        FROM part WHERE p_partkey % 100 = 0),
      v0 AS (SELECT * FROM f0),
      $fwd,
      adj AS MATERIALIZED (
        SELECT a.src, a.n AS v, a.d AS dv, a.sigma AS sv,
               w.n AS w, w.sigma AS sw
        FROM v$lmax a
        JOIN sym e ON e.a = a.n
        JOIN v$lmax w ON w.src = a.src AND w.n = e.b AND w.d = a.d + 1),
      dall$lmax AS (
        SELECT src, n, CAST(0 AS BIGINT) AS delta FROM v$lmax WHERE 1 = 0),
      $bwd
      SELECT node, bc_micro FROM (
        SELECT n AS node, CAST(sum(delta) AS BIGINT) AS bc_micro
        FROM dall0 WHERE n <> src GROUP BY 1)
      ORDER BY bc_micro DESC, node
      LIMIT 20
    """
    },

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

    // Replays the window-2 co-occurrence graph and the SAME 3
    // nano-unit rounds through the shared pageRankCtes block (the
    // llm_graph_rank oracle's CTE contract: nodes/n/e/outd/r0).
    "llm_textrank" -> {
      val stopSql = stopwords.map(w => s"'$w'").mkString(", ")
      s"""
      WITH tok AS (
        SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents),
      prs AS (
        SELECT doc, w,
               lead(w, 1) OVER (PARTITION BY doc ORDER BY pos) AS n1,
               lead(w, 2) OVER (PARTITION BY doc ORDER BY pos) AS n2
        FROM tok),
      half AS (
        SELECT src, dst FROM (
          SELECT w AS src, n1 AS dst FROM prs
          UNION ALL
          SELECT w AS src, n2 AS dst FROM prs)
        WHERE dst IS NOT NULL AND src <> dst
          AND src NOT IN ($stopSql) AND src <> ''
          AND dst NOT IN ($stopSql) AND dst <> ''),
      e AS MATERIALIZED (
        SELECT src, dst FROM half
        UNION ALL
        SELECT dst AS src, src AS dst FROM half),
      nodes AS (
        SELECT DISTINCT w AS id FROM tok
        WHERE w NOT IN ($stopSql) AND w <> ''),
      n AS (SELECT count(*) AS nn FROM nodes),
      outd AS (SELECT src, count(*) AS od FROM e GROUP BY src),
      r0 AS (
        SELECT id, CAST(1000000000 AS BIGINT) // (SELECT nn FROM n) AS rank
        FROM nodes),
      ${pageRankCtes(3)}
      SELECT id AS word, CAST(rank AS BIGINT) AS rank_nano,
             ${round6sql("rank / 1000000000.0")} AS rank
      FROM r3 ORDER BY rank_nano DESC, word LIMIT 25
    """
    },

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

    "llm_graph_ppr" -> s"""
      WITH nodes AS (SELECT doc_id AS id FROM documents),
      st AS (
        SELECT id, CASE WHEN id % 50 = 0 THEN 1 ELSE 0 END AS is_seed
        FROM nodes),
      ns AS (SELECT CAST(count(*) AS BIGINT) AS n_seeds
             FROM st WHERE is_seed = 1),
      e AS (
        SELECT id AS src, id - (id % 10) AS dst FROM nodes WHERE id % 10 <> 0
        UNION ALL
        SELECT id AS src, 0 AS dst FROM nodes WHERE id % 10 = 0 AND id <> 0
        UNION ALL
        SELECT id AS src, id + 1 AS dst FROM nodes WHERE id % 10 = 0 AND id <> 0),
      outd AS (SELECT src, count(*) AS od FROM e GROUP BY src),
      r0 AS (
        SELECT id, CASE WHEN is_seed = 1
                        THEN CAST(1000000000 AS BIGINT)
                             // (SELECT n_seeds FROM ns)
                        ELSE 0 END AS rank
        FROM st),
      ${pprCtes(3)}
      SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank_nano,
             ${round6sql("rank / 1000000000.0")} AS rank
      FROM r3 ORDER BY doc_id
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

    "llm_ab_mannwhitney" -> s"""
      WITH hist AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
               sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
               sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY 1),
      ranked AS (
        SELECT n0, n1, n0 + n1 AS t,
               coalesce(sum(n0 + n1) OVER (ORDER BY c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS below
        FROM hist),
      m AS (
        SELECT CAST(sum(n0) AS BIGINT) AS na, CAST(sum(n1) AS BIGINT) AS nb,
               sum(CAST(n1 AS HUGEINT) * (2 * below + t + 1)) AS r1_x2,
               sum(CAST(t AS HUGEINT) * t * t - t) AS ties
        FROM ranked)
      SELECT na, nb,
             CAST(r1_x2 - CAST(nb AS HUGEINT) * (nb + 1) AS BIGINT) AS u1_x2,
             CAST(ties AS BIGINT) AS tie_sum,
             ${round6sql(
               "(CAST(r1_x2 - CAST(nb AS HUGEINT) * (nb + 1) AS DOUBLE)" +
               " - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))" +
               " / (2.0 * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0" +
               " * (CAST(na + nb + 1 AS DOUBLE) - CAST(ties AS DOUBLE)" +
               " / (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE)))))")}
               AS z
      FROM m
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

    "llm_spec_accept" -> """
      WITH tok AS (
        SELECT doc_id, source, generate_subscripts(ws, 1) AS pos,
               unnest(ws) AS w
        FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
              FROM documents)),
      big AS MATERIALIZED (
        SELECT source, prev, w FROM (
          SELECT source, w,
                 lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
          FROM tok)
        WHERE prev IS NOT NULL),
      draft AS (
        SELECT prev, w AS guess FROM (
          SELECT prev, w, row_number() OVER (PARTITION BY prev
                   ORDER BY count(*) DESC, w) AS rn
          FROM big GROUP BY prev, w)
        WHERE rn = 1)
      SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(CASE WHEN w = guess THEN 1 ELSE 0 END) AS BIGINT)
               AS n_accepted,
             CAST((sum(CASE WHEN w = guess THEN 1 ELSE 0 END) * 1000000)
                  // count(*) AS BIGINT) AS accept_micro
      FROM big JOIN draft USING (prev)
      GROUP BY source ORDER BY source
    """,

    "llm_best_of_n" -> bestOfNOracleSql,

    "llm_rank_rbo" -> rankRboOracleSql,

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

    "llm_anisotropy" -> s"""
      WITH $embedQvCte,
      bkt AS (
        SELECT vec_id, qv,
               CAST('0x' || substr(md5('ani|' || CAST(vec_id AS VARCHAR)),
                 1, 6) AS BIGINT) % 4096 AS b
        FROM e),
      prs AS MATERIALIZED (
        SELECT qv, qv2 FROM (
          SELECT qv,
                 lead(qv) OVER (PARTITION BY b ORDER BY vec_id) AS qv2,
                 row_number() OVER (PARTITION BY b ORDER BY vec_id) AS rn
          FROM bkt)
        WHERE rn % 2 = 1 AND qv2 IS NOT NULL),
      dots AS (
        SELECT CAST(list_sum(list_transform(range(1, len(qv) + 1),
                 i -> qv[i] * qv[i])) AS BIGINT) AS aa,
               CAST(list_sum(list_transform(range(1, len(qv2) + 1),
                 i -> qv2[i] * qv2[i])) AS BIGINT) AS bb,
               CAST(list_sum(list_transform(range(1, len(qv) + 1),
                 i -> qv[i] * qv2[i])) AS BIGINT) AS ab
        FROM prs),
      rt AS (
        SELECT ab,
               CAST(floor(sqrt(CAST(aa AS DOUBLE))) AS BIGINT) AS sa0,
               CAST(floor(sqrt(CAST(bb AS DOUBLE))) AS BIGINT) AS sb0,
               aa, bb
        FROM dots),
      rt1 AS (
        SELECT ab,
               CASE WHEN (sa0 + 1) * (sa0 + 1) <= aa THEN sa0 + 1
                    ELSE sa0 END AS sa1,
               CASE WHEN (sb0 + 1) * (sb0 + 1) <= bb THEN sb0 + 1
                    ELSE sb0 END AS sb1,
               aa, bb
        FROM rt),
      cosmic AS (
        SELECT (ab * 1000000)
                 // greatest((CASE WHEN sa1 * sa1 > aa THEN sa1 - 1
                                   ELSE sa1 END)
                           * (CASE WHEN sb1 * sb1 > bb THEN sb1 - 1
                                   ELSE sb1 END), 1) AS c
        FROM rt1)
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(c) // count(*) AS BIGINT) AS mean_cos_micro,
             CAST((sum(CASE WHEN c > 500000 THEN 1 ELSE 0 END) * 1000000)
                  // count(*) AS BIGINT) AS frac_above_half_micro
      FROM cosmic
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

    "llm_moran_grid" -> """
      WITH pts AS (
        SELECT CAST(floor(embedding[1] * 10.0) AS BIGINT) AS cx,
               CAST(floor(embedding[2] * 10.0) AS BIGINT) AS cy
        FROM embeddings),
      occ AS (SELECT cx, cy, count(*) AS c FROM pts GROUP BY 1, 2),
      b AS (SELECT min(cx) AS x0, max(cx) AS x1,
                   min(cy) AS y0, max(cy) AS y1 FROM occ),
      gx AS (SELECT unnest(range(x0, x1 + 1)) AS cx FROM b),
      gy AS (SELECT unnest(range(y0, y1 + 1)) AS cy FROM b),
      spine AS (
        SELECT gx.cx, gy.cy, b.x0, b.x1, b.y0, b.y1
        FROM gx CROSS JOIN gy, b),
      cells AS MATERIALIZED (
        SELECT s.cx, s.cy, coalesce(o.c, 0) AS x,
               (CASE WHEN s.cx > s.x0 THEN 1 ELSE 0 END
                + CASE WHEN s.cx < s.x1 THEN 1 ELSE 0 END
                + CASE WHEN s.cy > s.y0 THEN 1 ELSE 0 END
                + CASE WHEN s.cy < s.y1 THEN 1 ELSE 0 END) AS deg
        FROM spine s LEFT JOIN occ o ON o.cx = s.cx AND o.cy = s.cy),
      m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s,
               CAST(sum(deg) AS HUGEINT) AS w,
               sum(CAST(deg AS HUGEINT) * deg) AS sdeg2
        FROM cells),
      z AS MATERIALIZED (
        SELECT cx, cy, m.n * x - m.s AS z FROM cells, m),
      rp AS (SELECT coalesce(sum(a.z * c.z), 0) AS p
             FROM z a JOIN z c ON c.cx = a.cx + 1 AND c.cy = a.cy),
      up AS (SELECT coalesce(sum(a.z * c.z), 0) AS p
             FROM z a JOIN z c ON c.cx = a.cx AND c.cy = a.cy + 1),
      adj AS (SELECT 2 * (rp.p + up.p) AS sumadj FROM rp, up),
      sz AS (SELECT coalesce(sum(z * z), 0) AS sz2 FROM z),
      f AS (
        SELECT m.n, m.w, sz.sz2,
               CASE WHEN sz.sz2 > 0 AND m.w > 0
                    THEN (m.n * adj.sumadj * 1000000) // (m.w * sz.sz2)
                    ELSE 0 END AS i_micro,
               CASE WHEN m.n > 1 THEN -(1000000 // (m.n - 1))
                    ELSE 0 END AS e_micro,
               CASE WHEN m.n > 1 AND m.w > 0
                    THEN ((2 * m.n * m.n * m.w - 4 * m.n * m.sdeg2
                           + 3 * m.w * m.w) * 1000000)
                         // (m.w * m.w * (m.n * m.n - 1))
                         - (1000000 // ((m.n - 1) * (m.n - 1)))
                    ELSE 0 END AS var_micro
        FROM m, adj, sz)
      SELECT CAST(n AS BIGINT) AS n_cells, CAST(w AS BIGINT) AS w_pairs,
             CAST(i_micro AS BIGINT) AS i_micro,
             CAST(e_micro AS BIGINT) AS e_micro,
             CAST(var_micro AS BIGINT) AS var_micro,
             (sz2 > 0 AND var_micro > 0 AND
              (i_micro - e_micro) * (i_micro - e_micro)
                >= CAST(3841458 AS HUGEINT) * var_micro) AS reject_05
      FROM f
    """,

    "llm_grid_join" -> """
      WITH p AS (
        SELECT vec_id AS id,
               CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS x,
               CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS y
        FROM embeddings)
      SELECT a.id AS id_a, b.id AS id_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
      FROM p a JOIN p b ON a.id < b.id
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 1600
      ORDER BY id_a, id_b
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

    "llm_novelty" -> s"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
      sh AS (
        SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
          THEN list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
          ELSE [] END) AS s
        FROM w),
      cs AS (
        SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 2 = 1),
      rs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
      totals AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
        FROM cs GROUP BY 1),
      novel AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel
        FROM cs ANTI JOIN rs USING (s) GROUP BY doc_id)
      SELECT t.doc_id, t.n_shingles, coalesce(v.n_novel, 0) AS n_novel,
             ${round6sql("CAST(coalesce(v.n_novel, 0) AS DOUBLE)" +
               " / CAST(t.n_shingles AS DOUBLE)")} AS novelty
      FROM totals t LEFT JOIN novel v USING (doc_id)
      ORDER BY t.doc_id
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

    "llm_blast_radius" -> {
      val rounds = (1 to 3).map { i =>
        val prevReached = (0 until i).map(j => s"SELECT n FROM r$j")
          .mkString(" UNION ")
        s"""f$i AS MATERIALIZED (
             SELECT DISTINCT n FROM (
               SELECT e.item_b AS n FROM e JOIN r${i - 1} p ON e.item_a = p.n
               UNION ALL
               SELECT e.item_a FROM e JOIN r${i - 1} p ON e.item_b = p.n)
             WHERE n NOT IN ($prevReached)),
           r$i AS MATERIALIZED (SELECT n FROM f$i)"""
      }.mkString(",\n      ")
      s"""
      WITH rel AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      capped AS MATERIALIZED (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5),
      e AS MATERIALIZED (
        SELECT x.i AS item_a, y.i AS item_b
        FROM capped x JOIN capped y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      nodes AS MATERIALIZED (
        SELECT DISTINCT n FROM (
          SELECT item_a AS n FROM e UNION ALL SELECT item_b FROM e)),
      r0 AS MATERIALIZED (SELECT n FROM nodes WHERE n % 97 = 0),
      $rounds
      SELECT n, hop FROM (
        SELECT n, 0 AS hop FROM r0
        UNION ALL SELECT n, 1 FROM f1
        UNION ALL SELECT n, 2 FROM f2
        UNION ALL SELECT n, 3 FROM f3)
      ORDER BY n
    """
    },

    "llm_user_journeys" -> """
      WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked),
      paths AS (
        SELECT user_id, sess_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sess GROUP BY user_id, sess_id)
      SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      FROM paths
      GROUP BY path
      ORDER BY n_sessions DESC, path
      LIMIT 25
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

    // Replays the X148 projection, the cap-12 neighbor ranking, the
    // wedge join, the anti-join against existing edges, and the
    // integer-micro AA weights.
    "llm_link_predict" -> s"""
      WITH rel AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      bcap AS (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5),
      edges AS (
        SELECT x.i AS item_a, y.i AS item_b,
               CAST(count(*) AS BIGINT) AS weight
        FROM bcap x JOIN bcap y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      adj AS (
        SELECT item_a AS ctr, item_b AS nbr, weight FROM edges
        UNION ALL
        SELECT item_b AS ctr, item_a AS nbr, weight FROM edges),
      capped AS (
        SELECT ctr, nbr FROM (
          SELECT ctr, nbr, row_number() OVER (PARTITION BY ctr
                   ORDER BY weight DESC, nbr) AS r
          FROM adj)
        WHERE r <= 12),
      deg_aa AS (
        SELECT ctr, 1000000000000 //
                 CAST(floor(ln(count(*)) * 1000000) AS BIGINT) AS aa_c
        FROM capped GROUP BY ctr
        HAVING count(*) >= 2),
      rdeg AS (
        SELECT nbr AS node, CAST(count(*) AS BIGINT) AS rd
        FROM capped GROUP BY 1),
      cand AS (
        SELECT x.nbr AS a, y.nbr AS b,
               CAST(count(*) AS BIGINT) AS cn,
               CAST(sum(d.aa_c) AS BIGINT) AS aa_micro
        FROM capped x
        JOIN capped y ON x.ctr = y.ctr AND x.nbr < y.nbr
        JOIN deg_aa d ON d.ctr = x.ctr
        GROUP BY 1, 2),
      nonadj AS (
        SELECT c.* FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM edges e
                          WHERE e.item_a = c.a AND e.item_b = c.b))
      SELECT n.a AS item_a, n.b AS item_b, n.cn, n.aa_micro,
             ra.rd AS rdeg_a, rb.rd AS rdeg_b,
             ${round6sql(
               "CAST(n.cn AS DOUBLE) / (ra.rd + rb.rd - n.cn)")} AS jaccard
      FROM nonadj n
      JOIN rdeg ra ON ra.node = n.a
      JOIN rdeg rb ON rb.node = n.b
      ORDER BY n.cn DESC, n.aa_micro DESC, item_a, item_b
      LIMIT 50
    """,

    "llm_coorder_graph" -> """
      WITH rel AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      capped AS (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5)
      SELECT x.i AS item_a, y.i AS item_b,
             CAST(count(*) AS BIGINT) AS weight
      FROM capped x JOIN capped y ON x.b = y.b AND x.i < y.i
      GROUP BY 1, 2
      HAVING count(*) >= 2
      ORDER BY item_a, item_b
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

    "llm_graph_kcore" -> {
      // AS MATERIALIZED is load-bearing: each round references the
      // previous one three times, so default CTE inlining would expand
      // the chain exponentially (observed as fd exhaustion on the base
      // parquet scan).
      val rounds = (1 to 30).map { i =>
        s"""k$i AS MATERIALIZED (
             SELECT n FROM (SELECT a AS n FROM e${i - 1}
                            UNION ALL SELECT b FROM e${i - 1})
             GROUP BY n HAVING count(*) >= 2),
           e$i AS MATERIALIZED (
             SELECT a, b FROM e${i - 1}
             WHERE a IN (SELECT n FROM k$i) AND b IN (SELECT n FROM k$i))"""
      }.mkString(",\n      ")
      s"""
      WITH e0 AS MATERIALIZED (
        SELECT DISTINCT l_orderkey * 2 AS a, l_partkey * 2 + 1 AS b
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
          AND l_quantity < 8),
      $rounds
      SELECT n, CAST(count(*) AS BIGINT) AS core_deg
      FROM (SELECT a AS n FROM e30 UNION ALL SELECT b FROM e30)
      GROUP BY n
      ORDER BY n
    """
    },

    "llm_minhash_overlap" -> s"""
      WITH wdocs AS (
        SELECT source AS src, string_split(text, ' ') AS ws FROM documents),
      shing AS (
        SELECT src,
               CASE WHEN len(ws) >= 3
                    THEN list_transform(range(1, len(ws) - 1),
                                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                    ELSE [] END AS shs
        FROM wdocs),
      expl AS (SELECT src, unnest(shs) AS s FROM shing),
      based AS (
        SELECT src,
               CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 1073741824
                 AS h
        FROM expl),
      hashed AS (
        SELECT e.src, sl.range AS slot,
               (((2654435761 * (sl.range + 1)) % 536870912) * 2 + 1) * e.h
                 + ((40503 * (sl.range + 1)) % 1073741824) AS hraw
        FROM based e CROSS JOIN range(32) sl),
      sk AS (
        SELECT src, CAST(slot AS INT) AS slot,
               min(hraw % 1073741789) AS mh
        FROM hashed GROUP BY 1, 2)
      SELECT a.src AS src_a, b.src AS src_b, 32 AS k,
             CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
               AS n_match,
             ${round6sql(
        "CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)" +
          " / CAST(32 AS DOUBLE)")} AS j_est
      FROM sk a JOIN sk b ON a.slot = b.slot AND a.src < b.src
      GROUP BY a.src, b.src
      ORDER BY src_a, src_b
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

    // Width/height re-derived from the PNG CONTAINER (IHDR, big-endian
    // at bytes 16/20) while Spark reports the REAL codec's decoded
    // pixel dims; byte_len/byte_sum re-derived from the hex of the
    // SAME parquet blobs Spark decoded — a stub masquerading as a
    // decode, or a writer/reader byte slip, hash-mismatches.
    "llm_multimodal_meta" -> s"""
      WITH raw AS (
        SELECT doc_id, hex(payload) AS hx, octet_length(payload) AS nb
        FROM read_parquet('/tmp/graft_mm_png/__SF__/*.parquet'))
      SELECT doc_id,
             CAST(nb AS INT) AS byte_len,
             CAST(list_sum(list_transform(range(nb), i ->
               ${hexByteAt("i")})) AS BIGINT) AS byte_sum,
             CAST(${hexBe32("33")} AS INT) AS width,
             CAST(${hexBe32("41")} AS INT) AS height,
             CAST(1 AS INT) AS frames
      FROM raw
      ORDER BY doc_id
    """,

    // The k17 recursive container walk over the per-document video
    // corpus, plus the fit-24 resize and stride-2 sample arithmetic —
    // dims from each frame's IHDR, md5 over each frame's hex, the
    // frame-data-fits stop condition mirroring the Spark walker.
    "llm_multimodal_frames" -> s"""
      WITH RECURSIVE raw AS (
        SELECT doc_id, hex(payload) AS hx, octet_length(payload) AS nb
        FROM read_parquet('/tmp/graft_mm_vid/__SF__/*.parquet')),
      fr AS (
        SELECT doc_id, 0 AS frame_no, 0 AS off,
               ${hexBe32("1")} AS flen, hx, nb
        FROM raw
        UNION ALL
        SELECT doc_id, frame_no + 1, off + 4 + flen,
               ${hexBe32("(off + 4 + flen) * 2 + 1")}, hx, nb
        FROM fr WHERE off + 4 + flen + 4 <= nb),
      meta AS (
        SELECT doc_id, frame_no, flen AS n_bytes,
               ${hexBe32("(off + 4 + 16) * 2 + 1")} AS w0,
               ${hexBe32("(off + 4 + 20) * 2 + 1")} AS h0,
               md5(substr(hx, (off + 4) * 2 + 1, flen * 2)) AS frame_md5
        FROM fr WHERE off + 4 + flen <= nb)
      SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_idx, n_bytes,
             CASE WHEN greatest(w0, h0) <= 24 THEN w0
                  ELSE greatest(1, (w0 * 24) // greatest(w0, h0))
             END AS width,
             CASE WHEN greatest(w0, h0) <= 24 THEN h0
                  ELSE greatest(1, (h0 * 24) // greatest(w0, h0))
             END AS height,
             frame_md5
      FROM meta
      WHERE frame_no % 2 = 0
      ORDER BY doc_id, frame_idx
    """,

    // 6 unrolled Hilbert fold levels (s = 32..1): quadrant bits pick
    // the sub-curve, the frame rotates/flips, d accumulates s^2 steps.
    "llm_hilbert_layout" -> {
      val zexpr = (0 until 6).flatMap(i => Seq(
        s"(((x >> $i) & 1) << ${2 * i})",
        s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      val levels = (0 until 6).map { k =>
        val s = 1L << (5 - k)
        s"""hb${k + 1} AS (
        SELECT event_id, x0, y0,
               CASE WHEN ry = 0
                    THEN (CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END)
                    ELSE x END AS x,
               CASE WHEN ry = 0
                    THEN (CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END)
                    ELSE y END AS y,
               d + ${s * s} * xor(3 * rx, ry) AS d
        FROM (SELECT event_id, x0, y0, x, y, d,
                     CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
                     CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
              FROM hb$k))"""
      }.mkString(",\n      ")
      s"""
      WITH ev AS (
        SELECT CAST(user_id % 64 AS INT) AS x,
               CAST(event_id % 64 AS INT) AS y, event_id
        FROM events),
      hb0 AS (
        SELECT event_id, x AS x0, y AS y0,
               CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
               CAST(0 AS BIGINT) AS d
        FROM ev),
      $levels,
      assigned AS (
        SELECT x0 AS x, y0 AS y, 'hilbert' AS layout,
               CAST(d // 256 AS BIGINT) AS file
        FROM hb6
        UNION ALL
        SELECT x, y, 'zorder' AS layout,
               CAST(($zexpr) // 256 AS BIGINT) AS file
        FROM ev)
      SELECT layout, file AS file_id, CAST(count(*) AS BIGINT) AS n_rows,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y,
             (min(x) <= 15 AND max(x) >= 8 AND
              min(y) <= 31 AND max(y) >= 16) AS scan_needed
      FROM assigned GROUP BY layout, file ORDER BY layout, file
    """
    },

    "llm_zorder_layout" -> {
      val zexpr = (0 until 6).flatMap(i => Seq(
        s"(((x >> $i) & 1) << ${2 * i})",
        s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""
      WITH ev AS (
        SELECT CAST(user_id % 64 AS INT) AS x,
               CAST(event_id % 64 AS INT) AS y, event_id
        FROM events),
      assigned AS (
        SELECT x, y, 'zorder' AS layout,
               CAST(($zexpr) // 256 AS BIGINT) AS file
        FROM ev
        UNION ALL
        SELECT x, y, 'ingest' AS layout,
               CAST(event_id % 16 AS BIGINT) AS file
        FROM ev)
      SELECT layout, file AS file_id, CAST(count(*) AS BIGINT) AS n_rows,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y,
             (min(x) <= 15 AND max(x) >= 8 AND
              min(y) <= 31 AND max(y) >= 16) AS scan_needed
      FROM assigned GROUP BY layout, file ORDER BY layout, file
    """
    },

    "llm_url_dedup" -> s"""
      WITH u AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
          || '://WWW.' || source || '.Example.COM'
          || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
          || '/docs/' || CAST(doc_id % 50 AS VARCHAR)
          || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed'
                   WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 50 AS VARCHAR) || '&utm_campaign=x'
                   ELSE '?id=' || CAST(doc_id % 50 AS VARCHAR) END)
          || (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
        FROM documents),
      parts AS (
        SELECT doc_id, url,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
          lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host,
          regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$$', 1) AS rest
        FROM u),
      canon AS (
        SELECT doc_id, CASE
          WHEN NOT regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN url
          ELSE scheme ||
          '://' ||
          (CASE WHEN scheme = 'https' THEN regexp_replace(host, ':443$$', '')
                WHEN scheme = 'http'  THEN regexp_replace(host, ':80$$', '')
                ELSE host END) ||
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            rest, '#.*$$', ''),
            '\\?utm_[A-Za-z0-9_]*=[^&#]*&', '?'),
            '\\?utm_[A-Za-z0-9_]*=[^&#]*$$', ''),
            '&utm_[A-Za-z0-9_]*=[^&#]*', ''),
            '\\?$$', '') END AS canonical_url
        FROM parts)
      SELECT min(doc_id) AS doc_id, canonical_url,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM canon GROUP BY canonical_url ORDER BY doc_id
    """,

    // Same md5-parity sign matrix, reduced the relational way (unnest +
    // equi-join on dim + group-by) — proves the plan-literal Spark
    // spelling computes the identical exact-integer projection.
    "llm_random_projection" -> """
      WITH sgn AS (
        SELECT d.range AS d, o.range AS o,
               CASE WHEN CAST('0x' || substr(md5(CAST(d.range AS VARCHAR)
                         || '|' || CAST(o.range AS VARCHAR)), 1, 1) AS INT)
                         % 2 = 0
                    THEN 1 ELSE -1 END AS g
        FROM range(64) d, range(8) o),
      e AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
        FROM embeddings WHERE len(embedding) = 64)
      SELECT e.vec_id, CAST(s.o AS INT) AS out_dim,
             CAST(sum(e.q * s.g) AS BIGINT) AS value
      FROM e JOIN sgn s ON e.d = s.d
      GROUP BY 1, 2
      ORDER BY vec_id, out_dim
    """,

    "llm_int8_codec" -> """
      WITH e AS (
        SELECT list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        FROM embeddings),
      x AS (
        SELECT generate_subscripts(qv, 1) - 1 AS dim, unnest(qv) AS q FROM e),
      st AS (
        SELECT dim, min(q) AS mn, max(q) AS mx FROM x GROUP BY dim),
      enc AS (
        SELECT x.dim, x.q, st.mn, st.mx, (st.mx - st.mn) AS rng,
               CASE WHEN st.mx = st.mn THEN 0
                    ELSE (2 * (x.q - st.mn) * 255 + (st.mx - st.mn))
                         // (2 * (st.mx - st.mn)) END AS q8
        FROM x JOIN st USING (dim)),
      dec AS (
        SELECT dim, q, mn, mx,
               CASE WHEN rng = 0 THEN mn
                    ELSE mn + (2 * q8 * rng + 255) // (2 * 255) END AS d
        FROM enc)
      SELECT CAST(dim AS INT) AS dim, CAST(count(*) AS BIGINT) AS n,
             mn AS min_q, mx AS max_q,
             CAST(max(abs(q - d)) AS BIGINT) AS max_err_mu,
             CAST(sum(abs(q - d)) AS BIGINT) AS sum_err_mu
      FROM dec GROUP BY dim, mn, mx ORDER BY dim
    """,

    "llm_embed_stats" -> s"""
      WITH e AS (
        SELECT list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        FROM embeddings),
      x AS (
        SELECT generate_subscripts(qv, 1) - 1 AS dim, unnest(qv) AS q FROM e),
      st AS (
        SELECT CAST(dim AS INT) AS dim, CAST(count(*) AS BIGINT) AS n,
               min(q) AS min_q, max(q) AS max_q,
               CAST(sum(q) AS BIGINT) AS sum_q,
               CAST(sum(q * q) AS BIGINT) AS sumsq_q
        FROM x GROUP BY dim)
      SELECT dim, n, min_q, max_q, sum_q, sumsq_q,
             ${round6sql("CAST(sum_q AS DOUBLE) / n")} AS mean_q,
             ${round6sql("CAST(sumsq_q AS DOUBLE) / n - (CAST(sum_q AS DOUBLE) / n) * (CAST(sum_q AS DOUBLE) / n)")} AS var_q
      FROM st ORDER BY dim
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

    // Full-graph fixpoint — the incremental contract-and-solve path must
    // reproduce it exactly.
    "llm_incremental_cc" -> s"""
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
        SELECT s.node, r.label FROM sym s JOIN reach r ON s.nbr = r.node)
      SELECT node AS doc_id, min(label) AS group_id
      FROM reach GROUP BY node ORDER BY doc_id
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

    // Orientation details cannot leak into the result (the triangle set
    // is orientation-invariant), so the oracle replays the same
    // degree-ordered plan for cost symmetry, not correctness coupling.
    "llm_graph_triangles" -> s"""
      WITH nodes AS (SELECT doc_id AS id FROM documents),
      raw AS (
        SELECT id AS src, id - (id % 10) AS dst FROM nodes WHERE id % 10 <> 0
        UNION ALL
        SELECT n.id AS src, n.id + 1 AS dst
        FROM nodes n JOIN nodes m ON m.id = n.id + 1
        WHERE n.id % 10 BETWEEN 1 AND 8),
      canon AS (
        SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        FROM raw WHERE src <> dst),
      deg AS (
        SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
          SELECT lo AS v FROM canon UNION ALL SELECT hi AS v FROM canon)
        GROUP BY v),
      dird AS (
        SELECT CASE WHEN dl.d < dh.d OR (dl.d = dh.d AND lo < hi)
                    THEN lo ELSE hi END AS u,
               CASE WHEN dl.d < dh.d OR (dl.d = dh.d AND lo < hi)
                    THEN hi ELSE lo END AS w
        FROM canon JOIN deg dl ON dl.v = lo JOIN deg dh ON dh.v = hi),
      wedge AS (
        SELECT x.u AS apex, x.w AS v1, y.w AS v2
        FROM dird x JOIN dird y ON x.u = y.u AND x.w < y.w)
      SELECT t[1] AS a, t[2] AS b, t[3] AS c FROM (
        SELECT list_sort([apex, v1, v2]) AS t
        FROM wedge JOIN canon ON v1 = lo AND v2 = hi)
      ORDER BY a, b, c
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

    // Replays the full construction: floor-quantized milli components,
    // exact integer covariance n·Σxixj − Σxi·Σxj scaled by `// n²`, then
    // 8 unrolled matvec+rescale rounds (MATERIALIZED — each round's w is
    // referenced twice: values + the max|w| rescale scalar). Both
    // engines truncate integer division toward zero (Spark `div`,
    // DuckDB `//`), so rounds replay bit-identically.
    "llm_pca_power" -> pcaPowerSql,

    // Split-oblivious by design: the SAME full-recompute replay. Green
    // for the incremental query means merged-stats ≡ full, bit for bit.
    "llm_pca_incremental" -> pcaPowerSql,

    // Replays the memoryless boundary rule (md5(word) mod 4) and the
    // window-cumsum chunk assignment; chunk identity is md5 of the
    // reassembled chunk text in both engines.
    "llm_cdc_chunks" -> s"""
      WITH aug AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 25 = 0 THEN text || ' $Boilerplate'
                    ELSE text END AS text
        FROM documents),
      w AS (SELECT doc_id, source, generate_subscripts(ws, 1) - 1 AS pos,
                   unnest(ws) AS w
            FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
                  FROM aug)),
      b AS (SELECT doc_id, source, pos, w,
                   CASE WHEN CAST('0x' || substr(md5('cdc|' || w), 1, 15)
                             AS BIGINT) % 4 = 0 THEN 1 ELSE 0 END AS bdy
            FROM w),
      cn AS (SELECT doc_id, source, pos, w,
                    COALESCE(sum(bdy) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS chunk_no
             FROM b),
      ch AS (SELECT source, md5(string_agg(w, ' ' ORDER BY pos)) AS chash,
                    CAST(count(*) AS BIGINT) AS n_words
             FROM cn GROUP BY doc_id, source, chunk_no),
      per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
                     CAST(sum(n_words) AS BIGINT) AS total_words
              FROM ch GROUP BY source),
      st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_distinct,
                    CAST(sum(cw) AS BIGINT) AS distinct_words
             FROM (SELECT source, chash, min(n_words) AS cw
                   FROM ch GROUP BY source, chash)
             GROUP BY source),
      ga AS (SELECT CAST(count(*) AS BIGINT) AS n_chunks,
                    CAST(sum(n_words) AS BIGINT) AS total_words FROM ch),
      gs AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct,
                    CAST(sum(cw) AS BIGINT) AS distinct_words
             FROM (SELECT chash, min(n_words) AS cw FROM ch GROUP BY chash))
      SELECT source, n_chunks, n_distinct, total_words, distinct_words,
             ${round6sql(
               "1.0 - CAST(distinct_words AS DOUBLE) / CAST(total_words AS DOUBLE)")}
               AS savings_ratio,
             ${round6sql(
               "CAST(total_words AS DOUBLE) / CAST(n_chunks AS DOUBLE)")}
               AS avg_chunk_words
      FROM (SELECT p.source, n_chunks, n_distinct, total_words, distinct_words
            FROM per p JOIN st USING (source)
            UNION ALL
            SELECT '__ALL__', ga.n_chunks, gs.n_distinct, ga.total_words,
                   gs.distinct_words
            FROM ga, gs)
      ORDER BY source
    """,

    // Replays both retrievers (integer idf-sum lexical with stop-term
    // prune; quantized-dot dense) and the integer RRF fusion; every
    // rank tie-breaks (score DESC, d_id).
    "llm_rank_fusion" -> """
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d),
      terms AS (SELECT DISTINCT doc_id, w
                FROM (SELECT doc_id, unnest(ws) AS w FROM d)),
      kept AS (SELECT w, CAST(count(*) AS BIGINT) AS df
               FROM terms GROUP BY w
               HAVING CAST(count(*) AS BIGINT) * 10 <= (SELECT nd FROM n)),
      q AS (SELECT t.doc_id AS q_id, t.w, 1000000 // k.df AS idf_i
            FROM terms t JOIN kept k USING (w)
            WHERE t.doc_id % 101 = 7),
      lexs AS (SELECT q.q_id, t.doc_id AS d_id,
                      CAST(sum(idf_i) AS BIGINT) AS lex_score
               FROM q JOIN terms t USING (w)
               WHERE t.doc_id <> q.q_id
               GROUP BY 1, 2),
      lex20 AS (SELECT q_id, d_id, lex_rank FROM (
                  SELECT q_id, d_id,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY lex_score DESC, d_id) AS BIGINT) AS lex_rank
                  FROM lexs)
                WHERE lex_rank <= 20),
      e AS (SELECT vec_id AS doc_id,
                   list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
            FROM embeddings),
      qe AS (SELECT doc_id AS q_id, qv AS qqv FROM e WHERE doc_id % 101 = 7),
      embs AS (SELECT qe.q_id, e.doc_id AS d_id,
                      CAST(list_sum(list_transform(range(1, 65),
                        i -> qe.qqv[i] * e.qv[i])) AS BIGINT) AS emb_score
               FROM qe, e WHERE e.doc_id <> qe.q_id),
      emb20 AS (SELECT q_id, d_id, emb_rank FROM (
                  SELECT q_id, d_id,
                         CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY emb_score DESC, d_id) AS BIGINT) AS emb_rank
                  FROM embs)
                WHERE emb_rank <= 20),
      cand AS (SELECT coalesce(l.q_id, m.q_id) AS q_id,
                      coalesce(l.d_id, m.d_id) AS d_id,
                      l.lex_rank, m.emb_rank
               FROM lex20 l FULL JOIN emb20 m
                 ON l.q_id = m.q_id AND l.d_id = m.d_id),
      fused AS (SELECT q_id, d_id, lex_rank, emb_rank,
                       CAST(coalesce(1000000 // (60 + lex_rank), 0)
                          + coalesce(1000000 // (60 + emb_rank), 0) AS BIGINT)
                         AS rrf_micro
                FROM cand)
      SELECT q_id, d_id AS doc_id, lex_rank, emb_rank, rrf_micro FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY rrf_micro DESC, d_id) AS rn
        FROM fused)
      WHERE rn <= 5
      ORDER BY q_id, doc_id
    """,

    // Brute-force replay: same quantized dots, same label exclusion,
    // same (dot DESC, neg_id) tie-break.
    "llm_hard_negatives" -> """
      WITH e AS (SELECT vec_id, label,
                        list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
                 FROM embeddings),
      a AS (SELECT vec_id AS q_id, label AS q_label, qv AS aqv
            FROM e WHERE vec_id % 97 = 11),
      scored AS (SELECT a.q_id, CAST(a.q_label AS INT) AS q_label,
                        e.vec_id AS neg_id, CAST(e.label AS INT) AS neg_label,
                        CAST(list_sum(list_transform(range(1, 65),
                          i -> a.aqv[i] * e.qv[i])) AS BIGINT) AS dot_q
                 FROM a, e
                 WHERE e.vec_id <> a.q_id AND e.label <> a.q_label)
      SELECT q_id, q_label, neg_id, neg_label, dot_q, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY dot_q DESC, neg_id) AS BIGINT) AS rank
        FROM scored)
      WHERE rank <= 8
      ORDER BY q_id, rank
    """,

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

    // INDEPENDENT algorithm: the quadratic NOT-EXISTS dominance test
    // (the textbook skyline definition, no pruning).
    "llm_skyline" -> s"""
      WITH d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
                 FROM documents),
      sc AS (SELECT doc_id,
                    CAST(floor(($qualitySqlCol) * 1000000.0 + 0.5)
                      AS BIGINT) AS q_micro,
                    n_chars
             FROM d)
      SELECT r.doc_id, r.q_micro, r.n_chars
      FROM sc r
      WHERE NOT EXISTS (
        SELECT 1 FROM sc s
        WHERE s.q_micro >= r.q_micro AND s.n_chars >= r.n_chars
          AND (s.q_micro > r.q_micro OR s.n_chars > r.n_chars))
      ORDER BY r.doc_id
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

    // Unrolled synchronous LPA replay: same co-order edges (X148 SQL),
    // same (vote DESC, label ASC) adoption rule per round.
    "llm_label_prop" -> s"""
      WITH $coorderLpaCtes
      SELECT n, CAST(lbl AS BIGINT) AS lbl FROM l5 ORDER BY n
    """,

    "llm_assortativity" -> s"""
      WITH rel AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      capped AS (
        SELECT b, i FROM (
          SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
          FROM rel)
        WHERE r <= 5),
      e AS MATERIALIZED (
        SELECT x.i AS a, y.i AS bb
        FROM capped x JOIN capped y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      sym AS MATERIALIZED (
        SELECT a AS n, bb AS m FROM e
        UNION ALL SELECT bb AS n, a AS m FROM e),
      deg AS MATERIALIZED (
        SELECT n, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
      mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS me,
               sum(CAST(x.d AS HUGEINT)) AS sa,
               sum(CAST(y.d AS HUGEINT)) AS sb,
               sum(CAST(x.d AS HUGEINT) * x.d) AS saa,
               sum(CAST(y.d AS HUGEINT) * y.d) AS sbb,
               sum(CAST(x.d AS HUGEINT) * y.d) AS sab
        FROM sym JOIN deg x ON sym.n = x.n JOIN deg y ON sym.m = y.n)
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
             CAST(me AS BIGINT) // 2 AS n_edges,
             ${round6sql(
               "CAST(me * sab - sa * sb AS DOUBLE)" +
               " / (sqrt(CAST(me * saa - sa * sa AS DOUBLE))" +
               " * sqrt(CAST(me * sbb - sb * sb AS DOUBLE)))")} AS r_assort
      FROM mom
    """,

    // Modularity over the SAME LPA communities (Newman 2004, weighted):
    // Q_c = 2·in_c/m₂ − (tot_c/m₂)², m₂ = Σ degrees. Numerators are
    // exact HUGEINT, one double division per row, rounded half-up to
    // ppm. The lbl = −1 summary row sums the UNROUNDED terms over ALL
    // communities (singletons included) before its single rounding.
    "llm_rich_club" -> s"""
      WITH $coorderBaseCtes,
      deg AS MATERIALIZED (
        SELECT n, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
      dhist AS (SELECT d, CAST(count(*) AS BIGINT) AS nc
                FROM deg GROUP BY 1),
      emin AS (
        SELECT least(da.d, db.d) AS d, CAST(count(*) AS BIGINT) AS ec
        FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.bb
        GROUP BY 1),
      spine AS (
        SELECT dhist.d, dhist.nc, coalesce(emin.ec, 0) AS ec
        FROM dhist LEFT JOIN emin ON emin.d = dhist.d),
      tot AS (SELECT sum(nc) AS tn, sum(ec) AS te FROM spine),
      cum AS (
        SELECT d, sum(nc) OVER (ORDER BY d) AS cn,
               sum(ec) OVER (ORDER BY d) AS ce
        FROM spine)
      SELECT d AS k, CAST(tn - cn AS BIGINT) AS n_rich,
             CAST(te - ce AS BIGINT) AS e_rich,
             CAST((2 * (te - ce) * 1000000)
               // ((tn - cn) * (tn - cn - 1)) AS BIGINT) AS phi_micro
      FROM cum, tot
      WHERE tn - cn >= 2
      ORDER BY k
    """,

    "llm_louvain_move" -> s"""
      WITH $coorderBaseCtes,
      deg AS MATERIALIZED (
        SELECT n, CAST(sum(w) AS BIGINT) AS k FROM sym GROUP BY 1),
      m2t AS (SELECT CAST(sum(k) AS HUGEINT) AS m2 FROM deg),
      g AS (
        SELECT s.n, s.m,
               m2t.m2 * s.w - CAST(dn.k AS HUGEINT) * dm.k AS g2
        FROM sym s JOIN deg dn ON dn.n = s.n
        JOIN deg dm ON dm.n = s.m, m2t),
      pick AS (
        SELECT n, m AS adopt FROM (
          SELECT n, m, row_number() OVER (PARTITION BY n
            ORDER BY g2 DESC, m) AS rk
          FROM g WHERE g2 > 0)
        WHERE rk = 1),
      lbl AS MATERIALIZED (
        SELECT deg.n, coalesce(pick.adopt, deg.n) AS lbl
        FROM deg LEFT JOIN pick ON pick.n = deg.n),
      tot AS (
        SELECT lbl, CAST(sum(k) AS HUGEINT) AS tot_k
        FROM deg JOIN lbl USING (n) GROUP BY 1),
      inw AS (
        SELECT la.lbl, CAST(sum(e.w) AS HUGEINT) AS in_w
        FROM e JOIN lbl la ON la.n = e.a JOIN lbl lb ON lb.n = e.bb
        WHERE la.lbl = lb.lbl GROUP BY 1),
      qa AS (
        SELECT sum(2 * coalesce(inw.in_w, 0) * m2t.m2
                   - tot.tot_k * tot.tot_k) AS q_after_num
        FROM tot LEFT JOIN inw USING (lbl), m2t),
      sk2 AS (SELECT sum(CAST(k AS HUGEINT) * k) AS sk2 FROM deg),
      st AS (
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(count(DISTINCT lbl) AS BIGINT) AS n_communities,
               CAST(sum(CASE WHEN n <> lbl THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_moved
        FROM lbl)
      SELECT st.n_nodes, st.n_communities, st.n_moved,
             CAST((-sk2.sk2 * 1000000) // (m2t.m2 * m2t.m2) AS BIGINT)
               AS q_before_micro,
             CAST((qa.q_after_num * 1000000) // (m2t.m2 * m2t.m2)
               AS BIGINT) AS q_after_micro
      FROM st, sk2, qa, m2t
    """,

    "llm_modularity" -> s"""
      WITH $coorderLpaCtes,
      deg AS (SELECT n, CAST(sum(w) AS BIGINT) AS k FROM sym GROUP BY 1),
      m2t AS (SELECT CAST(sum(k) AS HUGEINT) AS m2 FROM deg),
      tot AS (
        SELECT lbl, CAST(sum(k) AS HUGEINT) AS tot_k,
               CAST(count(*) AS BIGINT) AS n_nodes
        FROM deg JOIN l5 USING (n) GROUP BY 1),
      inw AS (
        SELECT la.lbl AS lbl, CAST(sum(e.w) AS HUGEINT) AS in_w
        FROM e JOIN l5 la ON e.a = la.n JOIN l5 lb ON e.bb = lb.n
        WHERE la.lbl = lb.lbl GROUP BY 1),
      perc AS (
        SELECT t.lbl, t.n_nodes, t.tot_k, coalesce(i.in_w, 0) AS in_w
        FROM tot t LEFT JOIN inw i USING (lbl)),
      rows_ AS (
        SELECT CAST(lbl AS BIGINT) AS lbl, n_nodes,
               CAST(tot_k AS BIGINT) AS tot_k, CAST(in_w AS BIGINT) AS in_w,
               CAST(floor(CAST(2 * in_w * m2 - tot_k * tot_k AS DOUBLE)
                 / CAST(m2 * m2 AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                 AS q_ppm
        FROM perc, m2t WHERE n_nodes >= 2),
      total AS (
        SELECT CAST(-1 AS BIGINT) AS lbl,
               CAST(sum(n_nodes) AS BIGINT) AS n_nodes,
               CAST(sum(tot_k) AS BIGINT) AS tot_k,
               CAST(sum(in_w) AS BIGINT) AS in_w,
               CAST(floor(CAST(sum(2 * in_w * m2 - tot_k * tot_k) AS DOUBLE)
                 / CAST(any_value(m2) * any_value(m2) AS DOUBLE)
                 * 1000000.0 + 0.5) AS BIGINT) AS q_ppm
        FROM perc, m2t)
      SELECT * FROM total
      UNION ALL
      SELECT * FROM rows_
      ORDER BY lbl
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

    // Replays the proximity graph (the llm_grid_join CTE verbatim) and
    // 16 unrolled Borůvka rounds — enough for 2^16 vertices, rounds
    // after convergence are identity. The forest is the UNION of each
    // round's selected minimum edges; uniqueness comes from the
    // (w, lo, hi) lexicographic tie-break both engines share.
    "llm_graph_mst" -> mstFullOracleSql,

    // 12 unrolled locally-dominant matching rounds over the
    // brute-force proximity pairs; dominant CTEs MATERIALIZED
    // (feed the matched-node retirement AND the final union).
    "llm_dedup_matching" -> {
      val rounds = (1 to 12).map { k =>
        val p = k - 1
        s"""dm$k AS MATERIALIZED (
        SELECT lo, hi, w FROM (
          SELECT lo, hi, w, count(*) AS c FROM (
            SELECT lo, hi, w FROM (
              SELECT n, lo, hi, w, row_number() OVER (
                PARTITION BY n ORDER BY w, lo, hi) AS rn
              FROM (SELECT lo AS n, lo, hi, w FROM me$p
                    UNION ALL
                    SELECT hi AS n, lo, hi, w FROM me$p))
            WHERE rn = 1)
          GROUP BY 1, 2, 3)
        WHERE c = 2),
      me$k AS MATERIALIZED (
        SELECT e.lo, e.hi, e.w FROM me$p e
        WHERE NOT EXISTS (SELECT 1 FROM dm$k d
                          WHERE d.lo = e.lo OR d.hi = e.lo
                             OR d.lo = e.hi OR d.hi = e.hi))"""
      }.mkString(",\n      ")
      s"""
      WITH p AS (
        SELECT vec_id AS id,
               CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS x,
               CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS y
        FROM embeddings),
      me0 AS MATERIALIZED (
        SELECT a.id AS lo, b.id AS hi,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS w
        FROM p a JOIN p b ON a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= 1600),
      $rounds
      SELECT lo AS id_a, hi AS id_b, w AS dist2
      FROM (${(1 to 12).map(k => s"SELECT * FROM dm$k")
        .mkString("\n            UNION ALL ")})
      ORDER BY id_a
    """
    },

    // NOT a forest replay: the closure runs over the FULL thresholded
    // proximity pair set, so the hash match against the Spark side's
    // forest-based CC is the single-linkage connectivity theorem.
    "llm_single_linkage" -> """
      WITH RECURSIVE p AS (
        SELECT vec_id AS id,
               CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS x,
               CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS y
        FROM embeddings),
      ecut AS MATERIALIZED (
        SELECT a.id AS lo, b.id AS hi
        FROM p a JOIN p b ON a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= 900),
      sym2 AS (
        SELECT lo AS a, hi AS b FROM ecut
        UNION
        SELECT hi, lo FROM ecut),
      reach(a, b) AS (
        SELECT a, b FROM sym2
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym2 s ON s.a = r.b
        WHERE s.b <> r.a),
      lab AS (
        SELECT a AS id, least(a, min(b)) AS cluster
        FROM reach GROUP BY a),
      assigned AS (
        SELECT p.id AS vec_id, coalesce(l.cluster, p.id) AS cluster
        FROM p LEFT JOIN lab l ON l.id = p.id)
      SELECT vec_id, cluster,
             CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT)
               AS cluster_size
      FROM assigned
      ORDER BY vec_id
    """,

    // SHARED BY REFERENCE with llm_graph_mst: the incremental query's
    // contract IS equality with the full-graph rebuild (forest(base) ∪
    // batch-incident edges has the same unique MST — every dropped
    // base edge was a cycle maximum and stays one).
    "llm_mst_incremental" -> mstFullOracleSql,
    "llm_spectral_cut" -> spectralCutOracleSql,
    "llm_facility_select" -> facilitySelectOracleSql,

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

    "llm_densest_subgraph" -> densestOracleSql,

    "llm_graph_matching" -> matchingOracleSql,

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

    "p_ewma_chart" -> ewmaChartOracleSql,

    "llm_graph_ktruss" -> ktrussOracleSql
  )

  /** 6-truss fixpoint replay on the capped co-order projection (24
    * unrolled monotone rounds — 17 reach the fixpoint at sf0.01,
    * surplus rounds are no-ops). `lazy` — referenced above. */
  private lazy val ktrussOracleSql: String = {
    val rounds = (1 to 24).map { i =>
      s"""tri$i AS MATERIALIZED (
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM e${i - 1} e1 JOIN e${i - 1} e2 ON e1.b = e2.a
           WHERE EXISTS (SELECT 1 FROM e${i - 1} e3
                         WHERE e3.a = e1.a AND e3.b = e2.b)),
         sup$i AS MATERIALIZED (
           SELECT a, b, count(*) AS s FROM (
             SELECT x AS a, y AS b FROM tri$i
             UNION ALL SELECT x, z FROM tri$i
             UNION ALL SELECT y, z FROM tri$i) GROUP BY 1, 2),
         e$i AS MATERIALIZED (
           SELECT e.a, e.b FROM e${i - 1} e
           JOIN sup$i s ON e.a = s.a AND e.b = s.b WHERE s.s >= 4)"""
    }.mkString(",\n      ")
    s"""
      WITH capped AS (
        SELECT _b, _i FROM (
          SELECT l_orderkey AS _b, l_partkey AS _i,
                 row_number() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_partkey) AS r
          FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_partkey IS NOT NULL))
        WHERE r <= 5),
      e0 AS MATERIALIZED (
        SELECT DISTINCT x._i AS a, y._i AS b
        FROM capped x JOIN capped y USING (_b)
        WHERE x._i < y._i),
      $rounds,
      trif AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e24 e1 JOIN e24 e2 ON e1.b = e2.a
        WHERE EXISTS (SELECT 1 FROM e24 e3
                      WHERE e3.a = e1.a AND e3.b = e2.b)),
      supf AS (
        SELECT a, b, count(*) AS s FROM (
          SELECT x AS a, y AS b FROM trif
          UNION ALL SELECT x, z FROM trif
          UNION ALL SELECT y, z FROM trif) GROUP BY 1, 2)
      SELECT e.a, e.b, CAST(coalesce(s.s, 0) AS BIGINT) AS support
      FROM e24 e LEFT JOIN supf s ON e.a = s.a AND e.b = s.b
      ORDER BY e.a, e.b
    """
  }

  /** EWMA chart replay: the identical 20-term dyadic lag chain,
    * HUGEINT cross-multiplied 3σ band. `lazy` — referenced above. */
  private lazy val ewmaChartOracleSql: String = {
    val terms = (0 until graft.operators.EwmaChart.W).map { k =>
      s"coalesce(lag(x, $k) OVER w, 0) * ${1L << (19 - k)}"
    }.mkString("\n               + ")
    val dterms = (0 until graft.operators.EwmaChart.W).map { k =>
      s"(CASE WHEN lag(x, $k) OVER w IS NOT NULL THEN ${1L << (19 - k)}"
        .concat(" ELSE 0 END)")
    }.mkString("\n               + ")
    val swterms = (0 until graft.operators.EwmaChart.W).map { k =>
      val w2 = (1L << (19 - k)) * (1L << (19 - k))
      s"(CASE WHEN lag(x, $k) OVER w IS NOT NULL THEN $w2 ELSE 0 END)"
    }.mkString("\n               + ")
    s"""
      WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)
                 AS cents
        FROM events),
      daily AS (
        SELECT day, event_type, sum(cents) AS x FROM ev GROUP BY 1, 2),
      b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      days AS (
        SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE)
                 AS day
        FROM b),
      types AS (SELECT DISTINCT event_type FROM ev),
      dense AS MATERIALIZED (
        SELECT d.day, t.event_type, coalesce(x.x, 0) AS x
        FROM days d CROSS JOIN types t
        LEFT JOIN daily x ON x.day = d.day
          AND x.event_type = t.event_type),
      lagged AS (
        SELECT event_type, day, x,
               ($terms) AS num,
               ($dterms) AS den,
               ($swterms) AS sw2
        FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      stats AS (
        SELECT event_type, count(*) AS n, sum(x) AS sx,
               sum(CAST(x AS HUGEINT) * x) AS sxx
        FROM dense GROUP BY 1)
      SELECT l.event_type, l.day, CAST(l.x AS BIGINT) AS x,
             CAST((CAST(num AS HUGEINT) * 1000000) // den AS BIGINT)
               AS ewma_micro,
             ((CAST(num AS HUGEINT) * n - CAST(sx AS HUGEINT) * den)
              * (CAST(num AS HUGEINT) * n - CAST(sx AS HUGEINT) * den)
              >= 9 * (CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * sx) * sw2)
               AS flag_3sigma
      FROM lagged l JOIN stats s ON l.event_type = s.event_type
      ORDER BY l.event_type, l.day
    """
  }

  /** BKV densest-subgraph peel replay over the embeddings proximity
    * graph (brute-force pair oracle; 16 unrolled rounds — the 2/3
    * shrink bound needs ⌈log₁.₅ 490⌉ ≈ 16 at sf0.01, and exhausted
    * rounds emit no rows). `lazy` — referenced from the map above. */
  private lazy val densestOracleSql: String = {
    val rounds = (1 to 15).map { i =>
      s"""d$i AS MATERIALIZED (
           SELECT n, count(*) AS d FROM (
             SELECT a AS n FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1})
           GROUP BY n),
         st$i AS (SELECT count(*) AS v, coalesce(sum(d) // 2, 0) AS m
                  FROM d$i),
         k$i AS MATERIALIZED (
           SELECT n FROM d$i, st$i WHERE d * v >= 3 * m),
         e$i AS MATERIALIZED (
           SELECT a, b FROM e${i - 1}
           WHERE a IN (SELECT n FROM k$i) AND b IN (SELECT n FROM k$i))"""
    }.mkString(",\n      ")
    val states = (1 to 16).map { i =>
      s"SELECT ${i - 1} AS round, v, m FROM st$i WHERE v > 0"
    }.mkString("\n        UNION ALL ")
    s"""
      WITH p AS (
        SELECT vec_id AS id,
               CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS x,
               CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS y
        FROM embeddings),
      e0 AS MATERIALIZED (
        SELECT a.id AS a, b.id AS b
        FROM p a JOIN p b ON a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= 1600),
      $rounds,
      d16 AS MATERIALIZED (
        SELECT n, count(*) AS d FROM (
          SELECT a AS n FROM e15 UNION ALL SELECT b FROM e15)
        GROUP BY n),
      st16 AS (SELECT count(*) AS v, coalesce(sum(d) // 2, 0) AS m
               FROM d16),
      states AS (
        $states),
      dens AS (
        SELECT round, v, m, (1000000 * CAST(m AS HUGEINT)) // v AS dm
        FROM states),
      best AS (SELECT min(round) AS br FROM dens
               WHERE dm = (SELECT max(dm) FROM dens))
      SELECT CAST(round AS INT) AS round, CAST(v AS BIGINT) AS n_vertices,
             CAST(m AS BIGINT) AS n_edges, CAST(dm AS BIGINT)
               AS density_micro,
             round = br AS is_best
      FROM dens, best ORDER BY round
    """
  }

  /** Locally-minimal maximal-matching replay on the sparse order-part
    * graph (10 unrolled rounds; 3 suffice at sf0.01, exhausted rounds
    * select nothing). `lazy` — referenced from the map above. */
  private lazy val matchingOracleSql: String = {
    val rounds = (1 to 10).map { i =>
      s"""vm$i AS MATERIALIZED (
           SELECT n, min(k) AS mk FROM (
             SELECT a AS n, k FROM ek${i - 1}
             UNION ALL SELECT b, k FROM ek${i - 1})
           GROUP BY n),
         s$i AS MATERIALIZED (
           SELECT e.a, e.b FROM ek${i - 1} e
           JOIN vm$i x ON e.a = x.n AND e.k = x.mk
           JOIN vm$i y ON e.b = y.n AND e.k = y.mk),
         ek$i AS MATERIALIZED (
           SELECT e.* FROM ek${i - 1} e
           WHERE a NOT IN (SELECT a FROM s$i)
             AND a NOT IN (SELECT b FROM s$i)
             AND b NOT IN (SELECT a FROM s$i)
             AND b NOT IN (SELECT b FROM s$i))"""
    }.mkString(",\n      ")
    val sel = (1 to 10).map { i =>
      s"SELECT a, b, $i AS round FROM s$i"
    }.mkString("\n        UNION ALL ")
    s"""
      WITH e0 AS (
        SELECT DISTINCT l_orderkey * 2 AS a, l_partkey * 2 + 1 AS b
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
          AND l_quantity < 8),
      ek0 AS MATERIALIZED (
        SELECT a, b,
               lpad(CAST(CAST('0x' || substr(md5('match|' || a || '|' || b)
                 , 1, 15) AS BIGINT) AS VARCHAR), 19, '0')
                 || '|' || a || '|' || b AS k
        FROM e0),
      $rounds
      SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
             CAST(round AS INT) AS round
      FROM ($sel) ORDER BY a, b
    """
  }

  /** Full-graph Borůvka MST replay over the embeddings proximity
    * graph (brute-force O(n²) pair oracle; 16 unrolled rounds).
    * `lazy` — referenced from the oracle map defined above it.
    */
  private lazy val mstFullOracleSql: String = s"""
      WITH RECURSIVE p AS (
        SELECT vec_id AS id,
               CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS x,
               CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS y
        FROM embeddings),
      e AS MATERIALIZED (
        SELECT a.id AS lo, b.id AS hi,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS w
        FROM p a JOIN p b ON a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= 1600),
      lab0 AS MATERIALIZED (
        SELECT id, id AS c FROM (
          SELECT lo AS id FROM e UNION SELECT hi FROM e)),
      ${mstRoundCtes(16)}
      SELECT lo AS id_a, hi AS id_b, w AS dist2
      FROM (${(1 to 16).map(k =>
        s"SELECT DISTINCT lo, hi, w FROM min$k").mkString("\n            UNION\n            ")})
      ORDER BY dist2, id_a, id_b
    """

  /** One spectral power-iteration round as three MATERIALIZED CTEs
    * (lazy step / deflate / rescale), replaying SpectralCut.bipartition
    * exactly: signed `//` is toward-zero in DuckDB (pinned), matching
    * Spark's `div`/truncDivDec. */
  private def spectralRoundCtes(rounds: Int): String =
    (1 to rounds).map { k =>
      s"""r$k AS MATERIALIZED (
        SELECT x.id, x.d, (x.x + (s.sx // x.d)) // 2 AS x
        FROM x${k - 1} x JOIN (
          SELECT sym.a AS id, sum(xp.x) AS sx
          FROM sym JOIN x${k - 1} xp ON xp.id = sym.b
          GROUP BY 1) s USING (id)),
      c$k AS MATERIALIZED (
        SELECT id, d,
               x - (SELECT sum(d * x) FROM r$k) // (SELECT sum(d) FROM r$k)
                 AS x
        FROM r$k),
      x$k AS MATERIALIZED (
        SELECT id, d,
               CASE WHEN (SELECT max(abs(x)) FROM c$k) > 0
                    THEN (x * 1000000) // (SELECT max(abs(x)) FROM c$k)
                    ELSE 0 END AS x
        FROM c$k)""".stripMargin
    }.mkString(",\n      ")

  /** Deflated lazy-walk power iteration over the embeddings proximity
    * graph (brute-force pair relation), 8 unrolled rounds — the
    * spectral sign cut. `lazy` — referenced from the oracle map. */
  private lazy val spectralCutOracleSql: String = s"""
      WITH p AS (
        SELECT vec_id AS id,
               CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS x,
               CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000.0) AS BIGINT)
                 AS y
        FROM embeddings),
      e AS MATERIALIZED (
        SELECT a.id AS a, b.id AS b
        FROM p a JOIN p b ON a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= 1600),
      sym AS MATERIALIZED (
        SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
      nd AS MATERIALIZED (
        SELECT a AS id, count(*) AS d FROM sym GROUP BY 1),
      s0 AS (
        SELECT id, d,
               CASE WHEN CAST('0x' || substr(md5('spec|'
                        || CAST(id AS VARCHAR)), 1, 1) AS INT) % 2 = 0
                    THEN 1000000 ELSE -1000000 END AS x
        FROM nd),
      c0 AS MATERIALIZED (
        SELECT id, d,
               x - (SELECT sum(d * x) FROM s0) // (SELECT sum(d) FROM s0)
                 AS x
        FROM s0),
      x0 AS MATERIALIZED (
        SELECT id, d,
               CASE WHEN (SELECT max(abs(x)) FROM c0) > 0
                    THEN (x * 1000000) // (SELECT max(abs(x)) FROM c0)
                    ELSE 0 END AS x
        FROM c0),
      ${spectralRoundCtes(8)}
      SELECT id AS vec_id, CAST(x AS BIGINT) AS score_q,
             x >= 0 AS pos_side
      FROM x8 ORDER BY vec_id
    """
}
