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
  private[queries] val sprtScenarios = Seq(
    ("near_19_21", 0.19, 0.21), // brackets the true ~0.20 -> wanders
    ("low_10_12", 0.10, 0.12),  // true rate far above -> accept_h1
    ("high_30_32", 0.30, 0.32)) // true rate far below -> accept_h0

  /** SemDeDup tuning shared by llm_semantic_dedup / llm_joint_curation
    * and their oracles: the in-cluster dot threshold (~p99 of in-cluster
    * dots on this corpus) and the target expected cluster size that
    * [[graft.llm.VectorOps.kForCorpus]] turns into a corpus-dependent k.
    */
  private[queries] val SemanticDupMinDotQ = 340000L
  private[queries] val SemanticClusterTarget = 64

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
  private[queries] val PhrasePanel = Seq(
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
  private[queries] def boilerplatedDocs(s: SparkSession, dir: String) =
    Tables(s, dir, "documents").withColumn("aug",
      when(col("doc_id") % 25 === 0, concat(col("text"), lit(" " + Boilerplate)))
        .otherwise(col("text")))

  /** `documents` with every 40th doc (doc_id % 40 == 1) replaced by the
    * first 60% of the PREVIOUS doc's characters — a planted "quote page"
    * whose shingle set is nearly contained in its source. Both engines
    * plant identically; the cut may split a trailing word (one shingle
    * lost), which is why llm_containment_join thresholds at 0.8, not 1.0.
    */
  private[queries] def quotedDocs(s: SparkSession, dir: String): DataFrame = {
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
  private[queries] val HeaderLine = "subscribe to our newsletter for daily updates"
  private[queries] val FooterLine = "copyright twenty twenty four all rights reserved"

  /** BPE-ish tokenizer regex: alnum runs or single non-alnum marks.
    * Whitespace is spelled as explicit characters (not `\s`) so Java
    * regex and RE2 read the identical byte pattern.
    */
  private[queries] val BpeTokenRe = "[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

  /** Host part of the first URL in a document (group 1). */
  private[queries] val UrlDomainRe = "https?://([^ /]+)"

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
  private[queries] val langMarkers: Seq[(String, Seq[String])] = Seq(
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
  private[queries] def lmRetrievalSqlCtes: String = """d AS (
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
  private[queries] def lmRetrievalTop5(s: SparkSession, dir: String): DataFrame = {
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

  private[queries] def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  /** The X284 planted-dirt linkage feed, shared by llm_record_linkage
    * and llm_sorted_neighborhood (one definition so the two queries
    * grade the same feed): (master m_*, dirty f_* with OCR'd 'X' name
    * prefix on every 7th key, nation off-by-one on every 5th, +1.37
    * balance drift on every 3rd, segment loss on every 11th; dirty
    * ids = master id + 1_000_000).
    */
  private[queries] def linkageFeed(cust: DataFrame): (DataFrame, DataFrame) = {
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
  private[queries] case class IvfPqIndex(emb: DataFrame, coarse: DataFrame,
      cb: DataFrame, codes: DataFrame, qs: DataFrame,
      dot: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      m: Int, subDim: Int)

  private[queries] def ivfPqIndex(s: SparkSession, dir: String): IvfPqIndex = {
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
  private[queries] val CeWeights: Seq[Long] = (1 to 64).map { j =>
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ce|$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    (java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L
  }

  /** All 300 LlmSurface queries — the r14 family split moved the entry
    * literals to the six Llm*Queries files; helpers/constants/CTE
    * generators live HERE. Lazy so a family object whose oracle strings
    * read helpers during ITS init always observes this object fully
    * constructed (strict-val combine would re-enter a half-built
    * LlmSurface). */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    LlmTextQueries.queries ++ LlmDedupQueries.queries ++
    LlmAnnQueries.queries ++ LlmGraphQueries.queries ++
    LlmEventQueries.queries ++ LlmStatsQueries.queries

  // ======================================================================
  // DuckDB oracles
  // ======================================================================

  /** The X268 Neyman-allocation CTE chain (mom -> sig -> both
    * apportionments), budget-parameterized so the X277 HT-estimation
    * oracle replays the identical design at its own budget.
    */
  private[queries] def neymanAllocCtes(budget: Int): String = s"""
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

  private[queries] val round6sql = (x: String) => s"floor(($x) * 1000000.0 + 0.5) / 1000000.0"

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
  private[queries] def graphAnnOracleCtes(ndWhere: String, qWhere: String): String = {
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

  private[queries] lazy val ivfPqApproxCtes: String = s"""$embedQvCte,
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
  private[queries] def pageRankCtes(iters: Int): String =
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
  private[queries] def mstRoundCtes(rounds: Int): String =
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
  private[queries] def adaboostRoundCtes(rounds: Int, names: Seq[String]): String = {
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
  private[queries] def mmrRoundCtes(rounds: Int, num: Long, den: Long): String = {
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
  private[queries] def jpRoundCtes(rounds: Int): String =
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
  private[queries] val sccClosureCtes: String = """nodes AS (
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
  private[queries] def hitsCtes(iters: Int): String =
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
  private[queries] def markovScenarioCtes(tag: String, removed: Option[String],
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
  private[queries] def pprCtes(iters: Int): String =
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

  private[queries] val wordsetFpSql =
    "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"

  /** Word-3-gram shingles + distinct (doc, shingle) pairs as a CTE. */
  private[queries] val shinglesCte = """
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

  private[queries] val simhashBitSums =
    (0 until 60)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS bs$b")
      .mkString(", ")
  private[queries] val simhashCombine =
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
  private[queries] def mixtureWeights(s: SparkSession, dir: String): DataFrame = {
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
  private[queries] lazy val mixtureCtes: String = s"""d AS (
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
  private[queries] def plantedTriplicate(s: SparkSession, dir: String): DataFrame = {
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
  private[queries] lazy val dbscanCtes: String = s"""docs3 AS MATERIALIZED (
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

  private[queries] def simhashPairsCteOver(src: String) = s"""
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

  private[queries] lazy val simhashPairsCte: String = simhashPairsCteOver("documents")

  private[queries] def signBucketSqlBits(bits: Int): String =
    (0 until bits)
      .map(i => s"(CASE WHEN CAST(embedding[${i + 1}] AS DOUBLE) >= 0.0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
  private[queries] val signBucketSql = signBucketSqlBits(6)

  /** Exact top-5 cosine (quantized) as row_number SQL — the oracle for
    * BOTH the window-form (`llm_topk_similarity`) and heap-aggregate
    * (`llm_topk_heap`) Spark plans, which must produce identical rows.
    */
  private[queries] val topkSimilaritySql = """
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
  private[queries] def kmeansCtesOver(src: String, dims: Int, p: String,
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
  private[queries] def coorderLpaCtes: String = {
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
  private[queries] def coorderBaseCtes: String =
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

  /** The llm_classifier_train base CTEs (hashed features, teacher
    * label, class totals, zero weights) — shared with
    * llm_data_cartography so the two training replays cannot drift. */
  private[queries] val clfTrainBaseCtes: String =
    """tok AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS w FROM documents),
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
        FROM generate_series(0, 4095) t(g))"""

  /** The integer-GD training rounds of llm_classifier_train as
    * unrolled CTEs z_r/e_r/g_r/w_r — the update equations are the
    * bit-contract with TextOps.trainLinearClassifier AND
    * TextOps.trainingCartography. */
  private[queries] def clfTrainRoundCtes(n: Int): String = (1 to n).map { r =>
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

  /** The X284 planted-dirt linkage feed as oracle CTEs (m, f) —
    * shared by llm_record_linkage and llm_sorted_neighborhood.
    */
  private[queries] val linkageFeedCtes = """m AS (
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
  private[queries] lazy val rankRboOracleSql: String = {
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
  private[queries] lazy val nbLangCtes: String = """base AS (
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

  /** The BOUNDED trained-NB replay (hashed trigram features, fixed
    * 2²⁰-cell vocabulary — TextOps.naiveBayesLangIdHashed), shared by
    * llm_langid_hashed and llm_mcnemar_hashed so the two oracles
    * cannot drift. Identical chain to [[nbLangCtes]] except: the
    * feature is the 60-bit md5 prefix of the trigram mod 1048576, and
    * smoothing uses the FIXED bucket count (no distinct-vocabulary
    * CTE — that count is what Heaps' law grows). Ends at CTE `r`
    * (doc_id, lang_true, cand, rn). */
  private[queries] lazy val nbLangHashedCtes: String = """base AS (
        SELECT doc_id, lang, text FROM documents WHERE length(text) >= 3),
      ex AS (
        SELECT doc_id, lang, text,
               unnest(range(1, CAST(length(text) AS BIGINT) - 1)) AS i
        FROM base),
      tri AS (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5(substr(text, CAST(i AS INT), 3)),
                 1, 15) AS BIGINT) % 1048576 AS g
        FROM ex),
      dg AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY doc_id, g),
      lg AS (SELECT lang, g, count(*) AS clg FROM tri GROUP BY lang, g),
      nl AS (SELECT lang, CAST(sum(clg) AS BIGINT) AS nlt FROM lg GROUP BY lang),
      model AS (
        SELECT lang, g,
               CAST(floor(ln((clg + 1) / CAST(nlt + 1048576 AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT) AS li
        FROM lg JOIN nl USING (lang)),
      fl AS (
        SELECT lang,
               CAST(floor(ln(1.0 / CAST(nlt + 1048576 AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT) AS fl
        FROM nl),
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
  private[queries] lazy val bestOfNOracleSql: String = {
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
  private[queries] lazy val facilitySelectOracleSql: String = {
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
  private[queries] lazy val linkageEmOracleSql: String = {
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

  private[queries] val embedQvCte = """e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        FROM embeddings)"""

  private[queries] def kmeansCtes(kExpr: String, iters: Int): String =
    s"""$embedQvCte,
      ${kmeansCtesOver("e", 64, "", kExpr, iters)}"""

  private[queries] def kmeansSql(k: Int, iters: Int): String = s"""
      WITH ${kmeansCtes(k.toString, iters)}
      SELECT vec_id, centroid_id, dist_q FROM ax$iters ORDER BY vec_id
    """

  /** Corpus-dependent cluster count, the SQL twin of
    * [[graft.llm.VectorOps.kForCorpus]]: ceil(n / target), clamped to
    * [1, 2^20]. Evaluated by DuckDB as a scalar subquery in the init
    * CTE's LIMIT.
    */
  private[queries] def kForCorpusSqlFor(target: Int): String =
    s"(SELECT greatest(1, least(1048576, CAST(ceil(count(*) / $target.0) AS BIGINT))) FROM e)"

  private[queries] val kForCorpusSql: String = kForCorpusSqlFor(SemanticClusterTarget)

  /** Shared CTE stack for the SemDeDup queries: corpus-derived-k k-means
    * (3 rounds) + in-cluster pair scan at the [[SemanticDupMinDotQ]]
    * threshold, ending in `withc` (vec_id, qv, centroid_id) and `dups`
    * (flagged vec_ids).
    */
  private[queries] def semanticDupCtes: String = s"""
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
  private[queries] def hexByteAt(off: String): String =
    s"((strpos('0123456789ABCDEF', substr(hx, 2*($off) + 1, 1)) - 1) * 16" +
      s" + (strpos('0123456789ABCDEF', substr(hx, 2*($off) + 2, 1)) - 1))"

  /** DuckDB expression: little-endian u32 at 0-based byte offset `off`
    * (BMP header fields). */
  private[queries] def hexLe32(off: Int): String =
    s"(${hexByteAt(off.toString)} + 256 * ${hexByteAt((off + 1).toString)}" +
      s" + 65536 * ${hexByteAt((off + 2).toString)}" +
      s" + 16777216 * ${hexByteAt((off + 3).toString)})"

  /** DuckDB expression: big-endian u32 whose 8 hex digits start at
    * 1-based hex position `hpos1` (PNG IHDR fields, 4-byte frame
    * length prefixes). */
  private[queries] def hexBe32(hpos1: String): String =
    s"CAST(list_sum(list_transform(range(8), i -> " +
      s"(strpos('0123456789ABCDEF', substr(hx, ($hpos1) + i, 1)) - 1)" +
      s" * 16 ** (7 - i))) AS BIGINT)"

  private[queries] val blockhashExpr: String = (0 until 64).map { b =>
    val ws = s"(($b * n) // 64 + 1)"
    val we = s"((${b + 1} * n) // 64)"
    val wlen = s"($we - ($b * n) // 64)"
    val bit = if (b == 63) "(-9223372036854775807 - 1)" else (1L << b).toString
    s"(CASE WHEN $wlen > 0 AND coalesce(list_sum(bytes[$ws:$we]), 0) * n >= total * $wlen THEN $bit ELSE 0 END)"
  }.mkString(" + ")

  private[queries] val minhashSigs =
    (0 until 12).map(i => s"min(md5('$i|' || s)) AS h$i").mkString(", ")
  private[queries] val bandKeys =
    (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, md5(h${b * 3} || h${b * 3 + 1} || h${b * 3 + 2}) AS bkey FROM sigs")
      .mkString(" UNION ALL ")

  private[queries] val langScoreCols = langMarkers.map { case (lang, ms) =>
    val inList = ms.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(ws, x -> x IN ($inList))) AS s_$lang"
  }.mkString(", ")
  private[queries] val langArgmax = {
    val g = langMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")
    val cases = langMarkers
      .map { case (l, _) => s"WHEN s_$l = greatest($g) THEN '$l'" }
      .mkString(" ")
    s"CASE $cases END"
  }

  /** Full-recompute PCA replay — shared by llm_pca_power and the
    * split-oblivious llm_pca_incremental oracle. */
  private[queries] lazy val pcaPowerSql: String = {
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

  /** DuckDB oracles for every query above — same family files, same
    * lazy-combine rule. */
  lazy val oracleSql: Map[String, String] =
    LlmTextQueries.oracleSql ++ LlmDedupQueries.oracleSql ++
    LlmAnnQueries.oracleSql ++ LlmGraphQueries.oracleSql ++
    LlmEventQueries.oracleSql ++ LlmStatsQueries.oracleSql

  /** 6-truss fixpoint replay on the capped co-order projection (24
    * unrolled monotone rounds — 17 reach the fixpoint at sf0.01,
    * surplus rounds are no-ops). `lazy` — referenced above. */
  private[queries] lazy val ktrussOracleSql: String = {
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
  private[queries] lazy val ewmaChartOracleSql: String = {
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
  private[queries] lazy val densestOracleSql: String = {
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
  private[queries] lazy val matchingOracleSql: String = {
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
  private[queries] lazy val mstFullOracleSql: String = s"""
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
  private[queries] def spectralRoundCtes(rounds: Int): String =
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
  private[queries] lazy val spectralCutOracleSql: String = s"""
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
