package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed word-level suffix array by prefix quadrupling, with LCP
  * extraction — the exact-substring-dedup machinery of Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better"),
  * re-expressed in Spark's sort-based execution model instead of the
  * paper's single-node in-memory suffix array.
  *
  * WHY a suffix array when the repo already has fixed-window span dedup
  * (`TextOps.substringDupStats` / `maximalDupSpans`): the L-gram method
  * must fix the span length L BEFORE the scan, and answers only "spans
  * of length ≥ L". The suffix array ranks every suffix once and then
  * answers ANY length threshold — including "what is the longest
  * repeated substring in the corpus", which no a-priori L can find.
  *
  * Construction = the distributed Manber–Myers loop [Flick & Aluru,
  * SC'15] at RADIX 4: each round keys every position by its ranks at
  * offsets (0, m, 2m, 3m) and re-ranks, so rounds = ⌈log₄ maxDocLen⌉
  * (measured 2× fewer wall-clock rounds than doubling — each round's
  * cost is dominated by the sort/dense-rank chain, and the three extra
  * shifts ride ONE per-document window as `lead(rank, k·m)` instead of
  * shuffle self-joins: suffixes stop at their document's end, so the
  * shift never crosses a partition key). Dense ranking at scale is
  * sort → `zipWithIndex` (range-partitioned global sort; the index job
  * ships one Long PER PARTITION to the driver — metadata, not rows).
  * Suffixes never materialize: round state is one (doc, pos, rank) row
  * per token, so a 10¹¹-token corpus carries ~9 radix-4 rounds of
  * 24-byte rows through the shuffle — the DuckDB oracle, by contrast,
  * sorts the O(n·len) expanded suffixes and is viable only at test
  * scale.
  *
  * Positions past a document's end rank as −1, which sorts before every
  * real rank, giving the standard shorter-prefix-first order — the same
  * order DuckDB's native list comparison produces, which is what makes
  * the result oracle-checkable.
  */
object SuffixArray {

  /** Dense rank 0..d−1 for an already-distinct, already-sorted frame:
    * `zipWithIndex` preserves the range-partitioned sort order and runs
    * one lightweight count job (one Long per partition to the driver).
    */
  private def withZipIndex(sorted: DataFrame, idxCol: String): DataFrame = {
    val schema = StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField(idxCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Dense rank of a NON-distinct sorted frame, assigned in place — the
    * Flick–Aluru rank-assignment step. Equal keys (which the range sort
    * made adjacent, possibly spanning partition boundaries) share one
    * rank; ranks are dense 0..d−1 in key order.
    *
    * Why not distinct → sort → zipWithIndex → join-back (the obvious
    * spelling): that costs a distinct shuffle plus a join-back shuffle
    * of the full frame EVERY round. Here the sort itself is the only
    * row shuffle: pass 1 collects (firstKey, lastKey, distinctCount)
    * per partition — #partitions rows of driver metadata — pass 2
    * assigns ranks locally from the partition's start offset, where a
    * key continuing across the boundary (partition's first key ==
    * previous non-empty partition's last key) was already counted and
    * keeps its earlier rank.
    */
  private def denseRankSorted(sorted: DataFrame, keyCol: String,
      outCol: String): DataFrame = {
    // materialize the sort ONCE: both passes below and every downstream
    // consumer read the checkpointed blocks, not a re-run of the sort
    val df = sorted.localCheckpoint(true)
    val ki = df.schema.fieldIndex(keyCol)
    def key(r: Row): Seq[Long] = r.getSeq[Long](ki)
    val rdd = df.rdd
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: Seq[Long] = null
      var last: Seq[Long] = null
      var cnt = 0L
      it.foreach { r =>
        val k = key(r)
        if (first == null) { first = k; cnt = 1 }
        else if (k != last) cnt += 1
        last = k
      }
      Iterator.single((pid, Option(first), Option(last), cnt))
    }.collect().sortBy(_._1)
    // D(p) = distinct keys FIRST APPEARING before partition p; a
    // continued key keeps rank D(p) − 1
    val starts = new Array[(Long, Boolean)](stats.length) // (D, continues)
    var acc = 0L
    var prevLast: Option[Seq[Long]] = None
    for (((_, first, last, cnt), p) <- stats.zipWithIndex) {
      val cont = first.isDefined && prevLast.contains(first.get)
      starts(p) = (acc, cont)
      acc += cnt - (if (cont) 1L else 0L)
      if (last.isDefined) prevLast = last
    }
    val bc = df.sparkSession.sparkContext.broadcast(starts)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (d, cont) = bc.value(pid)
      var rank = if (cont) d - 1 else d
      var last: Seq[Long] = null
      var started = false
      it.map { r =>
        val k = key(r)
        if (started && k != last) rank += 1
        started = true
        last = k
        Row.fromSeq(r.toSeq :+ rank)
      }
    }
    val schema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol, LongType, nullable = false))
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Tokenize to one row per (doc, pos(1-based), word); single-space
    * split, the corpus-wide tokenizer contract (TextOps.words).
    */
  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos0", "word")))
      .select(col("doc"), (col("pos0") + 1).as("pos"), col("word"))

  /** Prefix-quadrupling rank tables: (m, ranks(doc, pos, rank)) for
    * m = 1, 4, 16, … — rank m orders length-min(m, suffixLen) prefixes.
    * Stops once every rank is distinct or m ≥ maxDocLen; ties that
    * survive to the end are exactly-equal suffixes. Each round
    * localCheckpoints: the next round, the SA sort and the LCP descent
    * all re-read these tables, and an uncut lineage would re-run every
    * prior round per consumer.
    */
  def rankTables(docs: DataFrame, idCol: String, textCol: String): Seq[(Int, DataFrame)] = {
    val t = tokens(docs, idCol, textCol)
    val maxLen = t.groupBy("doc").count().agg(max("count")).head().getLong(0).toInt
    val words = t.select("word").distinct().orderBy("word")
    var ranks = t.join(withZipIndex(words, "rank"), "word")
      .select(col("doc"), col("pos"), col("rank"))
      .localCheckpoint(true)
    val nPos = ranks.count()
    // ranks are DENSE (zipWithIndex of the distinct keys), so
    // all-distinct ⟺ max(rank) == n−1: a partial-combining max is the
    // cheap convergence probe, not a countDistinct shuffle
    def converged(r: DataFrame): Boolean =
      r.agg(max("rank")).head().getLong(0) == nPos - 1
    val byDoc = Window.partitionBy("doc").orderBy("pos")
    var tables = List((1, ranks))
    var m = 1
    var allDistinct = converged(ranks)
    while (m < maxLen && !allDistinct) {
      // radix-4 key: ranks at offsets 0, m, 2m, 3m — one per-doc window
      // pass computes all three shifts (no self-join); past-end → −1
      // sentinel, which sorts below every real rank (shorter-first)
      val keyed = ranks.withColumn("_k", array(
        col("rank"),
        coalesce(lead(col("rank"), m).over(byDoc), lit(-1L)),
        coalesce(lead(col("rank"), 2 * m).over(byDoc), lit(-1L)),
        coalesce(lead(col("rank"), 3 * m).over(byDoc), lit(-1L))))
      // no outer checkpoint: denseRankSorted materialized the sort; the
      // rank projection on top is a narrow map
      ranks = denseRankSorted(
          keyed.select("doc", "pos", "_k").orderBy("_k"), "_k", "nrank")
        .select(col("doc"), col("pos"), col("nrank").as("rank"))
      m *= 4
      tables ::= ((m, ranks))
      allDistinct = converged(ranks)
    }
    tables.reverse
  }

  /** SA-adjacent suffix pairs with their exact LCP, pre-gated so only
    * pairs that can reach `minTokens` flow through the descent —
    * the shared core of [[longestRepeats]] and [[dupSpans]].
    *
    * Returns (doc_a, pos_a, doc_b, pos_b, len_a, len_b, lcp) where
    * (a, b) are consecutive suffixes in SA order.
    *
    * - SA order = final rank, ties (exactly-equal suffixes) broken by
    *   (doc, pos); adjacency via an idx = idx+1 self-join on the
    *   zip-indexed order.
    * - The pre-gate: LCP ≥ minTokens requires equal ranks at the
    *   largest table level m₀ ≤ minTokens, so one equi-check against
    *   that table reduces the n−1 adjacent pairs to the real repeat
    *   candidates before the descent joins run. Pairs failing the gate
    *   are DROPPED (their LCP < m₀ is never computed).
    * - LCP by descent over the stored radix-4 rank tables, largest m
    *   first, each level checked up to 3× (a failed level-4m check
    *   leaves a remainder < 4m = up to three m-advances): ranks equal
    *   at level m ⇒ advance both cursors by min(m, tokens left on
    *   either side) — the `least` guard keeps truncated-prefix equality
    *   (both suffixes end inside the window) from overcounting. O(log)
    *   equi-joins over the gated pairs, never a word re-comparison.
    */
  def adjacentLcp(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int): DataFrame = {
    val tables = rankTables(docs, idCol, textCol)
    val t = tokens(docs, idCol, textCol)
    val lens = t.groupBy("doc").agg(max("pos").as("len"))
    val sa = withZipIndex(
      tables.last._2.orderBy("rank", "doc", "pos"), "idx")
    val nxt = sa.select((col("idx") - 1).as("idx"),
      col("doc").as("doc_b"), col("pos").as("pos_b"))
    val adjacent = sa.join(nxt, "idx")
      .select(col("doc").as("doc_a"), col("pos").as("pos_a"),
        col("doc_b"), col("pos_b"))
    val gateM = tables.map(_._1).filter(_ <= math.max(1, minTokens)).max
    val gateTbl = tables.find(_._1 == gateM).get._2
    val ga = gateTbl.select(col("doc").as("doc_a"), col("pos").as("pos_a"),
      col("rank").as("_gra"))
    val gb = gateTbl.select(col("doc").as("doc_b"), col("pos").as("pos_b"),
      col("rank").as("_grb"))
    var state = adjacent
      .join(ga, Seq("doc_a", "pos_a"))
      .join(gb, Seq("doc_b", "pos_b"))
      .filter(col("_gra") === col("_grb"))
      .drop("_gra", "_grb")
      .join(lens.select(col("doc").as("doc_a"), col("len").as("len_a")), "doc_a")
      .join(lens.select(col("doc").as("doc_b"), col("len").as("len_b")), "doc_b")
      .withColumn("off_a", col("pos_a"))
      .withColumn("off_b", col("pos_b"))
      .withColumn("lcp", lit(0L))
      .localCheckpoint(true)
    val desc = tables.sortBy(-_._1)
    for (((m, tbl), i) <- desc.zipWithIndex;
         _ <- 0 until (if (i == 0) 1 else 3)) {
      val ra = tbl.select(col("doc").as("doc_a"), col("pos").as("off_a"),
        col("rank").as("_ra"))
      val rb = tbl.select(col("doc").as("doc_b"), col("pos").as("off_b"),
        col("rank").as("_rb"))
      state = state
        .join(ra, Seq("doc_a", "off_a"), "left")
        .join(rb, Seq("doc_b", "off_b"), "left")
        // materialize the advance BEFORE touching the cursors: off_a and
        // off_b must both advance by the advance computed from the OLD
        // cursor positions
        .withColumn("_adv",
          when(col("_ra").isNotNull && col("_rb").isNotNull &&
               col("_ra") === col("_rb"),
            least(lit(m.toLong),
              col("len_a") - col("off_a") + 1,
              col("len_b") - col("off_b") + 1))
            .otherwise(lit(0L)))
        .withColumn("lcp", col("lcp") + col("_adv"))
        .withColumn("off_a", col("off_a") + col("_adv"))
        .withColumn("off_b", col("off_b") + col("_adv"))
        .drop("_ra", "_rb", "_adv")
    }
    state.select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"),
      col("len_a"), col("len_b"), col("lcp"))
  }

  /** Per-document maximal duplicated spans of ≥ `spanTokens` tokens —
    * the excision list of Lee et al. 2022's ExactSubstr dedup, derived
    * from the suffix array.
    *
    * A position p starts a duplicated `spanTokens`-gram iff some OTHER
    * suffix (any document, including p's own) shares a prefix of ≥
    * spanTokens with p's — and the suffixes maximizing LCP with p are
    * exactly its SA neighbors, so p is flagged iff one of its two
    * adjacent pairs has lcp ≥ spanTokens. Flagged positions then merge
    * per document into maximal runs (gaps-and-islands; per-DOC windows,
    * so the sort is document-sized and fully parallel): a run of r
    * consecutive flagged positions is one duplicated span of
    * r + spanTokens − 1 tokens.
    *
    * Returns (idCol, span_start, span_tokens), one row per maximal
    * span. Differs from `TextOps.maximalDupSpans` (X69) in both
    * mechanism and scope: that operator hashes fixed windows and only
    * counts CROSS-document sharing; this one derives the same span
    * semantics from SA adjacency and flags within-document repeats too
    * (a doc that repeats its own boilerplate is still training-data
    * duplication). The DuckDB oracle recomputes the result by the
    * L-gram method — an INDEPENDENT algorithm agreeing on the output is
    * the strongest equivalence check the harness can express.
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    require(spanTokens >= 2, s"spanTokens ($spanTokens) must be >= 2")
    val pairs = adjacentLcp(docs, idCol, textCol, spanTokens)
      .filter(col("lcp") >= spanTokens)
    val flagged = pairs.select(col("doc_a").as("doc"), col("pos_a").as("pos"))
      .unionByName(pairs.select(col("doc_b").as("doc"), col("pos_b").as("pos")))
      .distinct()
    val byDoc = Window.partitionBy("doc").orderBy("pos")
    flagged
      .withColumn("_isl", col("pos") - row_number().over(byDoc))
      .groupBy("doc", "_isl")
      .agg(min("pos").as("span_start"),
        (max("pos") - min("pos") + spanTokens).cast("long").as("span_tokens"))
      .select(col("doc").as(idCol), col("span_start"), col("span_tokens"))
      .orderBy(idCol, "span_start")
  }

  /** Top-k longest left-maximal repeated substrings in the corpus:
    * (doc_a, pos_a, doc_b, pos_b, lcp_tokens), k pairs with the largest
    * adjacent-suffix LCP ≥ minTokens, over [[adjacentLcp]]'s pairs.
    *
    * - Left-maximal filter (preceding words differ, null-safe: two
    *   doc-START occurrences cannot extend left and stay) collapses the
    *   shift family of a long repeat — without it a single 50-token
    *   duplication floods the top-k with its 49 suffix-shifted
    *   sub-repeats.
    * - Top-k = TakeOrdered on (lcp DESC, ids) — no full-result sort.
    */
  def longestRepeats(docs: DataFrame, idCol: String, textCol: String,
      topK: Int, minTokens: Int): DataFrame = {
    val t = tokens(docs, idCol, textCol)
    val state = adjacentLcp(docs, idCol, textCol, minTokens)
    // left-maximality: the words before each occurrence differ (or one
    // occurrence starts its document)
    val prev = t.select(col("doc"), (col("pos") + 1).as("nxtpos"), col("word"))
    state
      .join(prev.select(col("doc").as("doc_a"), col("nxtpos").as("pos_a"),
        col("word").as("_wa")), Seq("doc_a", "pos_a"), "left")
      .join(prev.select(col("doc").as("doc_b"), col("nxtpos").as("pos_b"),
        col("word").as("_wb")), Seq("doc_b", "pos_b"), "left")
      // drop only when BOTH occurrences have a preceding word and it is
      // the same word (the pair extends left). Two doc-START occurrences
      // (both prev null) cannot extend left — they are left-maximal.
      .filter(!(col("_wa") <=> col("_wb")) || col("_wa").isNull)
      .filter(col("lcp") >= minTokens)
      .select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"),
        col("lcp").as("lcp_tokens"))
      .orderBy(col("lcp_tokens").desc, col("doc_a"), col("pos_a"),
        col("doc_b"), col("pos_b"))
      .limit(topK)
  }
}
