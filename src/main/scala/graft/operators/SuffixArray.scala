package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed word-level suffix array by prefix doubling, with LCP
  * extraction — the exact-substring-dedup machinery of Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better",
  * reference `main.py`-era pipelines run this as a corpus batch job),
  * re-expressed in Spark's sort-based execution model instead of the
  * paper's single-node in-memory suffix automaton.
  *
  * WHY a suffix array when the repo already has fixed-window span dedup
  * (`TextOps.substringDupStats` / `maximalDupSpans`): the L-gram method
  * must fix the span length L BEFORE the scan, and answers only "spans
  * of length ≥ L". The suffix array ranks every suffix once and then
  * answers ANY length threshold — including "what is the longest
  * repeated substring in the corpus", which no a-priori L can find.
  *
  * Construction = the standard distributed prefix-doubling loop
  * [Manber–Myers ranks; distributed formulation as in Flick & Aluru,
  * SC'15]: O(log maxDocLen) rounds, each round a shifted self-join on
  * (doc, pos+m) plus a dense-rank of the (r₁, r₂) pairs. Dense ranking
  * at scale is sort → `zipWithIndex` (range-partitioned global sort; the
  * index job ships one Long PER PARTITION to the driver — metadata, not
  * rows). Suffixes never materialize: state is one (doc, pos, rank) row
  * per token per round, so a 10¹¹-token corpus carries ~17 rounds of
  * 24-byte rows through the shuffle — the oracle, by contrast, sorts the
  * O(n·len) expanded suffixes and is viable only at test scale.
  *
  * Suffix comparison is per-document (a suffix stops at its document's
  * end): positions past the end rank as −1, which sorts before every
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

  /** Tokenize to one row per (doc, pos(1-based), word); single-space
    * split, the corpus-wide tokenizer contract (TextOps.words).
    */
  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos0", "word")))
      .select(col("doc"), (col("pos0") + 1).as("pos"), col("word"))

  /** Prefix-doubling rank tables: (m, ranks(doc, pos, rank)) for
    * m = 1, 2, 4, … — rank m orders length-min(m, suffixLen) prefixes.
    * Stops once every rank is distinct (one 1-row scalar per round) or
    * m ≥ maxDocLen; ties that survive to the end are exactly-equal
    * suffixes. Each round localCheckpoints: the next round, the SA sort
    * and the log-level LCP descent all re-read these tables, and an
    * uncut lineage would re-run every prior round per consumer.
    */
  def rankTables(docs: DataFrame, idCol: String, textCol: String): Seq[(Int, DataFrame)] = {
    val t = tokens(docs, idCol, textCol)
    val maxLen = t.groupBy("doc").count().agg(max("count")).head().getLong(0).toInt
    val words = t.select("word").distinct().orderBy("word")
    var ranks = t.join(withZipIndex(words, "rank"), "word")
      .select(col("doc"), col("pos"), col("rank"))
      .localCheckpoint(true)
    val nPos = ranks.count()
    var tables = List((1, ranks))
    var m = 1
    var allDistinct =
      ranks.agg(countDistinct("rank")).head().getLong(0) == nPos
    while (m < maxLen && !allDistinct) {
      val shifted = ranks.select(col("doc"), (col("pos") - m).as("pos"),
        col("rank").as("r2"))
      val pairs = ranks.join(shifted, Seq("doc", "pos"), "left")
        .select(col("doc"), col("pos"), col("rank").as("r1"),
          coalesce(col("r2"), lit(-1L)).as("r2")) // past doc end → sentinel
      val keys = pairs.select("r1", "r2").distinct().orderBy("r1", "r2")
      ranks = pairs.join(withZipIndex(keys, "nrank"), Seq("r1", "r2"))
        .select(col("doc"), col("pos"), col("nrank").as("rank"))
        .localCheckpoint(true)
      m *= 2
      tables ::= ((m, ranks))
      allDistinct = ranks.agg(countDistinct("rank")).head().getLong(0) == nPos
    }
    tables.reverse
  }

  /** Top-k longest left-maximal repeated substrings in the corpus:
    * (doc_a, pos_a, doc_b, pos_b, lcp_tokens), k pairs with the largest
    * adjacent-suffix LCP ≥ minTokens.
    *
    * - SA order = final rank, ties (exactly-equal suffixes) broken by
    *   (doc, pos); adjacency via an idx = idx+1 self-join on the
    *   zip-indexed order.
    * - LCP by binary descent over the stored rank tables, largest m
    *   first: ranks equal at level m ⇒ advance both cursors by
    *   min(m, tokens left on either side) — the `least` guard is what
    *   keeps truncated-prefix equality (both suffixes end inside the
    *   window) from overcounting. O(log maxLen) equi-joins over the n−1
    *   adjacent pairs, never a character/word re-comparison.
    * - Left-maximal filter (preceding words differ, null-safe for
    *   pos = 1) collapses the shift family of a long repeat — without it
    *   a single 50-token duplication floods the top-k with its 49
    *   suffix-shifted sub-repeats.
    * - Top-k = TakeOrdered on (lcp DESC, ids) — no full-result sort.
    */
  def longestRepeats(docs: DataFrame, idCol: String, textCol: String,
      topK: Int, minTokens: Int): DataFrame = {
    val tables = rankTables(docs, idCol, textCol)
    val t = tokens(docs, idCol, textCol)
    val lens = t.groupBy("doc").agg(max("pos").as("len"))
    val sa = withZipIndex(
      tables.last._2.orderBy("rank", "doc", "pos"), "idx")
    val nxt = sa.select((col("idx") - 1).as("idx"),
      col("doc").as("doc_b"), col("pos").as("pos_b"))
    var state = sa.join(nxt, "idx")
      .select(col("doc").as("doc_a"), col("pos").as("pos_a"),
        col("doc_b"), col("pos_b"))
      .join(lens.select(col("doc").as("doc_a"), col("len").as("len_a")), "doc_a")
      .join(lens.select(col("doc").as("doc_b"), col("len").as("len_b")), "doc_b")
      .withColumn("off_a", col("pos_a"))
      .withColumn("off_b", col("pos_b"))
      .withColumn("lcp", lit(0L))
    for ((m, tbl) <- tables.sortBy(-_._1)) {
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
