package graft

import org.apache.spark.sql.functions._
import graft.queries.Tables
import graft.llm.VectorOps

/** Structural plan audits: the properties we check by eye with
  * `.explain("formatted")` after every operator change, pinned as
  * assertions so a regression (lost pushdown, lost map-side combine, a
  * broadcast silently becoming a shuffle join) fails CI instead of
  * quietly costing 10× at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter and projection reach the parquet scan (pushdown + pruning)") {
    val q = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") < 5.0)
      .select("l_orderkey", "l_quantity")
    val p = plan(q)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity"),
      s"filter must be pushed to the scan:\n$p")
    // ReadSchema carries only the projected columns — a scan reading all
    // 16 lineitem columns for a 2-column projection is wrong
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"),
      s"column pruning lost: $readSchema")
  }

  test("min_by keep-first dedup gets a map-side partial aggregate") {
    val q = graft.llm.TextOps.exactDedup(
      Tables(spark, dir, "documents"), "text", "doc_id")
    val p = plan(q)
    // NOTE: min_by over a struct payload compiles to SortAggregate (struct
    // buffers aren't hash-aggregable) — but the PARTIAL mode is what
    // matters at scale: the shuffle carries ~|keys| combined rows, not
    // every input row. Measured: still 3× faster than the row_number
    // window form at sf0.1 despite the per-partition sort.
    assert(p.contains("partial_min_by"),
      s"dedup must partial-aggregate before the exchange:\n$p")
    // and it must NOT be the full-sort window form
    assert(!p.contains("row_number"), "keep-first must not use a sort window")
  }

  test("topK joins the query set via broadcast, not a shuffle") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val qs = emb.filter(col("vec_id") % 100 === 0)
    val p = plan(VectorOps.topK(emb, qs, "vec_id", "qv", k = 5))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin")
      || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
  }

  test("vocabulary count partial-aggregates before its single exchange") {
    val q = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    val p = plan(q)
    assert(p.contains("partial_count") || p.contains("partial count")
      || p.toLowerCase.contains("partial"),
      s"word count must map-side combine:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"exactly one shuffle expected:\n$p")
  }

  test("stratified sample never funnels the corpus onto a SinglePartition") {
    val q = graft.operators.Sampling.stratifiedTopK(
      Tables(spark, dir, "documents").select("doc_id", "lang"),
      "lang", "doc_id", k = 5, salt = "audit")
    val p = plan(q)
    assert(!p.contains("Exchange SinglePartition"),
      s"two-phase top-k must not collapse to one partition:\n$p")
    // phase 1 runs on the (stratum, salt-bucket) composite key, so the
    // first window exchange hashes on both columns
    assert(p.contains("hashpartitioning(lang"),
      s"phase-1 window must partition by (stratum, bucket):\n$p")
  }

  test("incremental dedup stays equi-join: no cartesian/nested-loop") {
    val docs = Tables(spark, dir, "documents")
    val q = graft.llm.TextOps.incrementalDedup(
      docs.filter(col("doc_id") % 4 === 0),
      docs.filter(col("doc_id") % 4 =!= 0), "doc_id", "text")
    val p = plan(q)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bipartite LSH must never degenerate to an all-pairs join:\n$p")
  }

  test("connected components round is join + partial-combine aggregate") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    // audit one propagation round's shape (the loop repeats it verbatim)
    val sym = edges.select(col("a").as("node"), col("b").as("nbr"))
      .union(edges.select(col("b").as("node"), col("a").as("nbr")))
    val labels = sym.select("node").distinct().withColumn("label", col("node"))
    val round = sym.join(labels.select(col("node").as("nbr"), col("label")), "nbr")
      .groupBy("node").agg(min("label").as("nbr_min"))
    val p = plan(round)
    assert(p.contains("partial_min") || p.toLowerCase.contains("partial"),
      s"per-round min must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"round must be an equi-join:\n$p")
  }

  test("kMeans assignment broadcasts the centroid table, never shuffles the corpus into it") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val p = plan(VectorOps.kMeans(emb, "vec_id", "qv", k = 4, iters = 1))
    assert(p.contains("BroadcastExchange"),
      s"k centroids must broadcast to the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"assignment must not sort-merge the corpus:\n$p")
  }

  test("semantic-dedup pair join is a hash equi-join on the cluster id") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val withC = emb.withColumn("centroid_id", col("vec_id") % 4) // stand-in assignment
    val q = withC.select(col("centroid_id"), col("vec_id").as("id_a"), col("qv").as("_va"))
      .join(withC.select(col("centroid_id"), col("vec_id").as("id_b"), col("qv").as("_vb")),
        Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
    val p = plan(q)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cluster-local pairing must be an equi-join on centroid_id:\n$p")
  }

  test("substring-span detection is equi-join + partial aggregates, never all-pairs") {
    val q = graft.llm.TextOps.substringDupStats(
      Tables(spark, dir, "documents"), "doc_id", "text", spanTokens = 10)
    val p = plan(q)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span candidates must come from the fingerprint equi-join:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"span-group and per-doc aggregates must map-side combine:\n$p")
  }

  test("vocab-sized joins (tfidf, unigram model) carry no mandated broadcast hint") {
    // |vocab| grows with the corpus (Heaps' law) — a hard broadcast() on
    // the document-frequency / unigram-model side would OOM at scale no
    // matter what AQE wants. The hint survives analysis as ResolvedHint,
    // so its absence in the analyzed plan proves the join strategy is
    // left to the optimizer (which may still CHOOSE broadcast from stats
    // at test scale — that choice is fine; mandating it is not).
    for (name <- Seq("llm_tfidf", "llm_unigram_logprob")) {
      val q = graft.queries.LlmSurface.queries(name)(spark, dir)
      val analyzed = q.queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"),
        s"$name must not force a join strategy on the vocab table:\n$analyzed")
    }
  }

  test("set-similarity join stays equi-join: no cartesian/nested-loop") {
    val q = graft.llm.TextOps.setSimJoin(
      Tables(spark, dir, "documents"), "doc_id", "text")
    val p = plan(q)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix-filtered candidates must come from an equi-join:\n$p")
  }

  test("classifier inference is equi-join + partial aggregates, no cartesian") {
    val docs = Tables(spark, dir, "documents")
    val q = graft.llm.TextOps.linearScore(
      graft.llm.TextOps.hashedFeatures(docs, "doc_id", "text", 1024, "feat"),
      graft.llm.TextOps.hashModelWeights(spark, 1024, "wgt"))
    val p = plan(q)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"model scoring must equi-join the weight table:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"per-doc logit must map-side combine:\n$p")
  }

  test("PQ ADC search: code/LUT equi-join, heap-aggregate top-k (no per-query sort)") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val cb = VectorOps.pqCodebooks(emb, "vec_id", "qv", m = 2, subDim = 32,
      ksub = 4, iters = 2)
    val codes = VectorOps.pqEncode(emb, "vec_id", "qv", cb, m = 2, subDim = 32)
    val qs = emb.filter(col("vec_id") % 100 === 0)
    val p = plan(VectorOps.pqTopK(codes, qs, cb, "vec_id", "qv", k = 5,
      m = 2, subDim = 32))
    assert(!p.contains("CartesianProduct"),
      s"ADC scoring must join codes to LUTs, never cross:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"top-k must run through the bounded heap aggregate:\n$p")
    assert(!p.contains("row_number"),
      s"top-k must not sort every candidate per query:\n$p")
  }

  test("line dedup: equi-joins + partial aggregates, corpus never on one partition") {
    val q = graft.llm.TextOps.lineDedup(
      Tables(spark, dir, "documents").withColumn("aug", col("text")),
      "doc_id", "aug")
    val p = plan(q)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"common-line detection must be an equi-join on the line hash:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"line-frequency count must map-side combine:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no stage may funnel the corpus onto one partition:\n$p")
  }

  test("inverted index: stats and postings branches share one tf aggregation") {
    val q = graft.llm.TextOps.invertedIndex(
      Tables(spark, dir, "documents"), "doc_id", "text", maxDf = 100)
    // AQE resolves exchange reuse at execution — run, then audit the
    // final adaptive plan (same discipline as the codegen audit)
    q.collect()
    val p = plan(q)
    // both branches aggregate the same (word, doc) tf subtree — Catalyst
    // must reuse that exchange, not explode the corpus twice
    assert(p.contains("ReusedExchange") || p.contains("ReusedSubquery")
      || p.contains("TableCacheQueryStage"),
      s"tf exchange must be computed once and reused:\n$p")
    assert(!p.contains("row_number"),
      s"posting assembly must not rank-window every row:\n$p")
  }

  test("PageRank round: edge equi-join + partial-combine inflow sum") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val p = plan(graft.operators.PageRank.run(edges, nodes, iters = 1,
      materialize = identity))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"rank must flow through equi-joins only:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"inflow sum must map-side combine (celebrity dst absorbed):\n$p")
  }

  test("BPE pair top-k is TakeOrdered, never a global sort exchange") {
    val q = graft.llm.TextOps.bpePairCounts(
      Tables(spark, dir, "documents"), "text", topK = 20)
    val p = plan(q)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must run per-partition heaps + driver merge of k:\n$p")
  }

  test("compaction plan windows per group — the listing never hits one partition") {
    val files = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id").as("f"), col("n_chars").as("b"))
    val p = plan(graft.operators.Compaction
      .compactionPlan(files, "source", "f", "b", 4000L))
    assert(!p.contains("Exchange SinglePartition"),
      s"metadata window must partition by group, not collapse:\n$p")
    assert(p.contains("hashpartitioning(source"),
      s"window exchange must hash on the group column:\n$p")
  }

  test("skipping index is one partial-combine aggregation on (layout, file)") {
    val ev = Tables.events(spark, dir).select(
      (col("user_id") % 64).cast("int").as("x"),
      (col("event_id") % 64).cast("int").as("y"),
      (col("event_id") % 16).as("file"))
      .withColumn("layout", lit("t"))
    val p = plan(graft.operators.ZOrder
      .skippingIndex(ev, "layout", "file", "x", "y", 0, 7, 0, 7))
    assert(p.toLowerCase.contains("partial"),
      s"footer stats must map-side combine:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"exactly one shuffle expected:\n$p")
  }

  test("incremental state merge partial-aggregates both levels, no collapse") {
    import graft.operators.IncrementalAgg._
    val docs = Tables(spark, dir, "documents")
    val p = plan(mergeStates(Seq(
      state(docs.filter(col("doc_id") % 2 === 0), "source", "doc_id", "n_chars"),
      state(docs.filter(col("doc_id") % 2 =!= 0), "source", "doc_id", "n_chars"))))
    assert(p.toLowerCase.contains("partial"),
      s"monoid components must map-side combine:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"no driver funnel:\n$p")
  }

  test("a selective dim filter injects a runtime BLOOM filter on the fact scan") {
    // Spark's InjectRuntimeFilter (the semi-join reduction a 100 TB
    // fact⋈dim lives on when the dim is too big to broadcast): the
    // dim side's selective predicate becomes a bloom filter probed as
    // `might_contain` on the fact side BEFORE its shuffle, cutting the
    // exchanged rows to ~the join's selectivity. Thresholds are sized
    // for clusters, so pin them down to make the optimizer fire at
    // test scale — the AUDIT is that the rewrite happens at all (a
    // Spark upgrade silently losing it would cost the full fact
    // shuffle at scale).
    val pairs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = pairs.map { case (k, _) => k -> util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables(spark, dir, "lineitem")
      val o = Tables(spark, dir, "orders").filter(col("o_totalprice") > 300000)
      val p = plan(li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice"))
      assert(p.contains("might_contain"),
        s"runtime bloom filter must reach the fact side:\n$p")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("triangle enumeration is equi-joins only — no cartesian/nested-loop") {
    val edges = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("src"),
        (col("doc_id") - (col("doc_id") % 10)).as("dst"))
    val p = plan(graft.operators.Triangles.triangleList(edges, "src", "dst"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"wedge and closing steps must stay equi-joins:\n$p")
  }

  test("retention matrix: distinct collapse then plain counts, no count_distinct Expand") {
    val p = plan(graft.llm.EventOps.retentionMatrix(
      Tables.events(spark, dir), "user_id", "ts", maxOffset = 7))
    assert(!p.contains("Expand"),
      s"counts must run over already-distinct rows, not a count_distinct Expand:\n$p")
    assert(p.toLowerCase.contains("partial"), s"aggs must map-side combine:\n$p")
  }

  test("trending terms: support filter sits below the self-join") {
    val q = graft.llm.TextOps.trendingTerms(
      Tables(spark, dir, "documents").withColumn("day", col("doc_id") % 7),
      "day", "text", minCount = 10)
    val p = q.queryExecution.optimizedPlan.toString
    // the n >= minCount predicate must appear under the join (pushed into
    // the aggregated side), not above it
    val joinIdx = p.indexOf("Join")
    val filtIdx = p.indexOf(">= 10")
    assert(joinIdx >= 0 && filtIdx > joinIdx,
      s"support filter must prune before the shuffle join:\n$p")
  }

  test("water-fill windows confine the single partition to the metadata table") {
    val toks = Tables(spark, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("_t"))
      .groupBy("source").agg(sum("_t").as("avail"))
    val p = plan(graft.llm.TextOps.waterFill(toks, "source", "avail", 10000L))
    // the corpus-side aggregation must partial-combine BEFORE any
    // single-partition exchange; the windows themselves run over the
    // |sources|-row table, which is the documented bounded pattern
    val idx = p.indexOf("Exchange SinglePartition")
    val partialIdx = p.toLowerCase.indexOf("partial")
    assert(partialIdx >= 0, s"corpus agg must map-side combine:\n$p")
    assert(idx < 0 || p.substring(idx).contains("hashpartitioning")
      || partialIdx < idx,
      s"single-partition window must sit above the combined source table:\n$p")
  }

  test("heavy hitters: constant-width sketch agg combines map-side, probes broadcast") {
    val q = graft.llm.TextOps.heavyHitters(
      Tables(spark, dir, "documents"), "text", supportPpm = 2000L)
    val p = plan(q)
    // the sketch aggregation and the exact confirm must both partial-
    // combine before their exchanges (the whole point: shuffle keys are
    // d×w constants resp. candidate words, never the vocabulary tail)
    assert(p.toLowerCase.contains("partial"),
      s"sketch/confirm aggs must map-side combine:\n$p")
    // the depth sketch probes must be broadcast joins — a shuffle join
    // here would re-introduce the per-token exchange the sketch avoids
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"sketch probes must broadcast:\n$p")
  }

  test("suffix-array construction: per-doc windows, no cartesian, no single-partition window") {
    val docs = Tables(spark, dir, "documents").limit(100)
    val tables = graft.operators.SuffixArray.rankTables(docs, "doc_id", "text")
    // rounds = 1 (words) + ceil(log4(maxDocLen ~100)) — quadrupling, not
    // doubling: the round count IS the scale claim
    assert(tables.size >= 3 && tables.size <= 6, s"rounds: ${tables.size}")
    val final_ = tables.last._2
    val p = plan(final_.filter(col("rank") >= 0))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"construction must stay equi-join/window shaped:\n$p")
  }

  test("KMV set ops: one corpus scan, sketch matrix via broadcast self-join") {
    // the sketch-BUILD half (one scan, partial-combining object-hash agg)
    val build = Tables(spark, dir, "documents")
      .select(col("source"),
        explode(graft.llm.TextOps.words(col("text"))).as("w"))
      .groupBy("source")
      .agg(expr("bottomk_distinct_long(cast(conv(substring(md5(concat('kmv|', w)), 1, 15), 16, 10) as bigint), 128)"))
    val bp = plan(build)
    assert("Scan parquet".r.findAllIn(bp).size === 1,
      s"sketch build must scan the corpus once:\n$bp")
    assert(bp.contains("ObjectHashAggregate"),
      s"bottomk_distinct_long must plan as partial-combining ObjectHashAggregate:\n$bp")
    // the PAIR half: the registered query checkpoints the |sources|-row
    // sketch table (so the corpus scan is not re-run per join side — the
    // plan must carry ZERO parquet scans) and broadcasts the matrix join
    val q = graft.queries.LlmSurface.queries("llm_kmv_set_ops")(spark, dir)
    q.collect() // resolve AQE final plan
    val p = plan(q)
    assert(!p.contains("Scan parquet"),
      s"pair matrix must read the materialized sketches, not rescan the corpus:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"the |sources|-row pair matrix must broadcast:\n$p")
  }

  test("incremental curate: probe join only — corpus never self-pairs") {
    // the probe form's join inputs: one side is the |batch|-sized probe.
    // Pin the pair count instead of the plan string (the plan is deep):
    // a union SELF-join at sf0.001 yields hundreds of v1×v1 pairs; the
    // probe form must emit none.
    val v1 = Tables(spark, dir, "documents").select("doc_id", "text")
    val batch = v1.filter(col("doc_id") % 29 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" new")).as("text"))
    val pairs = graft.llm.TextOps.simHashNearDupProbe(
      v1.unionByName(batch), batch, "doc_id", "text", maxHamming = 3, chunks = 4)
    val v1v1 = pairs.filter(col("doc_a") < 1000000L && col("doc_b") < 1000000L)
    assert(v1v1.count() === 0, "probe output must contain no corpus-corpus pair")
    assert(pairs.count() > 0)
  }

  test("whole-stage codegen covers the scalar-heavy Q1 chain") {
    val q = graft.queries.RefSurface.queries("q1_clean_valid")(spark, dir)
    // AQE prints `isFinalPlan=false` with no codegen spans until the query
    // actually runs — execute THIS dataframe (count() would plan a
    // different query), then audit the final adaptive plan
    q.collect()
    val p = plan(q)
    // the adaptive final plan marks codegen stages with the `*(n)` star
    // prefix (the literal "WholeStageCodegen" only appears in formatted
    // explain); the scalar chain's Project/Filter must carry it
    assert(p.contains("*(") && p.linesIterator.exists(l =>
      l.contains("*(") && l.contains("Project")),
      s"Q1's narrow chain must run inside codegen:\n$p")
  }

  test("ORC readback pushes the predicate to the stripe reader") {
    val out = "/tmp/graft_k11_plan_audit"
    Tables(spark, dir, "documents").write.mode("overwrite").orc(out)
    val q = spark.read.orc(out).filter(col("n_chars") >= 50)
      .select("doc_id", "n_chars")
    val p = plan(q)
    assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThanOrEqual(n_chars"),
      s"ORC scan must carry the pushed predicate:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), s"ORC column pruning lost: $readSchema")
  }

  test("k12 bucketed join: the join itself is exchange-free (shuffles only for agg + sort)") {
    graft.queries.RefSurface.queries("k12_bucketed_join")(spark, dir).collect()
    // re-derive the join part from the written bucketed tables, under
    // the same no-broadcast condition the query materializes with
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("k12_docs_sf0_001")
        .join(spark.table("k12_emb_sf0_001"), col("doc_id") === col("vec_id"))
      val p = plan(j)
      assert(p.contains("SortMergeJoin"), s"expected bucketed SMJ:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("blocklist scan: no shuffle before the hit aggregation, pattern table broadcast") {
    val q = graft.queries.LlmSurface.queries("llm_blocklist")(spark, dir)
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"pattern lookup must be a broadcast join:\n$p")
    // exactly the agg exchange (partial → final) plus the final sort's
    // range exchange — the corpus scan itself must not shuffle first
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"expected <=2 exchanges (agg + sort), got $exchanges:\n$p")
  }

  test("Mondrian round: decision table broadcast onto the corpus, " +
    "no cartesian, cut window keyed by region") {
    // two rounds, materialize = identity so the round plans are
    // visible. Round 0's region is the constant 0, so Catalyst folds
    // its decision join into an inner join on a 1-ROW broadcast (a
    // BroadcastNestedLoopJoin whose build side is the single round-0
    // decision — the accepted 1-row-broadcast shape); round 1 is the
    // steady state this audit pins: a broadcast HASH join on the now
    // varying region key, and a region-partitioned decision window.
    val rows = Tables(spark, dir, "orders").select(
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
        .cast("long").as("eday"))
    val q = graft.operators.Mondrian.partition(rows, "cents", "eday",
      k = 50, depth = 2, w1 = 500000L, w2 = 30L, materialize = identity)
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin"),
      s"steady-state decisions must broadcast-HASH-join the corpus:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"Mondrian must never pair corpus rows:\n$p")
    // the steady-state cut window runs over the region x bucket
    // metadata table, keyed by region — never over raw corpus rows
    assert(p.contains("hashpartitioning(region"),
      s"decision window must partition by region:\n$p")
  }

  test("k-center argmax is TakeOrdered, never a global sort exchange") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val q = VectorOps.kCenterGreedy(emb, "vec_id", "qv", k = 2,
      materialize = identity)
    val p = plan(q)
    assert(p.contains("TakeOrderedAndProject"),
      s"per-round argmax must be TakeOrdered(1):\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort exchange for a 1-row argmax:\n$p")
  }

  test("histogram stats: every corpus scan pruned to the price column") {
    val q = graft.queries.RefSurface.queries("p_histogram_stats")(spark, dir)
    val p = plan(q)
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty)
    schemas.foreach { rs =>
      assert(rs.contains("l_extendedprice") && !rs.contains("l_comment")
        && !rs.contains("l_orderkey"),
        s"scan must read only l_extendedprice: $rs")
    }
  }

  test("weighted MinHash candidates come from band EQUALITY, never a " +
    "cartesian") {
    val q = graft.llm.TextOps.weightedMinhashPairs(
      Tables(spark, dir, "documents"), "doc_id", "text",
      cap = 4, k = 16, bandRows = 8, salt = "wmh")
    val p = plan(q)
    assert(!p.contains("CartesianProduct"),
      s"band join must be an equi-join:\n$p")
  }

  test("permutation FDR is one fan-out pass + combine aggregation, " +
    "no cartesian") {
    val ev = Tables(spark, dir, "events")
    val q = graft.llm.EventOps.permutationFdr(ev, "user_id", "event_type",
      "value", perms = 63)
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the metric×(B+1) cell table must be partially aggregated before
    // its exchange — the map-side combine is what makes one pass viable
    assert(p.contains("partial_"), s"cells must combine map-side:\n$p")
  }

  test("PSI bin assignment joins boundaries, never sorts the corpus") {
    val ev = Tables(spark, dir, "events")
    val q = graft.llm.EventOps.psiDrift(ev, "event_type", "ts", "value",
      "2024-01-15", bins = 10)
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the only global sort allowed is the final output orderBy; the
    // corpus-sized frames reach it already reduced to metadata
    assert(!p.contains("Exchange rangepartitioning(cents"),
      s"corpus must not be range-sorted by value:\n$p")
  }

  test("link prediction wedges come from center-key equi-joins, " +
    "never a cartesian") {
    val rel = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = graft.operators.BipartiteProjection.project(
      rel, "l_orderkey", "l_partkey", cap = 5, minWeight = 2)
    val q = graft.operators.LinkPrediction.scores(edges, "item_a",
      "item_b", cap = 12, topK = 50)
    val p = plan(q)
    assert(!p.contains("CartesianProduct"),
      s"wedge join must be an equi-join on the center key:\n$p")
    // the top-k is a TakeOrdered, not a global sort-then-limit
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered:\n$p")
  }

  test("association rules prune by support BEFORE the item-support " +
    "joins and never go cartesian") {
    val rel = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .select(col("l_orderkey"), col("l_partkey"))
    val q = graft.operators.AssociationRules.rules(rel, "l_orderkey",
      "l_partkey", cap = 5, minSupport = 2, topK = 40)
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the 1-row basket-count crossJoin is the only nested-loop join
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"only the 1-row total may nested-loop:\n$p")
  }

  test("EMD drift reduces the corpus to the cents histogram before " +
    "any window") {
    val ev = Tables(spark, dir, "events")
    val q = graft.llm.EventOps.emdDrift(ev, "event_type", "value", "ts",
      "2024-01-16")
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_"), s"histogram must map-side combine:\n$p")
    // windows run per metric — never a single-partition funnel
    assert(!p.contains("Exchange SinglePartition"),
      s"per-metric windows must not collapse to one partition:\n$p")
  }

  test("QTE decile walks stay per-(metric, arm), no single partition") {
    val ev = Tables(spark, dir, "events")
    val q = graft.llm.EventOps.quantileTreatmentEffects(ev, "user_id",
      "event_type", "value")
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"per-(metric, arm) windows must not collapse:\n$p")
  }

  test("Kneser-Ney scoring is equi-joins over combine-agg tables") {
    val q = graft.llm.TextOps.knCrossEntropy(
      Tables(spark, dir, "documents"), "doc_id", "text")
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // scalar totals may nested-loop as 1-row broadcasts; nothing else
    assert(p.contains("partial_"), s"count tables must map-side combine:\n$p")
  }

  test("keyness is one tokenize pass with a TakeOrdered top-k") {
    val q = graft.llm.TextOps.dunningKeyness(
      Tables(spark, dir, "documents"), "text",
      org.apache.spark.sql.functions.col("source") === "src7", topK = 10)
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global sort:\n$p")
  }

  test("rater kappa is ONE combine-agg pass to a scalar row") {
    import org.apache.spark.sql.functions._
    val d = Tables(spark, dir, "documents")
    val q = graft.llm.EvalOps.raterKappa(d, Seq(
      "len" -> (col("n_chars") >= 250),
      "ttr" -> (size(array_distinct(split(col("text"), " "))) * 5
        >= size(split(col("text"), " ")) * 2)))
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_"), s"the agg must map-side combine:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"a global scalar agg needs no hash shuffle:\n$p")
  }

  test("shapley coverage is equi-join only, combine-agg both sides") {
    val q = graft.llm.EvalOps.shapleyCoverage(
      Tables(spark, dir, "documents"), "source", "text")
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the word-count join must be an equi-join:\n$p")
    assert(p.contains("partial_"), s"aggs must map-side combine:\n$p")
  }

  test("bradley-terry rounds run on the model-sized pair table only") {
    import org.apache.spark.sql.functions._
    val m = Tables(spark, dir, "documents").select(
      col("source").as("winner"),
      concat(col("source"), lit("x")).as("loser"))
    val q = graft.llm.EvalOps.bradleyTerry(m, "winner", "loser", rounds = 2)
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the corpus appears once (the wins agg); rounds read checkpoints
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"round state must come from checkpoints, not corpus re-scans:\n$p")
  }

  test("DBSCAN candidates come from the chunk equi-join, no all-pairs") {
    val q = graft.operators.HammingDbscan.cluster(
      graft.llm.TextOps.simHash(Tables(spark, dir, "documents"),
        "doc_id", "text"),
      "doc_id", "simhash", maxHamming = 3, minPts = 3)
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"every join must be an equi-join:\n$p")
  }

  test("MI screening: vocab-bounded grid, broadcast marginals, TakeOrdered") {
    import org.apache.spark.sql.functions._
    val q = graft.llm.FeatureOps.miFeatures(
      Tables(spark, dir, "documents"), "doc_id", "text", col("lang"))
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"label marginals must broadcast:\n$p")
  }

  test("MAD census never sorts the corpus by value") {
    val q = graft.llm.EventOps.madOutliers(
      Tables(spark, dir, "events"), "event_type", "value")
    val p = plan(q)
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(!p.contains("Exchange rangepartitioning(c"),
      s"order statistics must come from histogram walks:\n$p")
  }

  test("graph-ANN edges: bucket equi-join candidates, no all-pairs") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val p = plan(VectorOps.graphAnnEdges(emb, "vec_id", "qv",
      shards = 4, bits = 4, degree = 6, ringLinks = 2))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"edge candidates must be (shard, bucket)/rank equi-joins:\n$p")
  }

  test("sorted-neighborhood pairing is a rank equi-join, never a range join") {
    val recs = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val p = plan(graft.operators.RecordLinkage.sortedNeighborhoodPairs(
      recs, "id", Seq(reverse(col("name"))), w = 6))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"window pairing must be the offset equi-join:\n$p")
  }

  test("pLSA round: E-step equi-joins, M-step partial combine") {
    val p = plan(graft.llm.TopicOps.plsaTopics(
      Tables(spark, dir, "documents"), "doc_id", "text",
      k = 2, rounds = 1, topWords = 3, materialize = identity))
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"M-step aggregations must partial-combine:\n$p")
  }

  test("ALS half-step: ratings equi-join + partial-combining normal equations") {
    val r = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("cust"), col("l_partkey").as("item"),
        lit(1L).as("r"))
    val p = plan(graft.llm.AlsOps.alsFactors(r, "cust", "item", "r",
      rounds = 1, materialize = identity))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"no quadratic shape anywhere in ALS:\n$p")
    assert(p.contains("partial_sum"),
      s"A/b sums must partial-combine before the exchange:\n$p")
  }

  test("Boruvka/matching per-component minimum is explode + partial " +
    "combine-min, no sort, no cartesian") {
    import spark.implicits._
    val e = Seq((1L, 2L, 5L), (2L, 3L, 1L)).toDF("clo", "chi", "w")
    val minE = e.select(explode(array(
        struct(col("clo").as("comp"), col("w"), col("clo").as("lo"),
          col("chi").as("hi")),
        struct(col("chi").as("comp"), col("w"), col("clo").as("lo"),
          col("chi").as("hi")))).as("i"))
      .groupBy("i.comp")
      .agg(min(struct(col("i.w"), col("i.lo"), col("i.hi"))).as("m"))
    val p = plan(minE)
    // struct-min plans as SortAggregate: per-partition sorts are fine,
    // the partial_min BEFORE the exchange is the property that matters
    assert(p.contains("partial_min"),
      s"the min-edge pick must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian in the argmin round:\n$p")
  }

  test("proximity probe (incremental MST) is a cell equi-join, " +
    "never all-pairs") {
    import spark.implicits._
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 0L)).toDF("id", "x", "y")
    val p = plan(graft.operators.GridJoin.proximityProbe(
      pts.filter(col("id") === 2), pts, "id", "x", "y", maxDist = 5L))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"probe must join on grid cells:\n$p")
  }

  test("ANF hop: frontier equi-join + anti-join, never all-pairs") {
    val sym = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("_a"), col("l_partkey").as("_b"))
    val frontier = Tables(spark, dir, "part")
      .select(col("p_partkey").as("src"), col("p_partkey").as("node"))
    val hop = frontier.join(sym, col("node") === col("_a"))
      .select(col("src"), col("_b").as("node")).distinct()
      .join(frontier, Seq("src", "node"), "left_anti")
    val p = plan(hop)
    // a pure distinct prints HashAggregate with an empty function list
    // on BOTH sides of its exchange — assert the two-level shape
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"hop must be equi-joins:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"frontier distinct must map-side combine:\n$p")
  }

  test("MMR shortlist broadcasts the query panel onto the corpus " +
    "(pre-checkpoint shape)") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val q = broadcast(emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("_qq")))
    val sl = emb.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("rel", VectorOps.dotQ(col("_qq"), col("qv")))
    val p = plan(sl)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the panel side must broadcast (non-equi join):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unbroadcast cross anywhere:\n$p")
  }

  test("Hilbert per-level staging keeps whole-stage codegen") {
    val ev = Tables(spark, dir, "events")
      .select((col("user_id") % 64).cast("int").as("x"),
        (col("event_id") % 64).cast("int").as("y"))
    val p = plan(graft.operators.Hilbert.withD(ev, "x", "y", 6, "d"))
    // compact executedPlan spells codegen membership as the `*(n)`
    // operator prefix; the staged Projects must all carry it
    assert(p.contains("*(1) Project") || p.contains("WholeStageCodegen"),
      s"the fold must stay inside codegen:\n$p")
  }

  test("facility-location similarity pass broadcasts the candidate pool") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val univ = emb.select(col("vec_id").as("id"), col("qv"))
    val cand = emb.filter(col("vec_id") % 23 === 1)
      .select(col("vec_id").as("cid"), col("qv").as("cqv"))
    val dot = VectorOps.dotFn(spark)
    val sims = univ.crossJoin(broadcast(cand))
      .select(col("id"), col("cid"),
        greatest(dot(col("qv"), col("cqv")), lit(0L)).as("s"))
    val p = plan(sims)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the model-sized pool must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unbroadcast cross:\n$p")
    // and the per-round gain reduction map-side combines
    val g = plan(sims.groupBy("cid")
      .agg(sum(greatest(col("s") - lit(0L), lit(0L))).as("gain")))
    assert(g.toLowerCase.contains("partial"),
      s"gain agg must partial-combine:\n$g")
  }

  test("spectral matvec round: edge equi-join + partial combine sum " +
    "(pre-checkpoint shape)") {
    val e = Tables(spark, dir, "events")
      .select((col("user_id") % 500).as("a"), (col("event_id") % 500).as("b"))
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val x = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("d"))
      .withColumn("x", lit(1000000L))
    val nbr = sym.join(x.select(col("id").as("b"), col("x").as("xj")), "b")
      .groupBy(col("a").as("id")).agg(sum("xj").as("sx"))
    val p = plan(nbr)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"the matvec must be an equi-join:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"neighbor sum must map-side combine:\n$p")
  }

  test("F2 sketch: one exchange, all 16 counters in one partial agg") {
    val q = Tables(spark, dir, "lineitem")
      .select(md5(concat(lit("f2|"), col("l_orderkey").cast("string")))
        .as("h"))
      .agg(
        (0 until 16).map(e =>
          sum(when(conv(substring(col("h"), e + 1, 1), 16, 10)
              .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L)))
            .as(s"x$e")).head,
        (0 until 16).map(e =>
          sum(when(conv(substring(col("h"), e + 1, 1), 16, 10)
              .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L)))
            .as(s"x$e")).tail: _*)
    val p = plan(q)
    assert(p.toLowerCase.contains("partial"),
      s"sign counters must partial-aggregate:\n$p")
    assert("Exchange".r.findAllIn(p).size === 1,
      s"exactly one (single-row) exchange expected:\n$p")
  }

  test("Spearman ranks come from histogram joins — no global row sort") {
    val d = Tables(spark, dir, "documents")
      .select(length(col("text")).cast("long").as("x"),
        (col("doc_id") % 97).as("y"))
    val q = graft.operators.Spearman.spearman(d, "x", "y")
    val p = plan(q)
    // the only sorts allowed are the two value-domain histogram
    // windows; the corpus itself must reach the rank join unsorted
    assert(!p.contains("CartesianProduct"),
      s"rank joins must be equi-joins:\n$p")
    assert(p.toLowerCase.contains("partial"),
      s"histogram + moment aggs must map-side combine:\n$p")
  }

  test("matrix-profile pairing is a (key, offset) equi-join, never all-pairs") {
    val ser = Tables(spark, dir, "events")
      .select(col("event_type").as("key"),
        (col("event_id") % 30).cast("long").as("idx"),
        (col("user_id") % 1000).cast("long").as("x"))
      .groupBy("key", "idx").agg(max("x").as("v"))
    val q = graft.operators.MatrixProfile.profile(ser, "key", "idx", "v",
      w = 7)
    val p = plan(q)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"window pairing must be an equi-join:\n$p")
  }

  test("truth-vote fusion: entity equi-joins + broadcast trust, no cartesian") {
    val base = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("entity"), col("c_nationkey").as("tru"))
    def src(name: String, m: Int) = base.select(col("entity"),
      lit(name).as("source"),
      when(col("entity") % m === 0, (col("tru") + 1) % 25)
        .otherwise(col("tru")).as("val"))
    val q = graft.operators.TruthVote.report(
      src("a", 7).unionByName(src("b", 5)).unionByName(src("c", 3)), base)
    val p = plan(q)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"all fusion joins must be equi-joins:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the source-count-sized trust table must broadcast:\n$p")
  }

  test("kendall cell pair sum joins on the group key, never all-pairs") {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") / 5000.0).cast("long").as("pb"))
    val p = plan(graft.operators.KendallTau.tauB(li, "flag", "qty", "pb"))
    // the x_a < x_b range rides as a post-condition on the group-key
    // equi-join of the VALUE-HISTOGRAM cells; if the equi key were
    // lost the join would degenerate to an all-pairs nested loop and
    // the operator would stop being value-domain-bounded
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"cells self-join must stay an equi-join on the group key:\n$p")
  }

  test("QL retrieval: candidates from postings equi-joins, no cartesian") {
    val p = plan(graft.queries.LlmSurface
      .queries("llm_lm_retrieval")(spark, dir))
    // the 1-row |C| scalar rides a broadcast crossJoin (the house
    // spelling — BNLJ on one row); what must NEVER appear is a true
    // cartesian between queries and the corpus
    assert(!p.contains("CartesianProduct"),
      s"query-doc scoring must come from the word-key postings join:\n$p")
  }

  test("louvain move: gains live on the edge list via equi-joins") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 2L), (3L, 4L, 5L))
      .toDF("a", "b", "w")
    val p = plan(graft.operators.Louvain.moveRound(edges, "a", "b", "w"))
    assert(!p.contains("CartesianProduct"),
      s"degree joins and label joins must stay equi-joins:\n$p")
  }

  // ---- round-13 operators (X375–X381) ----------------------------------

  test("k-truss support: wedge equi-join + semi probe, partial-combine count") {
    import spark.implicits._
    val edges = ((1L to 5L).flatMap(i => ((i + 1) to 5L).map(j => (i, j))))
      .toDF("a", "b")
    // the round-0 full pass AND the incremental affected-front recount
    // must both stay equi-join shaped — audit each helper's plan (the
    // returned frame is a checkpointed leaf after the fixpoint loop)
    val pAll = plan(graft.operators.KTruss.supportAll(edges))
    val pAff = plan(graft.operators.KTruss.supportOf(
      edges.limit(3).select(col("a"), col("b")), edges))
    for ((tag, p) <- Seq("supportAll" -> pAll, "supportOf" -> pAff)) {
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin"),
        s"$tag: triangle support must come from equi-joins, never all-pairs:\n$p")
      assert(p.contains("partial_count") || p.contains("partial count")
        || p.contains("HashAggregate"),
        s"$tag: support count must partial-aggregate map-side:\n$p")
    }
  }

  test("round-14 stats trio: histogram combine-aggs, no cartesian on data") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 5L)).toDF("g", "v")
    for ((tag, q) <- Seq(
        "mood" -> graft.operators.MoodMedian.test(df, "g", "v"),
        "bf" -> graft.operators.BrownForsythe.test(df, "g", "v"),
        "trim" -> graft.operators.TrimmedStats.means(df, "g", "v"))) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$tag: scalar totals may broadcast, data joins must not cross:\n$p")
      assert(p.contains("partial_") || p.contains("HashAggregate"),
        s"$tag: the (group, value) histogram must map-side combine:\n$p")
    }
  }

  test("Bowker: disagreement counts combine-agg; pair grid is metadata") {
    import spark.implicits._
    val df = Seq(("x", "y"), ("y", "x"), ("x", "z")).toDF("a", "b")
    val p = plan(graft.operators.McNemarBowker.test(df, "a", "b"))
    assert(!p.contains("CartesianProduct"),
      s"the label grid must be an inequality join over the tiny label" +
        s" table, never a data cross:\n$p")
    assert(p.contains("partial_") || p.contains("HashAggregate"),
      s"disagreement counts must map-side combine:\n$p")
  }

  test("coreness round: equi-join + per-vertex window, no all-pairs") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val p = plan(graft.operators.Coreness.decompose(edges, "a", "b"))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"h-index rounds are value-attach equi-joins only:\n$p")
  }

  test("maximal matching round: min-combine aggregates + anti-joins only") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val p = plan(
      graft.operators.MaximalMatching.matching(edges, "a", "b"))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"vertex-min and pruning must stay equi/anti joins:\n$p")
  }

  test("AMS F2 sketch: fixed 56-way explode, combine aggs, bounded window") {
    val wc = Tables(spark, dir, "documents")
      .select(col("lang"), explode(graft.llm.TextOps.words(col("text")))
        .as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
    val p = plan(graft.operators.AmsF2.estimate(wc, "lang", "w", "c"))
    assert(!p.contains("CartesianProduct"),
      s"the estimator join must be the group-key equi-join:\n$p")
    // the median window partitions by group — 8 rows per group, never
    // a global single-partition sort of corpus-sized data
    assert(!p.contains("SinglePartition") || p.contains("Exchange hashpartitioning"),
      s"median must run per group:\n$p")
  }

  test("EWMA chart: ONE window pass per series + broadcast moment join") {
    import spark.implicits._
    val rows = (0 until 30).map(i =>
      ("a", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i)), i.toLong)).toDF("k", "day", "x")
    val p = plan(graft.operators.EwmaChart.chart(rows, "k", "day", "x"))
    // the 20 lag terms must collapse into a single Window operator
    assert(p.linesIterator.count(_.trim.startsWith("Window")) <= 1
      || p.split("\\bWindow\\b").length <= 3,
      s"lag chain must live in one window pass:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"per-series moments must broadcast back, not shuffle the chart:\n$p")
  }

  test("Brier decomposition: one combine agg to bins, broadcast total") {
    import spark.implicits._
    val rows = Seq((55L, 1L), (95L, 0L), (15L, 1L)).toDF("f_pct", "y")
    val p = plan(graft.operators.BrierDecomp.decompose(rows, "f_pct", "y"))
    assert(p.contains("BroadcastExchange"),
      s"the 1-row total must broadcast onto the bins:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no data-sized cross product (1-row crossJoin broadcasts):\n$p")
  }

  test("Cochran Q: presence distinct + three combine aggs, no data join") {
    import spark.implicits._
    val rows = Seq(("s1", "A"), ("s2", "B")).toDF("s", "t")
    val p = plan(graft.operators.CochranQ.q(rows, "s", "t"))
    assert(!p.contains("SortMergeJoin"),
      s"the final fold joins two 1-row aggregates — broadcast territory:\n$p")
  }

  test("capped hamming join: bucket stats partial-combine, star stays equi") {
    import spark.implicits._
    val hashed = (1L to 30L).map(i => (i, 0x1234L)).toDF("doc_id", "h")
    val p = plan(graft.llm.TextOps.hammingNearDupPairs(hashed, "doc_id",
      "h", maxHamming = 6, chunks = 8, bits = 64, hotBucketCap = 4))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"cold pairs and star pairs must both come from equi-joins:\n$p")
  }

  test("trained NB (wide model): equi pivot probe, NO row fan-out, combine agg") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaa bbb aaa bab", "xx"),
      (2L, "zzz yyy zzz yzy", "yy")).toDF("doc_id", "text", "lang")
    for ((tag, q) <- Seq(
        "hashed" -> graft.llm.TextOps.naiveBayesLangIdHashed(
          df, "doc_id", "text", "lang", buckets = 16),
        "unhashed" -> graft.llm.TextOps.naiveBayesLangId(
          df, "doc_id", "text", "lang"))) {
      val p = plan(q)
      // r15 wide-model contract: inference is a 1:1 equi join against
      // the PIVOTED per-feature model — no cross of any kind, and no
      // doc x languages row fan-out (the pre-r15 long form's
      // BroadcastNestedLoopJoin); language columns are static.
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin"),
        s"$tag: the wide-model probe must stay a 1:1 equi join — a" +
          s" cross or nested-loop means the x|langs| fan-out is back:\n$p")
      assert(p.contains("pivotfirst") || p.contains("__pivot"),
        s"$tag: the model must be the pivoted one-row-per-feature" +
          s" form:\n$p")
      assert(p.contains("partial_") || p.contains("HashAggregate")
        || p.contains("SortAggregate"),
        s"$tag: the per-doc score sums must map-side combine:\n$p")
    }
  }
}
