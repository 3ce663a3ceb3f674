package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.SalesEtl

/** Harness queries covering the reference operator inventory (SURVEY §2),
  * each paired with an ANSI-SQL DuckDB oracle over the same parquet tables.
  *
  * Cross-engine determinism rules used throughout:
  *  - every output has a total ORDER BY on non-null unique keys;
  *  - double sums are quantized to integer cents BEFORE summation
  *    (`sum(cast(floor(x*100+0.5) as long))`) so the result is
  *    order-independent and bit-identical in both engines;
  *  - rounding is `floor(x*100+0.5)/100` — pure IEEE ops, identical in
  *    Spark and DuckDB;
  *  - timestamps cross the engine boundary as formatted strings (parquet
  *    timestamp tz-awareness differs between writers).
  */
object RefSurface {

  /** Order-independent, cross-engine-exact sum of a money-like double. */
  private def centsSum(c: Column): Column =
    sum(floor(c * 100 + 0.5).cast("long")) / 100.0

  private def fmt(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Deterministic change table over the customer dimension, shared by
    * the MERGE (m6) and SCD-2 (m7) apply queries and mirrored by
    * `custChangesSql`: update every 13th key (unless deleted — delete
    * wins on overlap), delete every 17th, insert a clone of every 29th
    * under a new key. All four downstream classes populated at sf0.01.
    */
  private def custChanges(base: DataFrame): DataFrame = {
    val upd = base.filter(col("c_custkey") % 13 === 0 && col("c_custkey") % 17 =!= 0)
      .select(col("c_custkey"), lit("U").as("op"),
        concat(col("c_name"), lit(" (updated)")).as("new_name"),
        col("c_nationkey").as("new_nationkey"))
    val del = base.filter(col("c_custkey") % 17 === 0)
      .select(col("c_custkey"), lit("D").as("op"),
        lit(null).cast("string").as("new_name"),
        lit(null).cast("int").as("new_nationkey"))
    val ins = base.filter(col("c_custkey") % 29 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"), lit("I").as("op"),
        concat(lit("NEW "), col("c_name")).as("new_name"),
        col("c_nationkey").as("new_nationkey"))
    upd.unionByName(del).unionByName(ins)
  }

  /** Keep-first order for the synthetic sales feed: `_ord` leads, but
    * `lineitem` contains duplicate `(orderkey, linenumber)` rows with
    * different payloads, so the raw payload columns tie-break to make the
    * order total (same `ORDER BY ... NULLS FIRST` in the oracle CTE).
    */
  private val salesOrder: Seq[Column] =
    Seq(col("_ord"), col("Product"), col("Amount"), col("Date"), col("Audit_Date"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Q1: limpiar_ventas_validas (P1-P5,P8-P11,P13,P14,P18,M1) -------
    "q1_clean_valid" -> ((s, dir) => {
      val valid = SalesEtl.cleanValidSales(
        SyntheticSales(s, dir), orderCols = salesOrder, round2 = SalesEtl.halfUpCents)
      SalesEtl.formatDates(valid).orderBy("Sale_ID")
    }),

    // ---- Q2: limpiar_ventas_invalidas (P6,P7,P15-P17,M2,M3) -------------
    "q2_detect_invalid" -> ((s, dir) => {
      val inv = SalesEtl.detectInvalidSales(SyntheticSales(s, dir))
      SalesEtl.formatDates(inv)
        .select(col("_block"), col("_ord"), col("Sale_ID"), col("Product"),
          col("Amount"), col("Date"), col("Audit_Date"), col("Reason"))
        .orderBy("_block", "_ord", "Sale_ID", "Product", "Amount", "Date",
          "Audit_Date", "Reason")
        .select("Sale_ID", "Product", "Amount", "Date", "Audit_Date", "Reason")
    }),

    // ---- Q3: monthly summary (P12,P19,M4) -------------------------------
    "q3_monthly_summary" -> ((s, dir) => {
      val valid = SalesEtl.cleanValidSales(
        SyntheticSales(s, dir), orderCols = salesOrder, round2 = SalesEtl.halfUpCents)
      valid.withColumn("Mes", date_format(col("Date"), "MM/yyyy"))
        .groupBy(col("Mes"), col("Product").as("Producto"))
        .agg(
          centsSum(col("Amount")).as("Ventas_Totales"),
          count("Amount").as("Numero_Transacciones"),
          min("Amount").as("Venta_Minima"))
        .orderBy("Mes", "Producto")
    }),

    // ---- Q4: formatear_fechas (P13) -------------------------------------
    "q4_format_dates" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val withRaw = o.select(
        col("o_orderkey"),
        when(col("o_orderkey") % 19 === 0, lit("not a date"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("Date"),
        col("o_orderdate").as("Audit_Date"))
      SalesEtl.formatDates(withRaw).orderBy("o_orderkey")
    }),

    // ---- S1 + Q1 + Q4 + K-adjacent: real directory-CSV ingestion --------
    // Exercises the actual readSalesDirectory path end-to-end: fixed
    // schema, filename-stem Audit_Date (null for notes.csv), keep-first
    // dedup ordered by (file stem, explicit Row_Idx). The oracle reads
    // the SAME files via DuckDB read_csv.
    "s1_file_roundtrip" -> ((s, dir) => {
      val csvDir = SalesFixture.ensure(SalesFixture.sfName(dir))
      val raw = graft.sources.SalesSource.readSalesDirectory(s, csvDir, SalesFixture.schema)
      val stem = regexp_extract(col("_ingest_file"), "([^/]+)\\.csv$", 1)
      val valid = SalesEtl.cleanValidSales(
        raw,
        orderCols = Seq(stem, col("Row_Idx").cast("int")),
        round2 = SalesEtl.halfUpCents)
      SalesEtl.formatDates(valid).orderBy("Sale_ID")
    }),

    // ---- S2: single-CSV read + coercing date parse ------------------------
    // The one §2 operator that had no CORRECTNESS row (dead code in the
    // reference — `leer_csv`, etl_utils.py:71-106 — but part of its
    // public util surface): read ONE fixture file through the real
    // readCsv(convertDate=true) path and let DuckDB read_csv replay it.
    // Output pins the post-inference schema explicitly (Amount stays
    // string — mixed "USD"/"EUR" suffixes defeat inference by design;
    // Date coerces per-row, unparseable → null).
    "s2_single_csv" -> ((s, dir) => {
      val csvDir = SalesFixture.ensure(SalesFixture.sfName(dir))
      val df = graft.sources.SalesSource.readCsv(
        s, s"$csvDir/2025-01-01.csv", convertDate = true)
      df.select(col("Sale_ID"), col("Product"), col("Amount"),
          date_format(col("Date"), "yyyy-MM-dd").as("Date"),
          col("Row_Idx").cast("int").as("Row_Idx"))
        .orderBy("Row_Idx")
    }),

    // ---- K1 end-to-end job roundtrip: run -> export -> read back --------
    // The full reference job (main.py:182-229) through the REAL K1 sink:
    // S1 directory scan -> Q1/Q2/Q3 -> Q4 -> three golden CSVs written to
    // a deterministic /tmp dir, then read back as all-string frames.
    // The oracle reads the SAME written files via DuckDB read_csv, so any
    // sink-format defect (BOM handling, quoting, null-vs-empty encoding,
    // header, whitespace trimming) surfaces as a cross-engine mismatch —
    // this closes K1's oracle gap the way s1_file_roundtrip closed S1's.
    "k1_job_roundtrip" -> ((s, dir) => {
      val csvDir = SalesFixture.ensure(SalesFixture.sfName(dir))
      val outDir = s"/tmp/graft_k1_out/${SalesFixture.sfName(dir)}"
      val outs = graft.etl.SalesJob.run(s, csvDir, SalesFixture.schema)
      graft.etl.SalesJob.export(s, outs, outDir)
      val allCols = Seq("Sale_ID", "Product", "Amount", "Date", "Audit_Date",
        "Reason", "Row_Idx", "Mes", "Producto", "Ventas_Totales",
        "Numero_Transacciones", "Venta_Minima")
      def rd(frame: String, file: String) = {
        val df = s.read.option("header", "true").csv(s"$outDir/$file.csv")
        df.select(lit(frame).as("frame") +: allCols.map(c =>
          (if (df.columns.contains(c)) col(c) else lit(null).cast("string")).as(c)): _*)
      }
      rd("valid", "Ventas_Validas_M")
        .unionByName(rd("invalid", "Ventas_Invalidas_M"))
        .unionByName(rd("summary", "Ventas_Resumen_Mensual"))
        .orderBy(("frame" +: allCols).map(col): _*)
    }),

    // ---- K3: partitioned parquet layout roundtrip + partition pruning ---
    // The 100 TB layout pattern: month-partitioned parquet written via
    // the real sink path, read back with a partition filter (directory
    // pruning — SinksSpec asserts the PartitionFilters at scan), and the
    // oracle reads the SAME files via DuckDB hive partitioning. Closes
    // X31's oracle gap the way k1_job_roundtrip closed K1's.
    "k3_partitioned_roundtrip" -> ((s, dir) => {
      // Synthetic (sf-independent) rows: the entry verifies the SINK
      // LAYOUT — hive directory structure, partition-column round-trip,
      // pruning — so the data only has to be deterministic, letting the
      // fixed-path oracle stay valid at every scale factor (same
      // reasoning as the SalesFixture for s1/k1).
      val out = s"/tmp/graft_k3_out/${SalesFixture.sfName(dir)}"
      s.range(0, 5000)
        .withColumn("o_month",
          concat(lit("1995-"), lpad(((col("id") % 6) + 1).cast("string"), 2, "0")))
        .withColumn("price", ((col("id") * 131 % 100000) / 100.0))
        .write.mode("overwrite").partitionBy("o_month").parquet(out)
      s.read.parquet(out)
        .filter(col("o_month") >= "1995-01" && col("o_month") <= "1995-03")
        .groupBy("o_month")
        .agg(count(lit(1)).as("n"), centsSum(col("price")).as("total"))
        .orderBy("o_month")
    }),

    // ---- K4: parquet schema evolution (mergeSchema roundtrip) -----------
    // The long-lived-table reality: files written before a column
    // existed coexist with files written after. v1 (even keys) lacks
    // `segment`; v2 (odd keys) carries it. `mergeSchema` reconciles the
    // footers at read time and back-fills v1 rows with NULL — no rewrite
    // of old files (at 100 TB a backfill rewrite is the thing schema
    // evolution exists to avoid). The oracle reads the SAME files with
    // DuckDB's union_by_name, so writer fidelity AND the evolution
    // semantics are both cross-engine-pinned (k1-style).
    "k4_schema_evolution" -> ((s, dir) => {
      val out = s"/tmp/graft_k4_out/${SalesFixture.sfName(dir)}"
      val c = Tables(s, dir, "customer")
        .withColumn("acct_cents",
          floor(col("c_acctbal") * 100 + 0.5).cast("long"))
      c.filter(col("c_custkey") % 2 === 0)
        .select("c_custkey", "c_name", "acct_cents")
        .write.mode("overwrite").parquet(s"$out/v1")
      c.filter(col("c_custkey") % 2 =!= 0)
        .select(col("c_custkey"), col("c_name"), col("acct_cents"),
          col("c_mktsegment").as("segment"))
        .write.mode("overwrite").parquet(s"$out/v2")
      s.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
        .orderBy("c_custkey")
    }),

    // ---- K5: JSONL roundtrip (the training-data interchange format) -----
    // Write documents as newline-delimited JSON via the real sink path,
    // read back with an EXPLICIT schema (schema inference on 100 TB is
    // a full extra pass — always declare), and have DuckDB read the
    // SAME files: writer escaping fidelity and reader agreement are
    // both pinned, k1-style.
    "k5_jsonl_roundtrip" -> ((s, dir) => {
      val out = s"/tmp/graft_jsonl_out/${SalesFixture.sfName(dir)}"
      Tables(s, dir, "documents")
        .select("doc_id", "text", "lang", "source")
        .coalesce(1).write.mode("overwrite").json(out)
      s.read
        .schema("doc_id LONG, text STRING, lang STRING, source STRING")
        .json(out)
        .orderBy("doc_id")
    }),

    // ---- K6: compaction plan EXECUTED (layout write + readback audit) ---
    // X108 plans; this executes: join docs to their planned bin, write
    // hive-partitioned by (source, out_file), then READ THE WRITTEN
    // LAYOUT BACK and emit per-directory file stats. The oracle reads
    // the same directories hive-style, so the audit proves the written
    // layout matches the plan bin-for-bin (the k1/X106 "execute the
    // claim" pattern applied to table maintenance).
    // ---- K14: merge-on-read deletes via deletion vectors (X339) ----------
    // The lakehouse delete mechanic the k-family lacked (Iceberg v2 /
    // Delta deletion vectors): deleting N rows writes an O(N) id
    // SIDECAR per commit, never an O(table) copy-on-write rewrite;
    // readers merge with one LEFT ANTI hash join on the near-unique
    // id (skew-free), and Compaction (K6) is what eventually folds
    // the sidecar directory. EXECUTED roundtrip: base + two
    // overlapping delete commits written to disk, readback merges
    // them; the oracle recomputes the same accounting from the
    // logical predicate, so a dropped sidecar, a double-counted
    // overlap, or a broken anti-join all hash-mismatch. The
    // per-source law n_base = n_live + n_deleted is in the output.
    "k14_deletion_vectors" -> ((s, dir) => {
      val base = s"/tmp/graft_k14/${SalesFixture.sfName(dir)}"
      val docs = Tables(s, dir, "documents").select("doc_id", "source")
      docs.write.mode("overwrite").parquet(s"$base/base")
      docs.filter(col("doc_id") % 7 === 0).select("doc_id")
        .write.mode("overwrite").parquet(s"$base/dv/commit=1")
      docs.filter(col("doc_id") % 11 === 3).select("doc_id")
        .write.mode("overwrite").parquet(s"$base/dv/commit=2")
      val b = s.read.parquet(s"$base/base")
      val dv = s.read.parquet(s"$base/dv").select("doc_id").distinct()
      val live = b.join(dv, Seq("doc_id"), "left_anti")
        .groupBy("source").agg(count(lit(1)).as("n_live"))
      val dead = b.join(dv, "doc_id")
        .groupBy("source").agg(count(lit(1)).as("n_deleted"))
      b.groupBy("source").agg(count(lit(1)).as("n_base"))
        .join(dead, Seq("source"), "left")
        .join(live, Seq("source"), "left")
        .select(col("source"), col("n_base"),
          coalesce(col("n_deleted"), lit(0L)).as("n_deleted"),
          coalesce(col("n_live"), lit(0L)).as("n_live"))
        .orderBy("source")
    }),

    // ---- K15: REAL image decode against container-parsed truth (X343) ----
    // The r11 verdict's missing multimodal proof: a corpus of GENUINE
    // PNG blobs (deterministic fixture, written to disk) flows through
    // the REAL javax.imageio codec on the Spark side — width/height in
    // the result come from decoded pixels, not the stub — while the
    // DuckDB oracle re-derives the same dimensions by parsing the PNG
    // container's IHDR bytes (and hashes the raw payload). A stubbed
    // decode, a corrupt writer, or a codec/container disagreement all
    // hash-mismatch. Decode is embarrassingly parallel mapPartitions;
    // blobs never pass through the driver.
    // ---- K17: REAL video container walk + per-frame codec decode ----------
    // The video leg of the multimodal family (X359): clips are
    // length-prefixed frame containers of GENUINE PNGs; Spark walks
    // the real 4-byte big-endian framing and decodes EVERY frame with
    // javax.imageio, while the DuckDB oracle re-walks the same
    // container bytes recursively (lengths from the prefix, dims from
    // each frame's IHDR, md5 over each frame's hex). A framing slip,
    // an off-by-one offset, or a stubbed decode hash-mismatches.
    "k17_video_frames" -> ((s, dir) => {
      val base = s"/tmp/graft_k17/${SalesFixture.sfName(dir)}"
      graft.llm.Multimodal.videoFixture(s, 192)
        .coalesce(1).write.mode("overwrite").parquet(base)
      val blobs = s.read.parquet(base)
      graft.llm.Multimodal.videoFrameMeta(s, blobs, "clip_id")
        .orderBy("clip_id", "frame_no")
    }),

    // ---- K16: REAL s16le audio decode, frame energy oracle-checked --------
    // The audio leg of the multimodal family (X348): genuine PCM bytes
    // written to disk, Spark decoding them with a REAL little-endian
    // short reader (llm/Multimodal.pcmFrameEnergy), the DuckDB oracle
    // re-deriving every sample from the hex of the SAME bytes — two's
    // complement, frame grouping, Σv², peak and the planted silent
    // frames all hash-matched. A stubbed decode or an endianness slip
    // mismatches immediately.
    "k16_audio_energy" -> ((s, dir) => {
      val base = s"/tmp/graft_k16/${SalesFixture.sfName(dir)}"
      graft.llm.Multimodal.pcmFixture(s, 256)
        .coalesce(1).write.mode("overwrite").parquet(base)
      val blobs = s.read.parquet(base)
      graft.llm.Multimodal.pcmFrameEnergy(s, blobs, "clip_id")
        .orderBy("clip_id", "frame_no")
    }),

    "k15_image_decode" -> ((s, dir) => {
      val base = s"/tmp/graft_k15/${SalesFixture.sfName(dir)}"
      graft.llm.Multimodal.pngFixture(s, 256)
        .coalesce(1).write.mode("overwrite").parquet(base)
      val blobs = s.read.parquet(base)
      val meta = graft.llm.Multimodal
        .decodeMeta(s, blobs, "doc_id", graft.llm.Multimodal.imageDecode)
        .toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
      blobs.select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(hex(col("payload"))).as("payload_md5"),
          (hex(expr("substring(payload, 1, 8)"))
            === lit("89504E470D0A1A0A")).as("magic_ok"))
        .join(meta, "doc_id")
        .orderBy("doc_id")
    }),

    "k6_compaction_exec" -> ((s, dir) => {
      val out = s"/tmp/graft_k6_out/${SalesFixture.sfName(dir)}"
      val files = Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
      val plan = graft.operators.Compaction.compactionPlan(
        files.select(col("source"), col("doc_id").as("file_id"),
          col("n_chars").as("bytes")),
        "source", "file_id", "bytes", targetBytes = 16000L)
        .select(col("source").as("_psrc"), col("out_file"),
          col("first_file"), col("last_file"))
      files
        .join(plan, col("source") === col("_psrc")
          && col("doc_id").between(col("first_file"), col("last_file")))
        .select(col("source"), col("out_file"), col("doc_id"), col("n_chars"))
        // one writer task: the joined table is metadata-sized here, and
        // per-partition-dir file count stays 1 (the whole point of the
        // exercise is FEWER files)
        .coalesce(1)
        .write.mode("overwrite")
        .partitionBy("source", "out_file").parquet(out)
      s.read.parquet(out)
        .groupBy("source", "out_file")
        .agg(count(lit(1)).as("n_inputs"),
          sum("n_chars").as("out_bytes"),
          min("doc_id").as("first_file"),
          max("doc_id").as("last_file"))
        .orderBy("source", "out_file")
    }),

    // ---- K7: gzip CSV roundtrip (the crawl-dump interchange format) -----
    // Compressed text is how corpora arrive; the codec must be splittable
    // -aware at scale (gzip is NOT splittable — one file = one task, so
    // a 100 TB feed needs many files, which this write produces via the
    // existing partitioning). Writer quoting fidelity pinned by DuckDB
    // reading the SAME .csv.gz files.
    "k7_gzip_csv_roundtrip" -> ((s, dir) => {
      val out = s"/tmp/graft_k7_out/${SalesFixture.sfName(dir)}"
      Tables(s, dir, "documents")
        .select("doc_id", "text", "lang", "source")
        .write.mode("overwrite")
        .option("header", "true").option("compression", "gzip")
        .csv(out)
      s.read
        .schema("doc_id LONG, text STRING, lang STRING, source STRING")
        .option("header", "true")
        .csv(out)
        .orderBy("doc_id")
    }),

    // ---- K9: range-partitioned SORTED export (layout audit) -------------
    // The "sorted export" contract downstream merge/binary-search
    // consumers rely on: repartitionByRange + sortWithinPartitions
    // writes range-DISJOINT parquet files. The audit reads the WRITTEN
    // files back and emits per-file (rank-by-min, rows, min, max,
    // gap_ok): gap_ok=1 on every row proves no two files overlap — the
    // k1/k6 "execute the claim" pattern applied to sort layout. File
    // names carry writer UUIDs, so files are identified by their min
    // key's rank, never by name. In-file row order is pinned by
    // MaintenanceOpsSpec (per-file monotonicity), since read-order
    // through the audit agg can't witness it.
    "k9_sorted_export" -> ((s, dir) => {
      val out = s"/tmp/graft_k9_out/${SalesFixture.sfName(dir)}"
      Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartitionByRange(16, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite").parquet(out)
      val perFile = s.read.parquet(out)
        .select(col("o_orderkey"), col("_metadata.file_name").as("_f"))
        .groupBy("_f")
        .agg(count(lit(1)).as("n_rows"), min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"))
      // |files|-row window (16 rows): report-grade, the M4 note
      val w = org.apache.spark.sql.expressions.Window.orderBy("min_key")
      perFile
        .select(row_number().over(w).as("file_rank"), col("n_rows"),
          col("min_key"), col("max_key"),
          when(lag("max_key", 1).over(w).isNull
              || col("min_key") > lag("max_key", 1).over(w), 1)
            .otherwise(0).as("gap_ok"))
        .orderBy("file_rank")
    }),

    // ---- Merkle-bucket table diff (anti-entropy replica check) ----------
    // "Other" replica = lineitem with a deterministic drift injected in
    // both engines (rows with l_orderkey%991==0 missing; %997==0 have
    // l_quantity+1). Spark runs the REAL two-phase protocol — 64-row
    // bucket digests per side, drill-down reads ONLY diverged buckets
    // via a broadcast semi-join; the oracle computes the brute-force
    // full multiset diff with no bucketing at all, so the hash match
    // proves the Merkle prune finds exactly the true diff.
    "k8_merkle_diff" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val other = li.filter(col("l_orderkey") % 991 =!= 0)
        .withColumn("l_quantity",
          when(col("l_orderkey") % 997 === 0, col("l_quantity") + 1)
            .otherwise(col("l_quantity")))
      def cents(c: String) = floor(col(c) * 100 + 0.5).cast("long")
      val digest = graft.operators.MerkleDiff.rowDigest(Seq(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), cents("l_quantity"), cents("l_extendedprice"),
        cents("l_discount"), cents("l_tax"), col("l_returnflag"),
        col("l_linestatus"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")))
      graft.operators.MerkleDiff.diff(li, other, digest,
        Seq("l_orderkey", "l_linenumber"), buckets = 64)
        .orderBy("bucket", "l_orderkey", "l_linenumber", "n_base")
    }),

    // ---- unpivot / melt (wide -> long) ----------------------------------
    // The pandas `melt` analog and p_pivot's inverse: per-row metric
    // columns rotate into (id, metric, value) rows. Spark's native
    // unpivot is a zero-shuffle Expand (each input row emits one row
    // per value column map-side — no exchange, no join).
    "p_unpivot" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size_d"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size_d")),
          "metric", "value")
        .orderBy("p_partkey", "metric")
    }),

    // ---- group-wise OLS regression (y = a + b·x per group) --------------
    // Per-l_returnflag least squares of extendedprice on quantity from
    // the same exact-decimal moment machinery as p_correlation: values
    // quantize to integer cents, all five moments accumulate as
    // decimal(38,0) in ONE combine aggregate per group, and the
    // closed-form slope/intercept are derived by double division at
    // the end (identical IEEE ops on identical integers cross-engine,
    // round6-pinned). Intercept reported in dollars (cents/100).
    "p_groupwise_ols" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_quantity").isNotNull
          && col("l_extendedprice").isNotNull)
        .select(col("l_returnflag"),
          floor(col("l_quantity") * 100 + 0.5).cast("decimal(38,0)")
            .as("x"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("decimal(38,0)")
            .as("y"))
      val m = li.groupBy("l_returnflag").agg(
        count(lit(1)).cast("decimal(38,0)").as("n_d"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      val den = (col("n_d") * col("sxx") - col("sx") * col("sx"))
        .cast("double")
      m.select(col("l_returnflag"), col("n_d").cast("long").as("n"),
        graft.llm.TextOps.round6(
          (col("n_d") * col("sxy") - col("sx") * col("sy")).cast("double")
            / den).as("slope"),
        graft.llm.TextOps.round6(
          (col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
            / den / 100.0).as("intercept"))
        .orderBy("l_returnflag")
    }),

    // ---- time-RANGE window frame: trailing 7-day customer spend ---------
    // RANGE BETWEEN 6 days PRECEDING AND CURRENT ROW over event TIME,
    // not row position: each order sees the sum of everything its
    // customer spent in the 7 calendar days ending on its date. The
    // point of a RANGE frame (vs ROWS): same-day ties all see the
    // IDENTICAL frame — the result needs no tie-break to be
    // deterministic, where a ROWS spelling would differ per engine on
    // duplicate dates. Frame bounds are integer epoch-DAYS on both
    // sides (never date→timestamp casts, which drag in the session
    // timezone); spend is exact cents. The window is customer-keyed —
    // partition-parallel, no global sort anywhere.
    "p_trailing_spend" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull
          && col("o_totalprice").isNotNull)
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("day"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(datediff(col("day"), to_date(lit("1970-01-01"))))
        .rangeBetween(-6, 0)
      o.select(col("o_custkey"), col("o_orderkey"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("cents"),
          sum("cents").over(w).as("spend_7d_cents"),
          count(lit(1)).over(w).as("n_orders_7d"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- declarative expectation-suite audit (data contract) ------------
    // Great-Expectations shape: five violation predicates + a PK
    // uniqueness contract over lineitem, ALL in one aggregate pass
    // (uniqueness rides the same agg as count_distinct). The PK check
    // FAILS by design — lineitem ships duplicate (orderkey,linenumber)
    // rows (the known tie-break hazard), and the audit is what makes
    // that a visible contract violation instead of tribal knowledge.
    "p_expectations" -> ((s, dir) => {
      graft.operators.Expectations.audit(Tables(s, dir, "lineitem"),
        violations = Seq(
          "quantity_range" ->
            (col("l_quantity") < 1 || col("l_quantity") > 50),
          "price_positive" -> (col("l_extendedprice") <= 0),
          "discount_range" ->
            (col("l_discount") < 0 || col("l_discount") > 0.1),
          "shipdate_not_null" -> col("l_shipdate").isNull,
          "returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R")),
        uniqueContracts = Seq(
          "pk_unique" -> Seq("l_orderkey", "l_linenumber")))
        .orderBy("check")
    }),

    // ---- schema-drift audit between parquet snapshot versions -----------
    // Execute-the-claim: write v1/v2 of an orders projection with a
    // dropped column, a float→double widening, and an added column,
    // then audit the two footers. Schema reads are metadata-only (zero
    // data rows); the |columns|-row report is the cross-engine surface
    // — the oracle re-derives it from DuckDB's DESCRIBE of the SAME
    // files.
    "k10_schema_drift" -> ((s, dir) => {
      val out = s"/tmp/graft_k10_out/${SalesFixture.sfName(dir)}"
      val o = Tables(s, dir, "orders").limit(100)
      o.select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          col("o_totalprice").cast("float").as("o_score"))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/v1")
      o.select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast("double").as("o_score"),
          lit("backfilled").as("o_note"))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/v2")
      graft.sources.SchemaDrift.drift(s, s"$out/v1", s"$out/v2")
        .orderBy("column")
    }),

    // ---- K12: bucketed co-located join EXECUTED --------------------------
    // X28's ScaleJoinSpec proves zero-exchange bucketed joins as a unit
    // test; this executes the claim as an oracle query (the k1/X106
    // pattern): both sides written `bucketBy(8)` on the join key into
    // the session catalog, joined back WITHOUT a broadcast (threshold
    // disabled around materialization), aggregated per (source, label).
    // PlanAuditSpec pins the join itself exchange-free — the only
    // shuffles left are the aggregation and the output sort. At 100 TB
    // this is the shape for every repeated fact⋈fact join: pay the
    // bucketed write once, join shuffle-free every run after.
    "k12_bucketed_join" -> ((s, dir) => {
      val sf = SalesFixture.sfName(dir).replace('.', '_')
      // A fresh JVM has an empty in-memory catalog but the warehouse
      // DIRECTORY survives on disk from earlier runs — saveAsTable then
      // fails with LOCATION_ALREADY_EXISTS instead of overwriting. Drop
      // any registration AND clear the stale location first.
      Seq(s"k12_docs_$sf", s"k12_emb_$sf").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val wh = java.net.URI.create(
          s.conf.get("spark.sql.warehouse.dir")).getPath
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete(): Unit
        }
        val loc = new java.io.File(wh, t)
        if (loc.exists) rm(loc)
      }
      Tables(s, dir, "documents").select("doc_id", "source", "n_chars")
        .write.mode("overwrite")
        .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(s"k12_docs_$sf")
      Tables(s, dir, "embeddings").select("vec_id", "label")
        .write.mode("overwrite")
        .bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable(s"k12_emb_$sf")
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        s.table(s"k12_docs_$sf")
          .join(s.table(s"k12_emb_$sf"), col("doc_id") === col("vec_id"))
          .groupBy("source", "label")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
          .orderBy("source", "label")
          // materialize UNDER the no-broadcast conf so the co-located
          // plan is the one that actually runs
          .localCheckpoint(true)
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }),

    // ---- K11: ORC interchange roundtrip ----------------------------------
    // The third interchange format after JSONL (k5) and gzip CSV (k7):
    // columnar-with-indexes, the Hive-ecosystem sibling of parquet.
    // DuckDB cannot read ORC, so the oracle asserts roundtrip FIDELITY
    // instead of re-reading the files: Spark writes the documents table
    // to ORC, reads it back THROUGH a pushed-down predicate (the ORC
    // reader serves it from min/max stripe stats — `.explain` shows
    // PushedFilters), and emits per-source counts + an order-insensitive
    // content checksum (sum of 48-bit row hashes — 48 so a 100×-bigger
    // corpus still sums inside int64); the oracle computes the same
    // aggregates from the ORIGINAL parquet. Any row the ORC path drops,
    // duplicates, or mutates moves the checksum.
    "k11_orc_roundtrip" -> ((s, dir) => {
      val out = s"/tmp/graft_k11_out/${SalesFixture.sfName(dir)}"
      Tables(s, dir, "documents").write.mode("overwrite").orc(out)
      s.read.orc(out)
        .filter(col("n_chars") >= 50)
        .select(col("source"), col("n_chars"),
          expr("cast(conv(substring(md5(concat_ws('|', doc_id, text, lang, " +
            "source, n_chars)), 1, 12), 16, 10) as bigint)").as("rh"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_rows"), sum("n_chars").as("sum_chars"),
          sum("rh").as("content_sum"))
        .orderBy("source")
    }),

    // ---- CSV dialect stress roundtrip (RFC 4180 edge cases) --------------
    // The reference's whole world is CSV; this pins the dialect edge
    // cases where engines classically disagree: embedded delimiters,
    // embedded double quotes (doubled per RFC — Spark needs
    // escape='"', its default backslash escaping is NOT RFC and
    // DuckDB would misread it), embedded NEWLINES (read back with
    // multiLine), and preserved leading/trailing whitespace. Spark
    // writes, BOTH engines read the same part files — any quoting
    // defect surfaces as a hash mismatch.
    "k13_csv_dialect" -> ((s, dir) => {
      val out = s"/tmp/graft_k13_out/${SalesFixture.sfName(dir)}/dialect"
      Tables(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 4).as("_c"), col("source"))
        .select(col("doc_id"),
          when(col("_c") === 0,
            concat(lit("v,"), col("source"), lit(",end")))
          .when(col("_c") === 1,
            concat(lit("say \""), col("source"), lit("\" loud")))
          .when(col("_c") === 2,
            concat(lit("line1\nline2:"), col("source")))
          .otherwise(concat(lit("  padded  "), col("source"), lit("  ")))
          .as("tricky"))
        .repartition(4)
        .write.mode("overwrite")
        .option("header", "true")
        .option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
      s.read
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
        .select(col("doc_id").cast("long").as("doc_id"), col("tricky"))
        .orderBy("doc_id")
    }),

    // ---- malformed-row quarantine (S1's per-ROW error routing) ----------
    // The operational counterpart of the reference's per-FILE
    // skip-on-error (etl_utils.py:193-194): PERMISSIVE parse with
    // columnNameOfCorruptRecord routes unparseable rows (bad number,
    // bad date, wrong arity) to a quarantine table carrying the RAW
    // line for triage, clean rows flow on typed. Both outputs are
    // WRITTEN and read back — the k1 "execute the claim" pattern: the
    // oracle reads the same parquet, and the split semantics are
    // pinned by QualityAuditSpec.
    "s2_quarantine" -> ((s, dir) => {
      val work = s"/tmp/graft_s2q/${SalesFixture.sfName(dir)}"
      val in = new java.io.File(s"$work/in")
      in.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$work/in/feed.csv"),
        Seq("id,amount,day",
          "1,10.50,2024-01-01",
          "2,20.25,2024-01-02",
          "3,notanumber,2024-01-03",
          "4,40.00,not-a-date",
          "garbage unparseable line",
          "5,50.75,2024-01-05").mkString("\n").getBytes("UTF-8"))
      val df = s.read
        .schema("id INT, amount DOUBLE, day DATE, _corrupt STRING")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(s"$work/in")
        .cache()
      df.filter(col("_corrupt").isNull).drop("_corrupt")
        .write.mode("overwrite").parquet(s"$work/good")
      df.filter(col("_corrupt").isNotNull)
        .select(col("_corrupt").as("raw_line"))
        .write.mode("overwrite").parquet(s"$work/quarantine")
      df.unpersist()
      val good = s.read.parquet(s"$work/good")
        .select(lit("good").as("status"), col("id"), col("amount"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          lit(null).cast("string").as("raw_line"))
      val quar = s.read.parquet(s"$work/quarantine")
        .select(lit("quarantine").as("status"),
          lit(null).cast("int").as("id"),
          lit(null).cast("double").as("amount"),
          lit(null).cast("string").as("day"), col("raw_line"))
      good.unionByName(quar).orderBy("status", "id", "raw_line")
    }),

    // ---- Pareto cumulative-contribution table (80/20 analysis) ----------
    // Parts ranked by revenue with running share of total — the
    // concentration report behind "which 20% of items carry 80% of
    // revenue". The global-order window runs over the |parts|-row
    // AGGREGATE (report-grade, like M4's golden-order sort), never the
    // corpus; sums are exact integer cents, shares round6, and the
    // top-80 flag tests the ROUNDED share so no boundary can flip
    // cross-engine.
    "p_running_share" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val rev = Tables(s, dir, "lineitem")
        .filter(col("l_extendedprice").isNotNull
          && col("l_partkey").isNotNull)
        .groupBy("l_partkey").agg(sum(cents).as("rev_c"))
      val tot = rev.agg(sum("rev_c").as("_t"))
      val w = Window.orderBy(desc("rev_c"), col("l_partkey"))
      rev.crossJoin(broadcast(tot))
        .withColumn("rank", row_number().over(w))
        .withColumn("cum_share", graft.llm.TextOps.round6(
          sum(col("rev_c")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") / col("_t")))
        .select(col("rank"), col("l_partkey"),
          graft.llm.TextOps.round6(col("rev_c") / 100.0).as("revenue"),
          col("cum_share"),
          (col("cum_share") <= 0.8).as("in_top80"))
        .orderBy("rank")
    }),

    // ---- Benford first-digit audit (forensic data-quality check) --------
    // First significant digit of each positive amount (integer-cents
    // string arithmetic — no float log anywhere) against the Benford
    // expectation, which is supplied as SIX-DECIMAL LITERALS
    // (log10(1+1/d) precomputed) so neither engine evaluates a
    // transcendental whose last-ulp rounding could differ. The
    // fabricated-data alarm: uniform synthetic amounts will deviate
    // hard from Benford — the AUDIT table is the deliverable, not a
    // conformity claim.
    "p_benford" -> ((s, dir) => {
      import s.implicits._
      val benford = Seq(0.301030, 0.176091, 0.124939, 0.096910,
        0.079181, 0.066947, 0.057992, 0.051153, 0.045757)
      val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val digits = Tables(s, dir, "lineitem")
        .filter(col("l_extendedprice").isNotNull && cents > 0)
        .select(substring(cents.cast("string"), 1, 1).cast("int")
          .as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum("n").as("_t"))
      val expected = benford.zipWithIndex
        .map { case (p, i) => (i + 1, p) }
        .toDF("digit", "benford")
      digits.crossJoin(broadcast(tot))
        .join(broadcast(expected), Seq("digit"))
        .select(col("digit"), col("n"),
          graft.llm.TextOps.round6(col("n") / col("_t").cast("double"))
            .as("share"),
          col("benford"),
          graft.llm.TextOps.round6(
            col("n") / col("_t").cast("double") - col("benford"))
            .as("deviation"))
        .orderBy("digit")
    }),

    // ---- per-group IQR outlier fences (Tukey box-plot audit) ------------
    // Exact quartiles on integer cents per group, 1.5·IQR fences, and
    // the outlier mass outside them — the robust cousin of X114's
    // σ-winsorization (quartiles shrug off the very outliers a σ rule
    // lets drag the threshold). One |groups|-key quantile agg, fences
    // broadcast back, one combine count — the corpus is scanned twice,
    // quantiles never see more than the group's cents column.
    "p_outlier_iqr" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_extendedprice").isNotNull)
        .select(col("l_returnflag"), cents.as("c"))
      val fences = li.groupBy("l_returnflag").agg(
        expr("percentile(c, 0.25)").as("q1"),
        expr("percentile(c, 0.75)").as("q3"),
        count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("q1"), col("q3"), col("n"),
          (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
          (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
      li.join(broadcast(fences), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(first("n").as("n"),
          graft.llm.TextOps.round6(first(col("q1")) / 100.0).as("q1"),
          graft.llm.TextOps.round6(first(col("q3")) / 100.0).as("q3"),
          sum(when(col("c") < col("lo"), 1L).otherwise(0L)).as("n_low"),
          sum(when(col("c") > col("hi"), 1L).otherwise(0L)).as("n_high"))
        .withColumn("out_pct", graft.llm.TextOps.round6(
          (col("n_low") + col("n_high")) / col("n").cast("double")))
        .orderBy("l_returnflag")
    }),

    // ---- join-key skew profile (the "should I salt this" table) ---------
    // Distribution of per-key row counts for a prospective join/agg
    // key: key count, row count, max, exact percentiles of the count
    // distribution, and max-over-mean — the inputs to the salting
    // decision (operators/Skew.scala, X23) and the heavy-hitters
    // sketch sizing (X127). One combine agg to |keys| rows, then one
    // reduce over the count column; percentiles run over |keys|
    // integers, never over the corpus.
    "p_skew_profile" -> ((s, dir) => {
      val r6 = graft.llm.TextOps.round6 _
      val counts = Tables(s, dir, "lineitem").groupBy("l_orderkey")
        .agg(count(lit(1)).as("c"))
      counts.agg(
        sum("c").cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max("c").as("max_c"),
        expr("percentile(c, 0.5)").as("_p50"),
        expr("percentile(c, 0.9)").as("_p90"),
        expr("percentile(c, 0.99)").as("_p99"))
        .select(col("n_rows"), col("n_keys"), col("max_c"),
          r6(col("_p50")).as("p50_c"), r6(col("_p90")).as("p90_c"),
          r6(col("_p99")).as("p99_c"),
          r6(col("n_rows").cast("double") / col("n_keys")).as("mean_c"),
          r6(col("max_c").cast("double") * col("n_keys") / col("n_rows"))
            .as("max_over_mean"))
    }),

    // ---- AGMS self-join-size sketch vs truth (X324) ----------------------
    // The planner estimate p_skew_profile reads exactly: F2 = Σ n(k)²
    // of a prospective join/agg key IS the key's self-join size (and
    // the salting trigger), and AGMS (Alon–Gianella–Matias–Szegedy;
    // Alon et al. STOC'96) estimates it in ONE pass with 16 counters:
    // per estimator e, X_e = Σ_rows s_e(key) with s_e = ±1 from the
    // the parities of md5("f2|key")'s first 16 hex digits (ONE hash
    // per row, not one per estimator — the per-(e,row) md5 spelling
    // measured 16× the hashing for the same estimate), E[X_e²] = F2.
    // Median of 4 means of 4 (the classic boosting; lower median on
    // ties, tie-broken by group id) against the exact truth — the
    // audit row a planner integration would read before trusting the
    // sketch at 100 TB, where the exact groupBy is the thing you're
    // trying to avoid. Scale: all 16 counters accumulate in ONE
    // 16-column combine agg over the hash projection — no explode, no
    // row amplification, the deployment shape; the 1-row wide result
    // unpivots by a 16-row stack. Measured at sf0.1: per-(e,row) md5
    // 6.2 s → one-md5 + explode 2.9 s → this form 2.8 s (the
    // remaining cost is the truth groupBy the deployment would not
    // run). Truth is the audit, not the deployment. The DuckDB oracle
    // keeps the unnest(16)×rows spelling — same values, plan
    // irrelevant there.
    "p_join_size_sketch" -> ((s, dir) => {
      val ks = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").cast("string").as("k"))
      val sums = (0 until 16).map { e =>
        sum(when(conv(substring(col("h"), e + 1, 1), 16, 10)
            .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L)))
          .as(s"x$e")
      }
      val est = ks
        .select(md5(concat(lit("f2|"), col("k"))).as("h"))
        .agg(sums.head, sums.tail: _*)
        .selectExpr(s"stack(16, ${(0 until 16)
          .map(e => s"CAST($e AS INT), x$e").mkString(", ")}) AS (e, x)")
        .localCheckpoint(true) // feeds the group means AND the report
      val med = est.withColumn("g", expr("e div 4"))
        .groupBy("g").agg(expr("sum(x * x) div 4").as("mean_sq"))
        .withColumn("rn",
          row_number().over(Window.orderBy("mean_sq", "g")))
        .filter(col("rn") === 2).select(col("mean_sq").as("f2_est"))
      val tru = ks.groupBy("k").agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * c")).as("f2_true"))
      est.crossJoin(broadcast(med)).crossJoin(broadcast(tru))
        .select(col("e").cast("long").as("estimator"),
          col("x").as("x_sign_sum"), expr("x * x").as("sq"),
          col("f2_est"), col("f2_true"),
          expr("((f2_est - f2_true) * 1000000) div f2_true")
            .as("err_micro"))
        .orderBy("estimator")
    }),

    // ---- histogram join-size estimate vs truth (X328) ---------------------
    // The OTHER planner estimate next to the AGMS sketch (X324): the
    // System-R/Selinger method every optimizer actually ships — align
    // per-table key-range histograms (32 fixed-width buckets over the
    // shared key domain) and estimate the equi-join per bucket as
    // n1·n2 / max(d1, d2) (the containment assumption: the smaller
    // distinct set is contained in the larger). Emits the full
    // per-bucket audit plus the total vs the exact join size — the
    // table you read to learn WHERE the uniformity assumption lies
    // (skewed buckets under-divide). Integer throughout: fixed-width
    // buckets from the shared max key, floored divisions, signed
    // trunc err. One combine agg per table + one per-key truth join;
    // the histograms are model-sized (32 rows).
    "p_histogram_join_estimate" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").select(col("o_orderkey").as("k"))
      val l = Tables(s, dir, "lineitem").select(col("l_orderkey").as("k"))
      val wdt = o.agg(max("k").as("m1"))
        .crossJoin(l.agg(max("k").as("m2")))
        .select(expr("greatest(m1, m2) div 32 + 1").as("w"))
      def hist(t: DataFrame, n: String, d: String) =
        t.crossJoin(broadcast(wdt))
          .groupBy(expr("k div w").as("bucket"))
          .agg(count(lit(1)).as(n), countDistinct("k").as(d))
      val h = hist(o, "n1", "d1")
        .join(hist(l, "n2", "d2"), Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("n1"), lit(0L)).as("n1"),
          coalesce(col("d1"), lit(0L)).as("d1"),
          coalesce(col("n2"), lit(0L)).as("n2"),
          coalesce(col("d2"), lit(0L)).as("d2"))
        .withColumn("est_b",
          expr("(n1 * n2) div greatest(greatest(d1, d2), 1)"))
      val tot = h.agg(sum("est_b").as("est_total"))
      val tru = o.groupBy("k").agg(count(lit(1)).as("c1"))
        .join(l.groupBy("k").agg(count(lit(1)).as("c2")), "k")
        .agg(sum(expr("c1 * c2")).as("truth"))
      h.crossJoin(broadcast(tot)).crossJoin(broadcast(tru))
        .select(col("bucket"), col("n1"), col("d1"), col("n2"),
          col("d2"), col("est_b"), col("est_total"), col("truth"),
          expr("((est_total - truth) * 1000000) div truth")
            .as("err_micro"))
        .orderBy("bucket")
    }),

    // ---- functional-dependency audit (data-quality rule check) ----------
    // "Does p_name determine p_brand?" — the violation table: every
    // LHS value mapping to more than one RHS, with row mass, distinct
    // RHS count, and min/max example values. One partial-combining
    // aggregate on the LHS key (a single-column count DISTINCT plans
    // as a two-phase agg on (lhs, rhs) — no Expand, no self-join).
    "p_fd_audit" -> ((s, dir) => {
      Tables(s, dir, "part")
        .groupBy("p_name")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct("p_brand").as("n_brands"),
          min("p_brand").as("brand_min"),
          max("p_brand").as("brand_max"))
        .filter(col("n_brands") > 1)
        .orderBy("p_name")
    }),

    // ---- k-anonymity / l-diversity privacy audit ------------------------
    // Pre-release privacy gate over a fact table: for each
    // quasi-identifier combination (priority, order month, status),
    // the group size (k-anonymity), the number of distinct sensitive
    // values (l-diversity over o_custkey), and the top sensitive
    // value's share (the distinctness input to t-closeness). Emits
    // only the violating groups (k < 5 or l < 3) — the table a
    // release reviewer reads. Two partial-combining aggregations:
    // (quasi, sensitive) cells first, then per-quasi reduce — never a
    // per-row window, so it holds at any corpus size; cell count is
    // bounded by true (quasi x sensitive) support, not rows².
    "p_kanonymity" -> ((s, dir) => {
      val r6 = graft.llm.TextOps.round6 _
      val cell = Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
          col("o_orderstatus"), col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
      cell.groupBy("o_orderpriority", "order_month", "o_orderstatus")
        .agg(sum("cnt").cast("long").as("group_n"),
          count(lit(1)).as("l_distinct"),
          max("cnt").as("top_cnt"))
        .filter(col("group_n") < 5 || col("l_distinct") < 3)
        .select(col("o_orderpriority"), col("order_month"),
          col("o_orderstatus"), col("group_n"), col("l_distinct"),
          r6(col("top_cnt").cast("double") / col("group_n")).as("max_share"),
          (col("group_n") < 5).as("k_violation"),
          (col("l_distinct") < 3).as("l_violation"))
        .orderBy("o_orderpriority", "order_month", "o_orderstatus")
    }),

    // ---- Jenks optimal quality-tier binning (X317) -------------------------
    // Exact 1-D k-means over the stopword per-mille score domain: the
    // provably-optimal k=4 tiers the equi-depth histogram (X217)
    // approximates. One corpus pass to the value histogram; the
    // O(k·B²) DP and the backtrack are metadata-sized.
    "p_jenks_breaks" -> ((s, dir) => {
      val ws = graft.llm.TextOps.words(col("text"))
      val scored = Tables(s, dir, "documents")
        .select(size(ws).cast("long").as("n"),
          size(filter(ws, w => w.isin("the", "a", "of", "to", "and")))
            .cast("long").as("cstop"))
        .filter(col("n") > 0)
        .select(expr("(cstop * 1000) div n").as("score"))
      graft.operators.Jenks.breaks(scored, "score", k = 4)
    }),

    // ---- deterministic RANSAC robust line fit (X314) ----------------------
    // Max-consensus estimation next to Theil-Sen/MAD: a planted
    // y = 3x + 40 line with ±50 md5 noise and a 20% md5-chosen +8000
    // outlier stratum; 32 candidate lines from md5-rank pairs score
    // against the corpus in ONE broadcast cross join with the
    // cross-multiplied exact-integer y-residual test.
    "p_ransac" -> ((s, dir) => {
      def h4(salt: String) = conv(substring(md5(concat(lit(s"$salt|"),
        col("k").cast("string"))), 1, 4), 16, 10).cast("long")
      val pts = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          (col("o_orderkey") % 1000).cast("long").as("x"))
        .select(col("k"), col("x"),
          (col("x") * 3 + 40 + (h4("rn") % 101 - 50)
            + when(h4("ro") % 5 === 0, 8000L).otherwise(0L)).as("y"))
      graft.operators.Ransac.lineFit(pts, "k", "x", "y",
        k = 32, tol = 100L)
    }),

    // ---- t-closeness privacy audit (X305) --------------------------------
    // The third release gate next to k-anonymity/l-diversity: per
    // quasi-class (priority, status), Earth Mover's Distance between
    // the class's ordered price-band distribution and the global one
    // (Li et al. ICDE'07 closed form — prefix sums of the gap).
    // Exact integers end to end (gaps scaled by n_c·N), one final
    // division through round6. One corpus-pass combine agg to the
    // class×band cells; histogram, class sizes, and total all
    // REDERIVE from the pinned cells — the corpus is read once.
    "p_tcloseness" -> ((s, dir) => {
      val cells = Tables(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus"),
          expr("cast(floor(o_totalprice * 100 + 0.5) as bigint) " +
            "div 6000000").as("band"))
        .groupBy("o_orderpriority", "o_orderstatus", "band")
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // 3 consumers: histogram, sizes, grid
      graft.operators.TCloseness.audit(cells,
        Seq("o_orderpriority", "o_orderstatus"), "band", "cnt",
        threshold = 0.05)
        .orderBy("o_orderpriority", "o_orderstatus")
    }),

    // ---- Mondrian k-anonymization (the generalization step) -------------
    // Recursive bucketed-median bisection of orders in (price cents,
    // epoch day) quasi-space, depth 8, k = 50 — every published range
    // holds >= 50 orders. All-integer rounds; the oracle replays the 8
    // cuts unrolled. operators/Mondrian.scala documents the two
    // deliberate departures from LeFevre'06 (round-robin dimension,
    // bucket-boundary cuts) and the per-round scale shape.
    "p_mondrian" -> ((s, dir) => {
      val rows = Tables(s, dir, "orders").select(
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("long").as("eday"))
      graft.operators.Mondrian.generalize(
        graft.operators.Mondrian.partition(rows, "cents", "eday",
          k = 50, depth = 8, w1 = 500000L, w2 = 30L))
        .select(col("a1_lo").as("price_lo"), col("a1_hi").as("price_hi"),
          col("a2_lo").as("day_lo"), col("a2_hi").as("day_hi"),
          col("n_rows"))
        .orderBy("price_lo", "price_hi", "day_lo", "day_hi", "n_rows")
    }),

    // ---- equi-depth histogram + range-selectivity audit ------------------
    // The System-R/ANALYZE stats loop the advisor family (p_join_forecast,
    // p_sortkey_advisor) assumes: build an 8-bucket equi-depth histogram
    // on price cents, then ESTIMATE a fixed panel of range predicates
    // from the published (nb, lo, hi) stats alone — uniform-within-
    // bucket interpolation, the textbook optimizer rule — and audit
    // against exact counts. Determinism is structural, not rounded:
    // boundary fractions i/8 are dyadic and the data integer, so
    // p*(n-1) and the interpolation are EXACT in doubles (bit-identical
    // across engines), and the estimate is all-integer ppm arithmetic
    // (per-bucket floor'd rate x overlap, summed as longs). The exact
    // side is one corpus pass x |panel| (the audit's inherent cost;
    // production ships est only). percentile() is the exact small-table
    // spelling — the 100 TB stats build swaps in approx_percentile,
    // same downstream estimator (the p_profile / p_profile_approx
    // split).
    "p_histogram_stats" -> ((s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem").select(
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
      val qs = li.agg(expr("percentile(c, array(0.125, 0.25, 0.375, " +
        "0.5, 0.625, 0.75, 0.875))").as("qs"))
      val bucket = (1 to 7).map(i =>
        when(col("c").cast("double") > element_at(col("qs"), i), 1)
          .otherwise(0)).reduce(_ + _)
      val hist = li.crossJoin(broadcast(qs))
        .select(col("c"), bucket.as("b"))
        .groupBy("b")
        .agg(count(lit(1)).as("nb"), min("c").as("lo"), max("c").as("hi"))
      val panel = Seq(
        (1, 100000L, 500000L), (2, 500000L, 1500000L),
        (3, 1500000L, 3000000L), (4, 3000000L, 6000000L),
        (5, 6000000L, 9000000L), (6, 9000000L, 10500000L),
        (7, 2000000L, 2100000L), (8, 0L, 20000000L))
        .toDF("pred_id", "lo_pred", "hi_pred")
      val olen = greatest(lit(0L),
        least(col("hi"), col("hi_pred")) -
          greatest(col("lo"), col("lo_pred")) + 1)
      val est = panel.crossJoin(broadcast(hist))
        .select(col("pred_id"), col("lo_pred"), col("hi_pred"),
          (expr("nb * 1000000 DIV (hi - lo + 1)") * olen).as("part"))
        .groupBy("pred_id", "lo_pred", "hi_pred")
        .agg(sum("part").cast("long").as("est_rows_e6"))
      val exact = li.crossJoin(broadcast(panel))
        .filter(col("c").between(col("lo_pred"), col("hi_pred")))
        .groupBy("pred_id").agg(count(lit(1)).as("exact_rows"))
      est.join(exact, Seq("pred_id"), "left")
        .na.fill(0L, Seq("exact_rows"))
        .select(col("pred_id"), col("lo_pred"), col("hi_pred"),
          col("est_rows_e6"), col("exact_rows"),
          (col("est_rows_e6") - col("exact_rows") * 1000000L).as("err_e6"))
        .orderBy("pred_id")
    }),

    // ---- P1-P7 string scalar ops ----------------------------------------
    "p_string_ops" -> ((s, dir) => {
      val p = Tables(s, dir, "part")
      p.select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
        element_at(split(col("p_type"), " "), -1).as("type_last"),
        regexp_replace(col("p_type"), "ANODIZED|BURNISHED", "").as("type_stripped"),
        col("p_type").endsWith("STEEL").as("is_steel"),
        col("p_type").rlike("BRASS|COPPER").as("has_metal"),
        upper(coalesce(
          when(col("p_brand") === "Brand#13", lit(null)).otherwise(col("p_brand")),
          lit("nan"))).as("brand_nan"))
        .orderBy("p_partkey")
    }),

    // ---- P8-P10 numeric scalar ops --------------------------------------
    "p_numeric_ops" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val cents = col("l_partkey") % 100000
      val str = concat(
        (cents / 100).cast("long").cast("string"), lit("."),
        lpad((cents % 100).cast("string"), 2, "0"))
      val parsed = when(col("l_linenumber") === 7, lit("oops"))
        .otherwise(str).try_cast(org.apache.spark.sql.types.DoubleType)
      val converted = when(col("l_returnflag") === "R", parsed * 0.85).otherwise(parsed)
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        parsed.as("parsed"),
        converted.as("converted"),
        (floor(converted * 100 + 0.5) / 100.0).as("rounded_half_up"),
        (bround(converted * 100, 0) / 100.0).as("rounded_half_even"))
        // (l_orderkey, l_linenumber) is NOT unique in the feed; `parsed`
        // tie-breaks so the order is total over distinct output rows
        // (rows still tied have every output column equal). Spark sorts
        // nulls first on ASC — the oracle says NULLS FIRST explicitly.
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("parsed").asc_nulls_first, col("converted").asc_nulls_first)
    }),

    // ---- P11-P13 date ops ------------------------------------------------
    "p_date_ops" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val raw = when(col("o_orderkey") % 19 === 0, lit("garbage"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
      val parsed = try_to_timestamp(raw)
      o.select(
        col("o_orderkey"),
        date_format(parsed, "yyyy-MM-dd HH:mm:ss").as("parsed_str"),
        date_format(col("o_orderdate"), "MM/yyyy").as("mes"),
        fmt(col("o_orderdate")).as("iso"))
        .orderBy("o_orderkey")
    }),

    // ---- P14-P18 null handling ------------------------------------------
    "p_null_ops" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val acct = when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal"))
      val mkt = when(col("c_custkey") % 11 === 0, lit(null)).otherwise(col("c_mktsegment"))
      c.select(col("c_custkey"), acct.as("acct_n"), mkt.as("mkt_n"))
        .withColumn("any_null", col("acct_n").isNull || col("mkt_n").isNull)
        .filter(!col("any_null"))
        .withColumn("tag", lit("K"))
        .drop("any_null")
        .orderBy("c_custkey")
    }),

    // ---- M1 keep-first dedup --------------------------------------------
    // lineitem's (orderkey, linenumber) is NOT unique, so the keep-first
    // order tie-breaks on the full payload to stay deterministic.
    // Keep-first = argmin over the total order → min_by aggregation
    // (map-side combine, no per-key sort), same rows as the oracle's
    // row_number spelling.
    "m1_dedup_keep_first" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val ord = struct(
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
      li.groupBy("l_orderkey")
        .agg(min_by(struct(col("l_linenumber"), col("l_partkey")), ord).as("_first"))
        .select(col("l_orderkey"),
          col("_first.l_linenumber").as("l_linenumber"),
          col("_first.l_partkey").as("l_partkey"))
        .orderBy("l_orderkey")
    }),

    // ---- M2 duplicate flag (all copies) ---------------------------------
    "m2_duplicate_flag" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
      o.select(
        col("o_orderkey"), col("o_custkey"),
        (count(lit(1)).over(w) > 1).as("is_dup"))
        .orderBy("o_orderkey")
    }),

    // ---- M3 union-by-name with missing columns --------------------------
    "m3_union_by_name" -> ((s, dir) => {
      val n = Tables(s, dir, "nation")
        .select(col("n_name").as("name"), lit("nation").as("src"),
          col("n_regionkey").as("rk"))
      val r = Tables(s, dir, "region")
        .select(lit("region").as("src"), col("r_name").as("name"))
      n.unionByName(r, allowMissingColumns = true).orderBy("src", "name")
    }),

    // ---- M4 / TPC-H Q1-shaped pricing summary ---------------------------
    "agg_pricing_summary" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          centsSum(col("l_quantity")).as("sum_qty"),
          centsSum(col("l_extendedprice")).as("sum_base_price"),
          centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          centsSum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- broadcast join + agg -------------------------------------------
    "j1_revenue_by_nation" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val sup = Tables(s, dir, "supplier")
      val nat = Tables(s, dir, "nation")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // ---- semi / anti joins ----------------------------------------------
    "j2_semi_anti" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("tag"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("tag"))
      semi.unionByName(anti).orderBy("c_custkey")
    }),

    // ---- exact quantiles per group --------------------------------------
    // percentile() is the EXACT sort-based form (linear interpolation,
    // same definition as DuckDB quantile_cont); round6 absorbs last-ulp
    // interpolation differences. For 100 TB use approx_percentile — the
    // t-digest sketch is mergeable map-side (tested separately; sketches
    // aren't bit-comparable across engines).
    "p_quantiles" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          (floor(expr("percentile(value, 0.5)") * 1000000.0 + 0.5) / 1000000.0).as("med"),
          (floor(expr("percentile(value, 0.95)") * 1000000.0 + 0.5) / 1000000.0).as("p95"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // ---- table profiling (ANALYZE-style column statistics) ---------------
    // EXACT per-column row/null/distinct counts and min/max over
    // lineitem — the SMALL-TABLE option: each column's exact NDV is a
    // partial-combined distinct on its own narrow pruned scan (|cols|
    // scans), because the single-pass multi-distinct spelling
    // (count_distinct × 6 in one agg) compiles to an Expand that reads
    // every column and multiplies rows ×|cols| — measured 8.5 s vs ~1 s
    // for this shape at sf0.1. The 100 TB DEFAULT is p_profile_approx
    // below: sketches collapse the whole profile back to ONE pass.
    // Profiled columns are ints + strings: float/timestamp string
    // renderings are engine-trap territory the money/date rules already
    // exclude elsewhere.
    "p_profile" -> ((s, dir) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_returnflag", "l_linestatus")
      val li = Tables(s, dir, "lineitem")
      cols.map { c =>
        val d = li.select(col(c))
        val basic = d.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        val nd = d.where(col(c).isNotNull).distinct()
          .agg(count(lit(1)).as("n_distinct"))
        basic.crossJoin(nd)
          .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_val"), col("max_val"))
      }.reduce(_ unionByName _)
        .orderBy("column_name")
    }),

    // ---- sketch table profile: the 100 TB default -------------------------
    // The SAME profile through mergeable sketches in ONE corpus pass — no
    // Expand, no per-column rescan, one scan + one exchange no matter how
    // many columns are profiled. Exact n_rows/n_nulls/min/max ride along
    // in the same pass. At 100 TB this is the only profile that finishes;
    // `p_profile` (exact NDV, |cols| scans) stays as the documented
    // small-table option.
    //
    // Unlike HLL++/t-digest (whose register layouts are engine-private,
    // X34 precedent), the sketches here are ENGINE-INDEPENDENT, so the
    // query carries a full DuckDB hash oracle:
    //  - NDV via KMV [Beyer et al., SIGMOD'07]: the k=256 smallest
    //    DISTINCT 60-bit md5 values of each column are a pure function of
    //    the data (`bottomk_distinct_long`, a bounded TypedImperative
    //    aggregate; the oracle replays it as DISTINCT…ORDER BY…LIMIT k),
    //    and the estimate (k−1)·2⁶⁰/h₍ₖ₎ goes through bit-identical IEEE
    //    ops in both engines. |K|<k means the column's full distinct-hash
    //    set fits the sketch → exact count.
    //  - Quantiles via a deterministic bottom-k-by-hash row sample
    //    (k=1024): `topk_by_long(value, −rowhash, k)` keeps the sample
    //    rows with the smallest row hashes (ties → smallest value, the
    //    oracle's ORDER BY rh, v), then the explicit rank rule
    //    s[⌊(n−1)·q⌋] on the sorted sample — reproducible exactly, with
    //    the usual O(1/√k) sample-quantile error vs the population.
    // Both sketch states are O(k) and partial-mergeable, so the map side
    // ships ~2–16 KB per column per task regardless of row count —
    // SketchSpec pins the one-scan/no-Expand plan shape and the error
    // bounds vs the exact profile.
    "p_profile_approx" -> ((s, dir) => {
      val intCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      val strCols = Seq("l_returnflag", "l_linestatus")
      val cols = intCols ++ strCols
      val kN = 256   // KMV sketch size
      val kS = 1024  // quantile sample size
      val pow60 = "cast(255 as double) * cast(1152921504606846976 as double)" // (k-1)·2^60
      val li = Tables(s, dir, "lineitem")
        .select(cols.map(col): _*)
        // 60-bit row key for the quantile sample; duplicate (orderkey,
        // linenumber) rows (they exist — see lineitem gotcha) collide to
        // the same (key, value) pair, which both engines' tie rule keeps
        // as an identical multiset
        .withColumn("_rh", expr(
          "cast(conv(substring(md5(concat('smp|', cast(l_orderkey as string), '|', " +
            "cast(l_linenumber as string), '|', cast(l_partkey as string), '|', " +
            "cast(l_suppkey as string))), 1, 15), 16, 10) as bigint)"))
      val aggs = cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
          min(col(c)).cast("string").as(s"${c}_min"),
          max(col(c)).cast("string").as(s"${c}_max"),
          expr(s"bottomk_distinct_long(cast(conv(substring(md5(concat('kmv|', " +
            s"cast($c as string))), 1, 15), 16, 10) as bigint), $kN)").as(s"${c}_kmv"))
      } ++ intCols.map { c =>
        expr(s"topk_by_long(cast($c as bigint), -_rh, $kS)").as(s"${c}_smp")
      }
      def ndv(c: String) =
        expr(s"case when size(${c}_kmv) < $kN then cast(size(${c}_kmv) as bigint) " +
          // clamp before the cast — see llm_kmv_set_ops rationale (ADVICE r9)
          s"else cast(least(floor($pow60 / cast(element_at(${c}_kmv, $kN) as double)), " +
          s"cast(4611686018427387904 as double)) as bigint) end")
      def quantile(c: String, q: String) =
        expr(s"cast(element_at(array_sort(transform(${c}_smp, x -> x.payload)), " +
          s"cast(floor(cast(size(${c}_smp) - 1 as double) * $q) as int) + 1) as double)")
      li.agg(count(lit(1)).as("n_rows"), aggs: _*)
        // one aggregate row → |cols| profile rows, still the same pass
        .select(explode(array(cols.map { c =>
          struct(
            lit(c).as("column_name"),
            col("n_rows").as("n_rows"),
            col(s"${c}_nulls").as("n_nulls"),
            ndv(c).as("n_distinct_approx"),
            col(s"${c}_min").as("min_val"),
            col(s"${c}_max").as("max_val"),
            (if (intCols.contains(c)) quantile(c, "0.5")
             else lit(null).cast("double")).as("med_approx"),
            (if (intCols.contains(c)) quantile(c, "0.95")
             else lit(null).cast("double")).as("p95_approx"))
        }: _*)).as("p"))
        .select("p.*")
        .orderBy("column_name")
    }),

    // ---- column-pair correlation matrix (feature audit) ------------------
    // Pearson correlation for every numeric column pair in ONE combine
    // aggregate (no Expand, no per-pair rescan): values quantize to
    // integer cents (the money round rule), all moments (S, Q, cross
    // products) accumulate as exact decimal(38,0) — Spark decimals and
    // DuckDB HUGEINTs hold the SAME exact integers, so the centered
    // moments n·Sxy − Sx·Sy are bit-identical cross-engine; only the
    // final corr = cov/√(varx·vary) touches doubles, and identical
    // inputs through identical IEEE ops give identical outputs (round6
    // absorbs nothing here but keeps the cross-engine pin uniform).
    // Listwise null drop, stated in both engines.
    "p_correlation" -> ((s, dir) => {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val li = Tables(s, dir, "lineitem")
        .filter(cs.map(col(_).isNotNull).reduce(_ && _))
        .select(cs.map(c =>
          floor(col(c) * 100 + 0.5).cast("decimal(38,0)").as(c)): _*)
      val pairs = for { i <- cs.indices; j <- cs.indices if i < j }
        yield (cs(i), cs(j))
      val aggs = cs.map(c => sum(col(c)).as(s"s_$c")) ++
        cs.map(c => sum(col(c) * col(c)).as(s"q_$c")) ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"x_${a}_$b") }
      li.agg(count(lit(1)).cast("decimal(38,0)").as("n_d"), aggs: _*)
        .select(explode(array(pairs.map { case (a, b) =>
          val cov = (col("n_d") * col(s"x_${a}_$b") -
            col(s"s_$a") * col(s"s_$b")).cast("double")
          val va = (col("n_d") * col(s"q_$a") -
            col(s"s_$a") * col(s"s_$a")).cast("double")
          val vb = (col("n_d") * col(s"q_$b") -
            col(s"s_$b") * col(s"s_$b")).cast("double")
          struct(lit(a).as("col_x"), lit(b).as("col_y"),
            col("n_d").cast("long").as("n"),
            graft.llm.TextOps.round6(cov / sqrt(va * vb)).as("corr"))
        }: _*)).as("p"))
        .select("p.*")
        .orderBy("col_x", "col_y")
    }),

    // ---- TPC-H Q3 shape: selective joins + agg + top-k ------------------
    "j5_shipping_priority" -> ((s, dir) => {
      val cut = lit("1998-06-01").cast("date")
      val c = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders").filter(col("o_orderdate") < cut)
      val li = Tables(s, dir, "lineitem").filter(col("l_shipdate") > cut)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd"))
    }),

    // ---- scalar-subquery shape: filter against a global aggregate -------
    // The threshold compare is pure integer arithmetic (cents*count vs
    // cents-sum) — no double average whose value depends on reduction
    // order. The aggregate is a 1-row broadcast.
    "q5_above_avg" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val tot = o.agg(
        sum(cents).as("_sum"), count(lit(1)).as("_n"))
      o.crossJoin(broadcast(tot))
        .filter(cents * col("_n") > col("_sum"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // ---- SQL text entry path (spark.sql over temp views) ----------------
    // Same engine, same plans — proves the SQL API surface end-to-end.
    "q6_sql_surface" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""
        WITH revenue AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
          FROM v_lineitem WHERE l_quantity > 10)
        SELECT l_returnflag, sum(cents) / CAST(100 AS DOUBLE) AS revenue, count(*) AS n
        FROM revenue GROUP BY l_returnflag ORDER BY l_returnflag
      """)
    }),

    // ---- rollup: hierarchical subtotals ---------------------------------
    "agg_rollup_revenue" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val sup = Tables(s, dir, "supplier")
      val nat = Tables(s, dir, "nation")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .withColumn("yr", year(col("l_shipdate")))
        .rollup(col("n_name"), col("yr"))
        .agg(
          centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name").asc_nulls_first, col("yr").asc_nulls_first)
    }),

    // ---- cube subtotals (all grouping-set combinations) ------------------
    // Completes the grouping-sets family next to ROLLUP: CUBE emits
    // every subset of the dims (flag×status, flag, status, grand
    // total) in ONE aggregation pass — Spark expands grouping sets
    // map-side, still a single exchange.
    "agg_cube_pricing" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // ---- intersect / except (set operators) -----------------------------
    "m5_intersect_except" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val big = o.filter(col("o_totalprice") > 150000).select(col("o_custkey").as("k"))
      val fin = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      big.intersect(fin).withColumn("tag", lit("both"))
        .unionByName(big.except(fin).withColumn("tag", lit("only_big")))
        .orderBy("k", "tag")
    }),

    // ---- MERGE INTO / upsert (SCD-1 apply) -------------------------------
    // The warehouse change-apply: one FULL-OUTER join of base × changes
    // on the unique key, then per-row op semantics — delete drops,
    // update rewrites in place, insert appends, untouched rows pass
    // through. The changes table is synthesized deterministically from
    // the base (update %13, delete %17 — delete wins on overlap, the
    // documented MERGE conflict rule here — insert clones %29 under new
    // keys) so all four classes are populated in both engines. One
    // shuffle on the near-unique key; change-table size, not base size,
    // drives the incremental cost at scale.
    "m6_merge_upsert" -> ((s, dir) => {
      val base = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
      base.join(custChanges(base), Seq("c_custkey"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(col("c_custkey"),
          when(col("op").isin("U", "I"), col("new_name"))
            .otherwise(col("c_name")).as("c_name"),
          when(col("op").isin("U", "I"), col("new_nationkey"))
            .otherwise(col("c_nationkey")).as("c_nationkey"),
          coalesce(col("op"), lit("=")).as("op"))
        .orderBy("c_custkey")
    }),

    // ---- SCD-2 history apply (versioned dimension) -----------------------
    // The other half of the warehouse change-apply: instead of rewriting
    // in place, every change CLOSES the current version (valid_to set,
    // is_current false) and updates/inserts open a new one — the
    // versioned-dimension layout time-travel queries read. Same change
    // table as m6 (one builder, the two queries cannot drift); old
    // versions come from a LEFT join base × changes, new versions from
    // the U/I rows — two narrow passes over the change join, one shuffle
    // on the key.
    "m7_scd2_history" -> ((s, dir) => {
      val base = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
      val t1 = lit("2024-06-01")
      val old = base.join(custChanges(base).select("c_custkey", "op"),
          Seq("c_custkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          lit("2024-01-01").as("valid_from"),
          when(col("op").isin("U", "D"), t1)
            .otherwise(lit(null).cast("string")).as("valid_to"),
          col("op").isNull.as("is_current"))
      val fresh = custChanges(base).filter(col("op").isin("U", "I"))
        .select(col("c_custkey"), col("new_name").as("c_name"),
          col("new_nationkey").as("c_nationkey"),
          t1.as("valid_from"), lit(null).cast("string").as("valid_to"),
          lit(true).as("is_current"))
      old.unionByName(fresh).orderBy("c_custkey", "valid_from")
    }),

    // ---- pivot (wide aggregation) ---------------------------------------
    "p_pivot" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.withColumn("yr", year(col("o_orderdate")))
        .groupBy("yr")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(centsSum(col("o_totalprice")))
        .orderBy("yr")
    }),

    // ---- as-of join (backward): latest purchase AT-OR-BEFORE each click -
    // graft.operators.AsOfJoin: windowed-union form, ONE shuffle on
    // user_id, instead of the naive clicks×purchases range join whose
    // candidate set is quadratic per user.
    "j4_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      graft.operators.AsOfJoin
        .backward(clicks, purchases, Seq("user_id"), "ts", "event_id",
          payloadCols = Seq("ts", "event_id"))
        .select(
          col("user_id"), col("event_id").as("click_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("asof_event_id").as("purchase_id"))
        .orderBy("click_id")
    }),

    // ---- shuffle join + window top-k ------------------------------------
    "j3_topk_orders_per_customer" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("rn"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("c_custkey", "rn")
    }),

    // ---- per-key analytic window functions (lag/lead/running sum) --------
    // The SQL-analytics surface over customer order histories: previous/
    // next order date, day gap, and a running spend. One shuffle on the
    // customer key; per-customer window sort only (never global). The
    // running sum runs over integer CENTS in an explicit ROWS frame with
    // a unique (date, key) order — float summation order and RANGE-frame
    // tie semantics can't bite.
    "p_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("_cents"))
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
        .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")))
        .withColumn("running_cents", sum("_cents").over(run))
        .withColumn("rn", row_number().over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("string").as("order_date"),
          col("prev_date").cast("string").as("prev_date"),
          col("next_date").cast("string").as("next_date"),
          col("gap_days"), col("running_cents"), col("rn"))
        .orderBy("o_custkey", "rn")
    })
  )

  // ======================================================================
  // DuckDB oracles
  // ======================================================================

  private val salesCte = s"WITH sales AS (${SyntheticSales.sql})"

  /** Q1's cleaning chain as reusable CTE suffix (through the valid set). */
  private val validCte = s"""
    $salesCte,
    up AS (
      SELECT upper("Sale_ID") AS sid, "Product" AS product, "Amount" AS amount,
             "Date" AS d, "Audit_Date" AS ad, _ord
      FROM sales WHERE "Sale_ID" IS NOT NULL),
    dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY sid
          ORDER BY _ord, product NULLS FIRST, amount NULLS FIRST,
                   d NULLS FIRST, ad NULLS FIRST) AS rn
        FROM up)
      WHERE rn = 1),
    prodf AS (
      SELECT *, (string_split(trim(upper(product)), '-'))[-1] AS p2
      FROM dedup
      WHERE (string_split(trim(upper(product)), '-'))[-1] IS NOT NULL),
    amt AS (
      SELECT *,
        TRY_CAST(replace(replace(amount, 'USD', ''), 'EUR', '') AS DOUBLE) AS a0,
        coalesce(ends_with(amount, 'EUR'), false) AS iseur
      FROM prodf),
    amtf AS (
      SELECT *, floor((CASE WHEN iseur THEN a0 * 0.85 ELSE a0 END) * 100 + 0.5) / 100.0 AS a2
      FROM amt
      WHERE floor((CASE WHEN iseur THEN a0 * 0.85 ELSE a0 END) * 100 + 0.5) / 100.0 IS NOT NULL),
    valid AS (
      SELECT sid, p2, a2, TRY_CAST(d AS TIMESTAMP) AS dts, ad
      FROM amtf
      WHERE TRY_CAST(d AS TIMESTAMP) IS NOT NULL AND ad IS NOT NULL)
  """

  /** SQL mirror of [[custChanges]] — base + ch CTEs shared by the
    * m6/m7 oracles. */
  private val custChangesSql: String = """base AS (
        SELECT c_custkey, c_name, c_nationkey FROM customer),
      ch AS (
        SELECT c_custkey, 'U' AS op, c_name || ' (updated)' AS new_name,
               c_nationkey AS new_nationkey
        FROM base WHERE c_custkey % 13 = 0 AND c_custkey % 17 <> 0
        UNION ALL
        SELECT c_custkey, 'D' AS op, CAST(NULL AS VARCHAR), CAST(NULL AS INT)
        FROM base WHERE c_custkey % 17 = 0
        UNION ALL
        SELECT c_custkey + 1000000 AS c_custkey, 'I' AS op,
               'NEW ' || c_name AS new_name, c_nationkey AS new_nationkey
        FROM base WHERE c_custkey % 29 = 0)"""

  val oracleSql: Map[String, String] = Map(
    "q1_clean_valid" -> s"""
      $validCte
      SELECT sid AS "Sale_ID", p2 AS "Product", a2 AS "Amount",
             strftime(dts, '%Y-%m-%d') AS "Date",
             strftime(ad, '%Y-%m-%d') AS "Audit_Date"
      FROM valid ORDER BY sid
    """,

    "q2_detect_invalid" -> s"""
      $salesCte,
      clean AS (
        SELECT upper(coalesce("Sale_ID", 'nan')) AS sid,
               upper((string_split(coalesce("Product", 'nan'), '-'))[-1]) AS prod,
               "Amount" AS amount, "Date" AS d, "Audit_Date" AS ad, _ord
        FROM sales),
      n_rows AS (
        SELECT sid, prod, amount, d, ad, 'N' AS reason, 1 AS blk, _ord
        FROM clean WHERE amount IS NULL OR d IS NULL OR ad IS NULL),
      nn AS (
        SELECT * FROM clean
        WHERE amount IS NOT NULL AND d IS NOT NULL AND ad IS NOT NULL),
      a_rows AS (
        SELECT sid, prod, amount, d, ad, 'A' AS reason, 2 AS blk, _ord
        FROM nn WHERE NOT regexp_matches(upper(amount), 'USD|EUR')),
      rest AS (
        SELECT * FROM nn WHERE regexp_matches(upper(amount), 'USD|EUR')),
      d_rows AS (
        SELECT sid, prod, amount, d, ad, 'D' AS reason, 3 AS blk, _ord
        FROM (SELECT *, count(*) OVER (PARTITION BY sid) AS c FROM rest)
        WHERE c > 1)
      SELECT "Sale_ID", "Product", "Amount", "Date", "Audit_Date", "Reason"
      FROM (
        SELECT sid AS "Sale_ID", prod AS "Product", amount AS "Amount",
               strftime(TRY_CAST(d AS TIMESTAMP), '%Y-%m-%d') AS "Date",
               strftime(ad, '%Y-%m-%d') AS "Audit_Date", reason AS "Reason",
               blk, _ord
        FROM (SELECT * FROM n_rows UNION ALL SELECT * FROM a_rows
              UNION ALL SELECT * FROM d_rows))
      ORDER BY blk, _ord, "Sale_ID" NULLS FIRST, "Product" NULLS FIRST,
               "Amount" NULLS FIRST, "Date" NULLS FIRST,
               "Audit_Date" NULLS FIRST, "Reason" NULLS FIRST
    """,

    "q3_monthly_summary" -> s"""
      $validCte
      SELECT strftime(dts, '%m/%Y') AS "Mes", p2 AS "Producto",
             sum(CAST(floor(a2 * 100 + 0.5) AS BIGINT)) / 100.0 AS "Ventas_Totales",
             count(a2) AS "Numero_Transacciones",
             min(a2) AS "Venta_Minima"
      FROM valid GROUP BY 1, 2 ORDER BY 1, 2
    """,

    "q4_format_dates" -> """
      SELECT o_orderkey,
             strftime(TRY_CAST(CASE WHEN o_orderkey % 19 = 0 THEN 'not a date'
                    ELSE strftime(o_orderdate, '%Y-%m-%d') END AS TIMESTAMP),
                    '%Y-%m-%d') AS "Date",
             strftime(o_orderdate, '%Y-%m-%d') AS "Audit_Date"
      FROM orders ORDER BY o_orderkey
    """,

    // __SF__ is resolved by Verify to the scale factor it just ran, so
    // the oracle reads the fixture THIS run materialized — never a stale
    // directory left by an earlier run at a different sf.
    "s1_file_roundtrip" -> """
      WITH raw AS (
        SELECT "Sale_ID", "Product", "Amount", "Date",
               CAST("Row_Idx" AS INT) AS ridx,
               regexp_extract(filename, '([^/]+)\.csv$', 1) AS stem,
               TRY_CAST(regexp_extract(filename, '([^/]+)\.csv$', 1) AS TIMESTAMP) AS ad
        FROM read_csv('/tmp/graft_s1_sales/__SF__/*.csv',
                      header=true, all_varchar=true, filename=true)),
      up AS (
        SELECT upper("Sale_ID") AS sid, "Product" AS product,
               "Amount" AS amount, "Date" AS d, ad, stem, ridx
        FROM raw WHERE "Sale_ID" IS NOT NULL),
      dedup AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY sid ORDER BY stem, ridx) AS rn
          FROM up)
        WHERE rn = 1),
      prodf AS (
        SELECT *, (string_split(trim(upper(product)), '-'))[-1] AS p2
        FROM dedup
        WHERE (string_split(trim(upper(product)), '-'))[-1] IS NOT NULL),
      amt AS (
        SELECT *,
          TRY_CAST(replace(replace(amount, 'USD', ''), 'EUR', '') AS DOUBLE) AS a0,
          coalesce(ends_with(amount, 'EUR'), false) AS iseur
        FROM prodf),
      amtf AS (
        SELECT *, floor((CASE WHEN iseur THEN a0 * 0.85 ELSE a0 END) * 100 + 0.5) / 100.0 AS a2
        FROM amt
        WHERE floor((CASE WHEN iseur THEN a0 * 0.85 ELSE a0 END) * 100 + 0.5) / 100.0 IS NOT NULL),
      valid AS (
        SELECT sid, p2, a2, TRY_CAST(d AS TIMESTAMP) AS dts, ad
        FROM amtf
        WHERE TRY_CAST(d AS TIMESTAMP) IS NOT NULL AND ad IS NOT NULL)
      SELECT sid AS "Sale_ID", p2 AS "Product", a2 AS "Amount",
             strftime(dts, '%Y-%m-%d') AS "Date",
             strftime(ad, '%Y-%m-%d') AS "Audit_Date"
      FROM valid ORDER BY sid
    """,

    // Reads the SAME single fixture file the Spark side read through
    // readCsv; DuckDB's all_varchar read + explicit casts replay
    // Spark's inference outcome on this file (Amount/Product/Sale_ID
    // stay strings, Row_Idx int, Date per-row TRY_CAST).
    "s2_single_csv" -> """
      SELECT "Sale_ID", "Product", "Amount",
             strftime(TRY_CAST("Date" AS TIMESTAMP), '%Y-%m-%d') AS "Date",
             CAST("Row_Idx" AS INT) AS "Row_Idx"
      FROM read_csv('/tmp/graft_s1_sales/__SF__/2025-01-01.csv',
                    header=true, all_varchar=true)
      ORDER BY "Row_Idx"
    """,

    // Reads the SAME three CSVs the Spark entry just wrote via the real
    // K1 sink (Verify executes the Spark side, which writes the files,
    // before the oracle compare runs; __SF__ → the verified sf).
    "k1_job_roundtrip" -> {
      val out = "/tmp/graft_k1_out/__SF__"
      val padNull = (cs: Seq[String]) =>
        cs.map(c => s"""CAST(NULL AS VARCHAR) AS "$c"""").mkString(", ")
      s"""
      WITH v AS (SELECT * FROM read_csv('$out/Ventas_Validas_M.csv',
                                        header=true, all_varchar=true)),
      i AS (SELECT * FROM read_csv('$out/Ventas_Invalidas_M.csv',
                                   header=true, all_varchar=true)),
      m AS (SELECT * FROM read_csv('$out/Ventas_Resumen_Mensual.csv',
                                   header=true, all_varchar=true)),
      u AS (
        SELECT 'valid' AS frame, "Sale_ID", "Product", "Amount", "Date",
               "Audit_Date", ${padNull(Seq("Reason", "Row_Idx", "Mes", "Producto",
                 "Ventas_Totales", "Numero_Transacciones", "Venta_Minima"))}
        FROM v
        UNION ALL
        SELECT 'invalid' AS frame, "Sale_ID", "Product", "Amount", "Date",
               "Audit_Date", "Reason", "Row_Idx", ${padNull(Seq("Mes", "Producto",
                 "Ventas_Totales", "Numero_Transacciones", "Venta_Minima"))}
        FROM i
        UNION ALL
        SELECT 'summary' AS frame, ${padNull(Seq("Sale_ID", "Product", "Amount",
                 "Date", "Audit_Date", "Reason", "Row_Idx"))},
               "Mes", "Producto", "Ventas_Totales", "Numero_Transacciones",
               "Venta_Minima"
        FROM m)
      SELECT * FROM u
      ORDER BY frame NULLS FIRST, "Sale_ID" NULLS FIRST, "Product" NULLS FIRST,
               "Amount" NULLS FIRST, "Date" NULLS FIRST, "Audit_Date" NULLS FIRST,
               "Reason" NULLS FIRST, "Row_Idx" NULLS FIRST, "Mes" NULLS FIRST,
               "Producto" NULLS FIRST, "Ventas_Totales" NULLS FIRST,
               "Numero_Transacciones" NULLS FIRST, "Venta_Minima" NULLS FIRST
    """
    },

    // Reads the SAME partitioned layout the Spark entry just wrote
    // (Verify executes the Spark side first; __SF__ → the verified sf).
    "k3_partitioned_roundtrip" -> """
      SELECT o_month, count(*) AS n,
             sum(CAST(floor(price * 100 + 0.5) AS BIGINT)) / 100.0 AS total
      FROM read_parquet('/tmp/graft_k3_out/__SF__/*/*.parquet', hive_partitioning=true)
      WHERE o_month >= '1995-01' AND o_month <= '1995-03'
      GROUP BY o_month ORDER BY o_month
    """,

    "p_string_ops" -> """
      SELECT p_partkey,
             upper(p_name) AS name_upper,
             trim('  ' || p_brand || '  ') AS brand_trim,
             (string_split(p_type, ' '))[-1] AS type_last,
             regexp_replace(p_type, 'ANODIZED|BURNISHED', '', 'g') AS type_stripped,
             ends_with(p_type, 'STEEL') AS is_steel,
             regexp_matches(p_type, 'BRASS|COPPER') AS has_metal,
             upper(coalesce(CASE WHEN p_brand = 'Brand#13' THEN NULL ELSE p_brand END,
                            'nan')) AS brand_nan
      FROM part ORDER BY p_partkey
    """,

    "p_numeric_ops" -> """
      WITH base AS (
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CAST((l_partkey % 100000) // 100 AS VARCHAR) || '.' ||
               lpad(CAST((l_partkey % 100000) % 100 AS VARCHAR), 2, '0') AS s
        FROM lineitem),
      parsedt AS (
        SELECT l_orderkey, l_linenumber,
               TRY_CAST(CASE WHEN l_linenumber = 7 THEN 'oops' ELSE s END AS DOUBLE) AS parsed,
               l_returnflag
        FROM base),
      conv AS (
        SELECT l_orderkey, l_linenumber, parsed,
               CASE WHEN l_returnflag = 'R' THEN parsed * 0.85 ELSE parsed END AS converted
        FROM parsedt)
      SELECT l_orderkey, l_linenumber, parsed, converted,
             floor(converted * 100 + 0.5) / 100.0 AS rounded_half_up,
             round_even(converted * 100, 0) / 100.0 AS rounded_half_even
      FROM conv ORDER BY l_orderkey, l_linenumber,
                         parsed NULLS FIRST, converted NULLS FIRST
    """,

    "p_date_ops" -> """
      SELECT o_orderkey,
             strftime(TRY_CAST(CASE WHEN o_orderkey % 19 = 0 THEN 'garbage'
                    ELSE strftime(o_orderdate, '%Y-%m-%d') END AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS parsed_str,
             strftime(o_orderdate, '%m/%Y') AS mes,
             strftime(o_orderdate, '%Y-%m-%d') AS iso
      FROM orders ORDER BY o_orderkey
    """,

    "p_null_ops" -> """
      WITH w AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS acct_n,
               CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS mkt_n
        FROM customer)
      SELECT c_custkey, acct_n, mkt_n, 'K' AS tag
      FROM w WHERE NOT (acct_n IS NULL OR mkt_n IS NULL)
      ORDER BY c_custkey
    """,

    "m1_dedup_keep_first" -> """
      SELECT l_orderkey, l_linenumber, l_partkey FROM (
        SELECT *, row_number() OVER (
          PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate) AS rn
        FROM lineitem)
      WHERE rn = 1 ORDER BY l_orderkey
    """,

    "m2_duplicate_flag" -> """
      SELECT o_orderkey, o_custkey,
             count(*) OVER (PARTITION BY o_custkey) > 1 AS is_dup
      FROM orders ORDER BY o_orderkey
    """,

    "m3_union_by_name" -> """
      SELECT n_name AS name, 'nation' AS src, n_regionkey AS rk FROM nation
      UNION ALL
      SELECT r_name AS name, 'region' AS src, NULL AS rk FROM region
      ORDER BY src, name
    """,

    "agg_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_disc_price,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_charge,
             count(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """,

    "j1_revenue_by_nation" -> """
      SELECT n_name,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name
    """,

    "j2_semi_anti" -> """
      SELECT c_custkey, 'has_orders' AS tag FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      UNION ALL
      SELECT c_custkey, 'no_orders' AS tag FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey
    """,

    "p_quantiles" -> """
      SELECT event_type,
             floor(quantile_cont(value, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS med,
             floor(quantile_cont(value, 0.95) * 1000000.0 + 0.5) / 1000000.0 AS p95,
             count(*) AS n
      FROM events GROUP BY 1 ORDER BY 1
    """,

    "p_correlation" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for { i <- cs.indices; j <- cs.indices if i < j }
        yield (cs(i), cs(j))
      val qcols = cs.map(c =>
        s"CAST(floor($c * 100 + 0.5) AS BIGINT) AS $c").mkString(", ")
      val sums = (cs.map(c => s"sum($c) AS s_$c") ++
        cs.map(c => s"sum($c * $c) AS q_$c") ++
        pairs.map { case (a, b) => s"sum($a * $b) AS x_${a}_$b" })
        .mkString(",\n               ")
      val rows = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(n_d AS BIGINT) AS n,
             floor(CAST(n_d * x_${a}_$b - s_$a * s_$b AS DOUBLE)
                   / sqrt(CAST(n_d * q_$a - s_$a * s_$a AS DOUBLE)
                          * CAST(n_d * q_$b - s_$b * s_$b AS DOUBLE))
                   * 1000000.0 + 0.5) / 1000000.0 AS corr
           FROM m"""
      }.mkString("\n      UNION ALL\n      ")
      s"""
      WITH q AS (
        SELECT $qcols
        FROM lineitem
        WHERE ${cs.map(c => s"$c IS NOT NULL").mkString(" AND ")}),
      m AS (
        SELECT count(*) AS n_d,
               $sums
        FROM q)
      $rows
      ORDER BY col_x, col_y
    """
    },

    "p_unpivot" -> """
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
      FROM part
      UNION ALL
      SELECT p_partkey, 'p_size_d', CAST(p_size AS DOUBLE) FROM part
      ORDER BY p_partkey, metric
    """,

    "p_groupwise_ols" -> """
      WITH q AS (
        SELECT l_returnflag,
               CAST(floor(l_quantity * 100 + 0.5) AS HUGEINT) AS x,
               CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      m AS (
        SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n_d,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM q GROUP BY l_returnflag)
      SELECT l_returnflag, CAST(n_d AS BIGINT) AS n,
             floor(CAST(n_d * sxy - sx * sy AS DOUBLE)
                   / CAST(n_d * sxx - sx * sx AS DOUBLE)
                   * 1000000.0 + 0.5) / 1000000.0 AS slope,
             floor(CAST(sy * sxx - sx * sxy AS DOUBLE)
                   / CAST(n_d * sxx - sx * sx AS DOUBLE) / 100.0
                   * 1000000.0 + 0.5) / 1000000.0 AS intercept
      FROM m
      ORDER BY l_returnflag
    """,

    "p_expectations" -> """
      WITH a AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_quantity_range,
               CAST(sum(CASE WHEN l_extendedprice <= 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_price_positive,
               CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_discount_range,
               CAST(sum(CASE WHEN l_shipdate IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_shipdate_not_null,
               CAST(sum(CASE WHEN NOT (l_returnflag IN ('A', 'N', 'R'))
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_returnflag_domain,
               CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
                 AS BIGINT) AS v_pk_unique
        FROM lineitem),
      u AS (
        SELECT 'quantity_range' AS "check", n, v_quantity_range AS v FROM a
        UNION ALL SELECT 'price_positive', n, v_price_positive FROM a
        UNION ALL SELECT 'discount_range', n, v_discount_range FROM a
        UNION ALL SELECT 'shipdate_not_null', n, v_shipdate_not_null FROM a
        UNION ALL SELECT 'returnflag_domain', n, v_returnflag_domain FROM a
        UNION ALL SELECT 'pk_unique', n, v_pk_unique FROM a)
      SELECT "check", n AS n_rows, v AS n_violations,
             floor(CAST(v AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5)
               / 1000000.0 AS violation_rate,
             v = 0 AS pass
      FROM u ORDER BY "check"
    """,

    "k10_schema_drift" -> """
      WITH o AS (
        SELECT column_name AS c, column_type AS t
        FROM (DESCRIBE SELECT * FROM
          read_parquet('/tmp/graft_k10_out/__SF__/v1/*.parquet'))),
      n AS (
        SELECT column_name AS c, column_type AS t
        FROM (DESCRIBE SELECT * FROM
          read_parquet('/tmp/graft_k10_out/__SF__/v2/*.parquet')))
      SELECT coalesce(o.c, n.c) AS "column",
             CASE WHEN o.c IS NULL THEN 'added'
                  WHEN n.c IS NULL THEN 'removed'
                  WHEN o.t <> n.t THEN 'type_changed'
                  ELSE 'unchanged' END AS status
      FROM o FULL OUTER JOIN n ON o.c = n.c
      ORDER BY 1
    """,

    "p_trailing_spend" -> """
      WITH o AS (
        SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS day,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
          AND o_totalprice IS NOT NULL)
      SELECT o_custkey, o_orderkey, strftime(day, '%Y-%m-%d') AS day,
             cents,
             CAST(sum(cents) OVER w AS BIGINT) AS spend_7d_cents,
             CAST(count(*) OVER w AS BIGINT) AS n_orders_7d
      FROM o
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY CAST(day - DATE '1970-01-01' AS BIGINT)
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey
    """,

    "p_running_share" -> """
      WITH rev AS (
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS rev_c
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_partkey IS NOT NULL
        GROUP BY l_partkey),
      t AS (SELECT sum(rev_c) AS tot FROM rev),
      r AS (
        SELECT l_partkey, rev_c,
               row_number() OVER (ORDER BY rev_c DESC, l_partkey) AS "rank",
               sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM rev)
      SELECT r."rank", r.l_partkey,
             floor(r.rev_c / 100.0 * 1000000.0 + 0.5) / 1000000.0
               AS revenue,
             floor(CAST(r.cum AS DOUBLE) / t.tot * 1000000.0 + 0.5)
               / 1000000.0 AS cum_share,
             (floor(CAST(r.cum AS DOUBLE) / t.tot * 1000000.0 + 0.5)
               / 1000000.0 <= 0.8) AS in_top80
      FROM r CROSS JOIN t
      ORDER BY r."rank"
    """,

    "s2_quarantine" -> {
      val work = "/tmp/graft_s2q/__SF__"
      s"""
      SELECT 'good' AS status, id, amount,
             strftime(day, '%Y-%m-%d') AS day,
             CAST(NULL AS VARCHAR) AS raw_line
      FROM parquet_scan('$work/good/*.parquet')
      UNION ALL
      SELECT 'quarantine', CAST(NULL AS INT), CAST(NULL AS DOUBLE),
             CAST(NULL AS VARCHAR), raw_line
      FROM parquet_scan('$work/quarantine/*.parquet')
      ORDER BY status, id, raw_line
    """
    },

    "p_benford" -> """
      WITH c AS (
        SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) > 0),
      d AS (
        SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
               CAST(count(*) AS BIGINT) AS n
        FROM c GROUP BY 1),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM d),
      b(digit, benford) AS (VALUES
        (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
        (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
        (9, 0.045757))
      SELECT d.digit, d.n,
             floor(d.n / CAST(t.tot AS DOUBLE) * 1000000.0 + 0.5)
               / 1000000.0 AS share,
             CAST(b.benford AS DOUBLE) AS benford,
             floor((d.n / CAST(t.tot AS DOUBLE)
                    - CAST(b.benford AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 AS deviation
      FROM d CROSS JOIN t JOIN b ON d.digit = b.digit
      ORDER BY d.digit
    """,

    "p_outlier_iqr" -> """
      WITH li AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        FROM lineitem WHERE l_extendedprice IS NOT NULL),
      fences AS (
        SELECT l_returnflag,
               quantile_cont(c, 0.25) AS q1,
               quantile_cont(c, 0.75) AS q3,
               CAST(count(*) AS BIGINT) AS n
        FROM li GROUP BY 1),
      f2 AS (
        SELECT l_returnflag, q1, q3, n,
               q1 - (q3 - q1) * 1.5 AS lo,
               q3 + (q3 - q1) * 1.5 AS hi
        FROM fences)
      SELECT li.l_returnflag, f2.n,
             floor(f2.q1 / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS q1,
             floor(f2.q3 / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS q3,
             CAST(sum(CASE WHEN li.c < f2.lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_low,
             CAST(sum(CASE WHEN li.c > f2.hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_high,
             floor((sum(CASE WHEN li.c < f2.lo THEN 1 ELSE 0 END)
                    + sum(CASE WHEN li.c > f2.hi THEN 1 ELSE 0 END))
                   / CAST(f2.n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
               AS out_pct
      FROM li JOIN f2 ON li.l_returnflag = f2.l_returnflag
      GROUP BY li.l_returnflag, f2.n, f2.q1, f2.q3
      ORDER BY li.l_returnflag
    """,

    "p_skew_profile" -> """
      WITH c AS (
        SELECT l_orderkey, CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1)
      SELECT CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             max(c) AS max_c,
             floor(quantile_cont(c, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS p50_c,
             floor(quantile_cont(c, 0.9) * 1000000.0 + 0.5) / 1000000.0 AS p90_c,
             floor(quantile_cont(c, 0.99) * 1000000.0 + 0.5) / 1000000.0 AS p99_c,
             floor(CAST(sum(c) AS DOUBLE) / count(*) * 1000000.0 + 0.5)
               / 1000000.0 AS mean_c,
             floor(CAST(max(c) AS DOUBLE) * count(*) / sum(c)
               * 1000000.0 + 0.5) / 1000000.0 AS max_over_mean
      FROM c
    """,

    "p_join_size_sketch" -> """
      WITH ks AS (
        SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
      est AS (
        SELECT e,
               sum(CASE WHEN CAST('0x' || substr(h, e + 1, 1) AS INT)
                          % 2 = 0
                        THEN 1 ELSE -1 END) AS x
        FROM (SELECT md5('f2|' || k) AS h FROM ks) hs,
             (SELECT unnest(generate_series(0, 15)) AS e) es
        GROUP BY e),
      g AS (
        SELECT e // 4 AS g, sum(x * x) // 4 AS mean_sq
        FROM est GROUP BY 1),
      med AS (
        SELECT mean_sq AS f2_est FROM (
          SELECT mean_sq, row_number() OVER (ORDER BY mean_sq, g) AS rn
          FROM g) WHERE rn = 2),
      tru AS (
        SELECT sum(c * c) AS f2_true FROM (
          SELECT k, count(*) AS c FROM ks GROUP BY 1))
      SELECT CAST(e AS BIGINT) AS estimator, CAST(x AS BIGINT) AS x_sign_sum,
             CAST(x * x AS BIGINT) AS sq, CAST(f2_est AS BIGINT) AS f2_est,
             CAST(f2_true AS BIGINT) AS f2_true,
             CAST(((f2_est - f2_true) * 1000000) // f2_true AS BIGINT)
               AS err_micro
      FROM est, med, tru ORDER BY estimator
    """,

    "p_histogram_join_estimate" -> """
      WITH ok AS (SELECT o_orderkey AS k FROM orders),
      lk AS (SELECT l_orderkey AS k FROM lineitem),
      w AS (
        SELECT greatest((SELECT max(k) FROM ok), (SELECT max(k) FROM lk))
                 // 32 + 1 AS w),
      h1 AS (
        SELECT k // w AS bucket, count(*) AS n1, count(DISTINCT k) AS d1
        FROM ok, w GROUP BY 1),
      h2 AS (
        SELECT k // w AS bucket, count(*) AS n2, count(DISTINCT k) AS d2
        FROM lk, w GROUP BY 1),
      h AS (
        SELECT coalesce(h1.bucket, h2.bucket) AS bucket,
               coalesce(n1, 0) AS n1, coalesce(d1, 0) AS d1,
               coalesce(n2, 0) AS n2, coalesce(d2, 0) AS d2,
               (coalesce(n1, 0) * coalesce(n2, 0))
                 // greatest(greatest(coalesce(d1, 0), coalesce(d2, 0)), 1)
                 AS est_b
        FROM h1 FULL OUTER JOIN h2 ON h2.bucket = h1.bucket),
      tot AS (SELECT sum(est_b) AS est_total FROM h),
      tru AS (
        SELECT sum(c1 * c2) AS truth FROM
          (SELECT k, count(*) AS c1 FROM ok GROUP BY 1) a
          JOIN (SELECT k, count(*) AS c2 FROM lk GROUP BY 1) b USING (k))
      SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n1 AS BIGINT) AS n1,
             CAST(d1 AS BIGINT) AS d1, CAST(n2 AS BIGINT) AS n2,
             CAST(d2 AS BIGINT) AS d2, CAST(est_b AS BIGINT) AS est_b,
             CAST(est_total AS BIGINT) AS est_total,
             CAST(truth AS BIGINT) AS truth,
             CAST(((est_total - truth) * 1000000) // truth AS BIGINT)
               AS err_micro
      FROM h, tot, tru ORDER BY bucket
    """,

    "p_fd_audit" -> """
      SELECT p_name, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands,
             min(p_brand) AS brand_min, max(p_brand) AS brand_max
      FROM part
      GROUP BY p_name
      HAVING count(DISTINCT p_brand) > 1
      ORDER BY p_name
    """,

    "p_kanonymity" -> """
      WITH cell AS (
        SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS order_month,
               o_orderstatus, o_custkey, count(*) AS cnt
        FROM orders GROUP BY 1, 2, 3, 4)
      SELECT o_orderpriority, order_month, o_orderstatus,
             CAST(sum(cnt) AS BIGINT) AS group_n,
             CAST(count(*) AS BIGINT) AS l_distinct,
             floor(CAST(max(cnt) AS DOUBLE) / sum(cnt) * 1000000.0 + 0.5)
               / 1000000.0 AS max_share,
             (sum(cnt) < 5) AS k_violation,
             (count(*) < 3) AS l_violation
      FROM cell
      GROUP BY 1, 2, 3
      HAVING sum(cnt) < 5 OR count(*) < 3
      ORDER BY 1, 2, 3
    """,

    // k=4 unrolled DP layers + scalar-subquery backtrack; seg/layer
    // CTEs MATERIALIZED (each feeds the next layer AND the report).
    "p_jenks_breaks" -> {
      val layers = (2 to 4).map { m =>
        s"""l$m AS MATERIALIZED (
        SELECT jj AS j, d, bi FROM (
          SELECT sg.jj, lp.d + sg.sse AS d, sg.ii AS bi,
                 row_number() OVER (PARTITION BY sg.jj
                   ORDER BY lp.d + sg.sse, sg.ii) AS rn
          FROM seg sg JOIN l${m - 1} lp ON lp.j = sg.ii - 1
          WHERE sg.ii >= $m)
        WHERE rn = 1)"""
      }.mkString(",\n      ")
      s"""
      WITH hist AS (
        SELECT (cstop * 1000) // n AS v, count(*) AS c FROM (
          SELECT len(string_split(text, ' ')) AS n,
                 len(list_filter(string_split(text, ' '),
                   w -> w IN ('the', 'a', 'of', 'to', 'and'))) AS cstop
          FROM documents)
        WHERE n > 0 GROUP BY 1),
      pre AS MATERIALIZED (
        SELECT v, row_number() OVER (ORDER BY v) AS i,
               sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pn,
               sum(c * v) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps,
               sum(c * v * v) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps2
        FROM hist),
      pre0 AS (
        SELECT i + 1 AS ii, pn AS n0, ps AS s0, ps2 AS s20 FROM pre
        UNION ALL
        SELECT 1, 0, 0, 0),
      seg AS MATERIALIZED (
        SELECT p0.ii, p.i AS jj, p.pn - p0.n0 AS n, p.ps - p0.s0 AS s,
               ((p.pn - p0.n0) * (p.ps2 - p0.s20)
                 - (p.ps - p0.s0) * (p.ps - p0.s0)) * 1000000
                 // (p.pn - p0.n0) AS sse
        FROM pre p JOIN pre0 p0 ON p0.ii <= p.i),
      l1 AS MATERIALIZED (
        SELECT jj AS j, sse AS d, 1 AS bi FROM seg WHERE ii = 1),
      $layers,
      b4 AS (SELECT 4 AS class, bi AS ii, j AS jj FROM l4
             WHERE j = (SELECT max(i) FROM pre)),
      b3 AS (SELECT 3 AS class, bi AS ii, j AS jj FROM l3
             WHERE j = (SELECT ii - 1 FROM b4)),
      b2 AS (SELECT 2 AS class, bi AS ii, j AS jj FROM l2
             WHERE j = (SELECT ii - 1 FROM b3)),
      b1 AS (SELECT 1 AS class, bi AS ii, j AS jj FROM l1
             WHERE j = (SELECT ii - 1 FROM b2)),
      rows AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2
               UNION ALL SELECT * FROM b3 UNION ALL SELECT * FROM b4)
      SELECT r.class, plo.v AS v_lo, phi.v AS v_hi,
             CAST(sg.n AS BIGINT) AS n,
             CAST((sg.s * 1000000) // sg.n AS BIGINT) AS mean_micro,
             CAST(sg.sse AS BIGINT) AS sse_micro
      FROM rows r
      JOIN seg sg ON sg.ii = r.ii AND sg.jj = r.jj
      JOIN pre plo ON plo.i = r.ii
      JOIN pre phi ON phi.i = r.jj
      ORDER BY class
    """
    },

    "p_ransac" -> """
      WITH p AS (
        SELECT o_orderkey AS k, CAST(o_orderkey % 1000 AS BIGINT) AS x,
               CAST(o_orderkey % 1000 AS BIGINT) * 3 + 40
                 + (CAST('0x' || substr(md5('rn|'
                      || CAST(o_orderkey AS VARCHAR)), 1, 4) AS BIGINT)
                    % 101 - 50)
                 + (CASE WHEN CAST('0x' || substr(md5('ro|'
                      || CAST(o_orderkey AS VARCHAR)), 1, 4) AS BIGINT)
                      % 5 = 0 THEN 8000 ELSE 0 END) AS y
        FROM orders),
      sel AS (
        SELECT k, x, y, rn FROM (
          SELECT k, x, y, row_number() OVER (ORDER BY h, k) AS rn FROM (
            SELECT k, x, y,
                   CAST('0x' || substr(md5('rc|' || CAST(k AS VARCHAR)),
                     1, 15) AS BIGINT) AS h
            FROM p))
        WHERE rn <= 64),
      cands AS MATERIALIZED (
        SELECT (rn - 1) // 2 AS cand_id,
               max(CASE WHEN rn % 2 = 1 THEN x END) AS x1,
               max(CASE WHEN rn % 2 = 1 THEN y END) AS y1,
               max(CASE WHEN rn % 2 = 0 THEN x END) AS x2,
               max(CASE WHEN rn % 2 = 0 THEN y END) AS y2
        FROM sel GROUP BY 1
        HAVING max(CASE WHEN rn % 2 = 1 THEN x END)
               <> max(CASE WHEN rn % 2 = 0 THEN x END)),
      counts AS (
        SELECT c.cand_id, count(*) AS n
        FROM p, cands c
        WHERE abs((p.y - c.y1) * (c.x2 - c.x1)
                  - (p.x - c.x1) * (c.y2 - c.y1))
              <= 100 * abs(c.x2 - c.x1)
        GROUP BY 1),
      scored AS MATERIALIZED (
        SELECT c.cand_id, c.x1, c.y1, c.x2, c.y2,
               coalesce(n.n, 0) AS n_inliers
        FROM cands c LEFT JOIN counts n USING (cand_id)),
      b AS (
        SELECT n_inliers AS bn, cand_id AS bc FROM scored
        ORDER BY n_inliers DESC, cand_id LIMIT 1)
      SELECT s.cand_id, s.x1, s.y1, s.x2, s.y2,
             CAST(s.n_inliers AS BIGINT) AS n_inliers,
             (s.n_inliers = b.bn AND s.cand_id = b.bc) AS is_best
      FROM scored s, b
      ORDER BY cand_id
    """,

    "p_tcloseness" -> """
      WITH cells AS (
        SELECT o_orderpriority AS prio, o_orderstatus AS status,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 6000000
                 AS band,
               count(*) AS cnt
        FROM orders GROUP BY 1, 2, 3),
      g AS (SELECT band, sum(cnt) AS gc FROM cells GROUP BY band),
      tot AS (SELECT sum(gc) AS n, count(*) AS m FROM g),
      cls AS (SELECT prio, status, sum(cnt) AS nc FROM cells
              GROUP BY 1, 2),
      grid AS (
        SELECT c.prio, c.status, c.nc, g.band, g.gc,
               coalesce(ce.cnt, 0) AS cnt
        FROM cls c CROSS JOIN g
        LEFT JOIN cells ce ON ce.prio = c.prio AND ce.status = c.status
                          AND ce.band = g.band),
      pre AS (
        SELECT prio, status, nc, tt.n, tt.m,
               abs(sum(cnt * tt.n - gc * nc) OVER (
                 PARTITION BY prio, status ORDER BY band
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 AS absd
        FROM grid, tot AS tt),
      agg AS (
        SELECT prio, status, nc, n, m, sum(absd) AS emd_num
        FROM pre GROUP BY 1, 2, 3, 4, 5),
      fin AS (
        SELECT prio, status, nc, emd_num,
               CASE WHEN m <= 1 THEN 0.0
                    ELSE floor(CAST(emd_num AS DOUBLE)
                           / CAST((m - 1) * nc * n AS DOUBLE)
                           * 1000000.0 + 0.5) / 1000000.0 END AS t
        FROM agg)
      SELECT prio AS o_orderpriority, status AS o_orderstatus,
             CAST(nc AS BIGINT) AS group_n,
             CAST(emd_num AS BIGINT) AS emd_num,
             t, (t > 0.05) AS t_violation
      FROM fin
      ORDER BY 1, 2
    """,

    // unrolled 8-round Mondrian replay; every CTE is MATERIALIZED
    // (round CTEs are referenced twice — the inlining gotcha)
    "p_mondrian" -> {
      val depth = 8; val k = 50
      val rounds = (0 until depth).map { r =>
        val (attr, w) = if (r % 2 == 0) ("a1", 500000L) else ("a2", 30L)
        s"""
      b$r AS MATERIALIZED (
        SELECT a1, a2, region, $attr // $w AS b FROM r$r),
      d$r AS MATERIALIZED (
        SELECT region, b AS bcut, (cum >= $k AND tot - cum >= $k) AS docut
        FROM (
          SELECT region, b, cum, tot,
                 row_number() OVER (PARTITION BY region ORDER BY b) AS rn
          FROM (
            SELECT region, b,
                   sum(n) OVER (PARTITION BY region ORDER BY b) AS cum,
                   sum(n) OVER (PARTITION BY region) AS tot
            FROM (SELECT region, b, count(*) AS n FROM b$r GROUP BY 1, 2))
          WHERE 2 * cum >= tot)
        WHERE rn = 1),
      r${r + 1} AS MATERIALIZED (
        SELECT x.a1, x.a2,
               CASE WHEN d.docut AND x.b > d.bcut THEN x.region * 2 + 1
                    ELSE x.region * 2 END AS region
        FROM b$r x JOIN d$r d USING (region))"""
      }.mkString(",")
      s"""
      WITH r0 AS MATERIALIZED (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS a1,
               CAST(date_diff('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) AS BIGINT) AS a2,
               CAST(0 AS BIGINT) AS region
        FROM orders),$rounds
      SELECT min(a1) AS price_lo, max(a1) AS price_hi,
             min(a2) AS day_lo, max(a2) AS day_hi,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM r$depth GROUP BY region
      ORDER BY 1, 2, 3, 4, 5
    """
    },

    "p_histogram_stats" -> {
      val cases = (1 to 7).map(i =>
        s"(CASE WHEN CAST(c AS DOUBLE) > qs[$i] THEN 1 ELSE 0 END)")
        .mkString(" + ")
      val values = Seq(
        (1, 100000L, 500000L), (2, 500000L, 1500000L),
        (3, 1500000L, 3000000L), (4, 3000000L, 6000000L),
        (5, 6000000L, 9000000L), (6, 9000000L, 10500000L),
        (7, 2000000L, 2100000L), (8, 0L, 20000000L))
        .map { case (i, a, b) =>
          s"($i, CAST($a AS BIGINT), CAST($b AS BIGINT))" }
        .mkString(", ")
      s"""
      WITH li AS (
        SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        FROM lineitem),
      q AS (SELECT quantile_cont(c, [0.125, 0.25, 0.375, 0.5,
                                     0.625, 0.75, 0.875]) AS qs FROM li),
      hist AS (
        SELECT b, count(*) AS nb, min(c) AS lo, max(c) AS hi
        FROM (SELECT c, ($cases) AS b FROM li, q) GROUP BY 1),
      panel(pred_id, lo_pred, hi_pred) AS (VALUES $values),
      est AS (
        SELECT pred_id, lo_pred, hi_pred,
               CAST(sum((nb * 1000000 // (hi - lo + 1))
                 * greatest(0, least(hi, hi_pred) - greatest(lo, lo_pred) + 1))
                 AS BIGINT) AS est_rows_e6
        FROM panel, hist GROUP BY 1, 2, 3),
      ex AS (SELECT pred_id, count(*) AS exact_rows
             FROM li JOIN panel ON c BETWEEN lo_pred AND hi_pred
             GROUP BY 1)
      SELECT est.pred_id, est.lo_pred, est.hi_pred, est.est_rows_e6,
             CAST(coalesce(ex.exact_rows, 0) AS BIGINT) AS exact_rows,
             est.est_rows_e6 - CAST(coalesce(ex.exact_rows, 0) AS BIGINT)
               * 1000000 AS err_e6
      FROM est LEFT JOIN ex USING (pred_id)
      ORDER BY est.pred_id
    """
    },

    "p_profile" -> s"""
      WITH a AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               ${Seq("l_orderkey", "l_partkey", "l_suppkey",
                     "l_linenumber", "l_returnflag", "l_linestatus").map(c =>
                 s"""CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_nulls,
               CAST(count(DISTINCT $c) AS BIGINT) AS ${c}_distinct,
               CAST(min($c) AS VARCHAR) AS ${c}_min,
               CAST(max($c) AS VARCHAR) AS ${c}_max""").mkString(",\n               ")}
        FROM lineitem)
      ${Seq("l_orderkey", "l_partkey", "l_suppkey",
            "l_linenumber", "l_returnflag", "l_linestatus").map(c =>
        s"""SELECT '$c' AS column_name, n_rows, ${c}_nulls AS n_nulls,
               ${c}_distinct AS n_distinct, ${c}_min AS min_val, ${c}_max AS max_val
        FROM a""").mkString("\n      UNION ALL\n      ")}
      ORDER BY column_name
    """,

    // DuckDB replay of the engine-independent sketches (see the query's
    // design comment): KMV = DISTINCT hash → ORDER BY → LIMIT k; quantile
    // sample = the 1024 rows with the smallest row hashes (ties → smallest
    // value, matching topk_by_long's ord-then-payload contract), exact
    // rank rule s[⌊(n−1)·q⌋] over the sorted sample. Every arithmetic step
    // mirrors the Spark expression bit-for-bit (same 60-bit md5 prefix,
    // same DOUBLE casts, same floor), so the values hash-match.
    "p_profile_approx" -> {
      val intCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      val strCols = Seq("l_returnflag", "l_linestatus")
      val cols = intCols ++ strCols
      val rh = "CAST('0x' || substr(md5('smp|' || CAST(l_orderkey AS VARCHAR) || '|' || " +
        "CAST(l_linenumber AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR) || '|' || " +
        "CAST(l_suppkey AS VARCHAR)), 1, 15) AS BIGINT)"
      def kmvCte(c: String) =
        s"""kmv_$c AS (
        SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS BIGINT)
               ELSE CAST(least(floor(CAST(255 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                               / CAST(max(h) AS DOUBLE)), CAST(4611686018427387904 AS DOUBLE)) AS BIGINT) END AS ndv
        FROM (SELECT h FROM (
                SELECT DISTINCT CAST('0x' || substr(md5('kmv|' || CAST($c AS VARCHAR)), 1, 15) AS BIGINT) AS h
                FROM lineitem WHERE $c IS NOT NULL)
              ORDER BY h LIMIT 256))"""
      def smpCte(c: String) =
        s"""smp_$c AS (
        SELECT list_sort(list(v)) AS vals FROM (
          SELECT CAST($c AS BIGINT) AS v, $rh AS rh
          FROM lineitem WHERE $c IS NOT NULL
          ORDER BY rh, v LIMIT 1024)),
      q_$c AS (
        SELECT CAST(vals[CAST(floor(CAST(len(vals) - 1 AS DOUBLE) * 0.5) AS INT) + 1] AS DOUBLE) AS med,
               CAST(vals[CAST(floor(CAST(len(vals) - 1 AS DOUBLE) * 0.95) AS INT) + 1] AS DOUBLE) AS p95
        FROM smp_$c)"""
      def row(c: String) = {
        val (med, p95) =
          if (intCols.contains(c))
            (s"(SELECT med FROM q_$c)", s"(SELECT p95 FROM q_$c)")
          else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
        s"""SELECT '$c' AS column_name, n_rows, ${c}_nulls AS n_nulls,
             (SELECT ndv FROM kmv_$c) AS n_distinct_approx,
             ${c}_min AS min_val, ${c}_max AS max_val,
             $med AS med_approx, $p95 AS p95_approx
        FROM exact"""
      }
      s"""
      WITH exact AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               ${cols.map(c =>
                 s"""CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_nulls,
               CAST(min($c) AS VARCHAR) AS ${c}_min,
               CAST(max($c) AS VARCHAR) AS ${c}_max""").mkString(",\n               ")}
        FROM lineitem),
      ${cols.map(kmvCte).mkString(",\n      ")},
      ${intCols.map(smpCte).mkString(",\n      ")}
      ${cols.map(row).mkString("\n      UNION ALL\n      ")}
      ORDER BY column_name
    """
    },

    "j5_shipping_priority" -> """
      SELECT l_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             o_orderpriority,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-01'
        AND l_shipdate > TIMESTAMP '1998-06-01'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10
    """,

    "q5_above_avg" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) *
            (SELECT count(*) FROM orders) >
            (SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) FROM orders)
      ORDER BY o_orderkey
    """,

    "q6_sql_surface" -> """
      WITH revenue AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem WHERE l_quantity > 10)
      SELECT l_returnflag, sum(cents) / CAST(100 AS DOUBLE) AS revenue, count(*) AS n
      FROM revenue GROUP BY l_returnflag ORDER BY l_returnflag
    """,

    "agg_rollup_revenue" -> """
      SELECT n_name,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS yr,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY ROLLUP(n_name, CAST(EXTRACT(year FROM l_shipdate) AS INT))
      ORDER BY n_name NULLS FIRST, yr NULLS FIRST
    """,

    "agg_cube_pricing" -> """
      SELECT l_returnflag, l_linestatus,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             count(*) AS n_items
      FROM lineitem
      GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,

    "m6_merge_upsert" -> s"""
      WITH $custChangesSql
      SELECT coalesce(base.c_custkey, ch.c_custkey) AS c_custkey,
             CASE WHEN ch.op IN ('U', 'I') THEN ch.new_name
                  ELSE base.c_name END AS c_name,
             CASE WHEN ch.op IN ('U', 'I') THEN ch.new_nationkey
                  ELSE base.c_nationkey END AS c_nationkey,
             coalesce(ch.op, '=') AS op
      FROM base FULL OUTER JOIN ch ON base.c_custkey = ch.c_custkey
      WHERE ch.op IS NULL OR ch.op <> 'D'
      ORDER BY c_custkey
    """,

    "m7_scd2_history" -> s"""
      WITH $custChangesSql
      SELECT base.c_custkey, base.c_name, base.c_nationkey,
             '2024-01-01' AS valid_from,
             CASE WHEN ch.op IN ('U', 'D') THEN '2024-06-01'
                  ELSE CAST(NULL AS VARCHAR) END AS valid_to,
             (ch.op IS NULL) AS is_current
      FROM base LEFT JOIN ch ON base.c_custkey = ch.c_custkey
      UNION ALL
      SELECT c_custkey, new_name AS c_name, new_nationkey AS c_nationkey,
             '2024-06-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
             TRUE AS is_current
      FROM ch WHERE op IN ('U', 'I')
      ORDER BY c_custkey, valid_from
    """,

    "m5_intersect_except" -> """
      SELECT k, 'both' AS tag FROM (
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
      UNION ALL
      SELECT k, 'only_big' AS tag FROM (
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000
        EXCEPT
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
      ORDER BY k, tag
    """,

    "p_pivot" -> """
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             sum(CASE WHEN o_orderstatus = 'F'
                 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END) / 100.0 AS "F",
             sum(CASE WHEN o_orderstatus = 'O'
                 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END) / 100.0 AS "O",
             sum(CASE WHEN o_orderstatus = 'P'
                 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END) / 100.0 AS "P"
      FROM orders GROUP BY 1 ORDER BY 1
    """,

    "j4_asof_join" -> """
      WITH ev AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side,
               CASE WHEN event_type = 'purchase' THEN ts END AS pts,
               CASE WHEN event_type = 'purchase' THEN event_id END AS pid
        FROM events WHERE event_type IN ('click', 'purchase')),
      marked AS (
        SELECT *,
               last_value(pts IGNORE NULLS) OVER w AS last_purchase_ts,
               last_value(pid IGNORE NULLS) OVER w AS last_purchase_id
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS UNBOUNDED PRECEDING))
      SELECT user_id, event_id AS click_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
             strftime(last_purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             last_purchase_id AS purchase_id
      FROM marked WHERE event_type = 'click'
      ORDER BY click_id
    """,

    "j3_topk_orders_per_customer" -> """
      SELECT c_custkey, c_name, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) o
      JOIN customer ON o.o_custkey = c_custkey
      WHERE rn <= 3 ORDER BY c_custkey, rn
    """,

    "p_window_analytics" -> """
      SELECT o_custkey, o_orderkey,
             CAST(o_orderdate AS VARCHAR) AS order_date,
             CAST(lag(o_orderdate) OVER w AS VARCHAR) AS prev_date,
             CAST(lead(o_orderdate) OVER w AS VARCHAR) AS next_date,
             date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days,
             CAST(sum(cents) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
             row_number() OVER w AS rn
      FROM (SELECT *, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders)
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, rn
    """,

    // Brute-force ground truth: the FULL multiset diff (per-content
    // copy counts via the same 60-bit md5 digest), no bucket pruning —
    // proves the Merkle drill-down path returns exactly the true diff.
    "k8_merkle_diff" -> """
      WITH canon AS (
        SELECT l_orderkey, l_linenumber,
               CAST('0x' || substr(md5(concat_ws('|',
                 coalesce(CAST(l_orderkey AS VARCHAR), '~'),
                 coalesce(CAST(l_partkey AS VARCHAR), '~'),
                 coalesce(CAST(l_suppkey AS VARCHAR), '~'),
                 coalesce(CAST(l_linenumber AS VARCHAR), '~'),
                 coalesce(CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS VARCHAR), '~'),
                 coalesce(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS VARCHAR), '~'),
                 coalesce(CAST(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS VARCHAR), '~'),
                 coalesce(CAST(CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS VARCHAR), '~'),
                 coalesce(l_returnflag, '~'),
                 coalesce(l_linestatus, '~'),
                 coalesce(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'), '~')
               )), 1, 15) AS BIGINT) AS h
        FROM lineitem),
      base AS (
        SELECT h % 64 AS bucket, h, l_orderkey, l_linenumber,
               CAST(count(*) AS BIGINT) AS n_base
        FROM canon GROUP BY 1, 2, 3, 4),
      othercanon AS (
        SELECT l_orderkey, l_linenumber,
               CAST('0x' || substr(md5(concat_ws('|',
                 coalesce(CAST(l_orderkey AS VARCHAR), '~'),
                 coalesce(CAST(l_partkey AS VARCHAR), '~'),
                 coalesce(CAST(l_suppkey AS VARCHAR), '~'),
                 coalesce(CAST(l_linenumber AS VARCHAR), '~'),
                 coalesce(CAST(CAST(floor(
                   (CASE WHEN l_orderkey % 997 = 0 THEN l_quantity + 1
                         ELSE l_quantity END) * 100 + 0.5) AS BIGINT) AS VARCHAR), '~'),
                 coalesce(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS VARCHAR), '~'),
                 coalesce(CAST(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS VARCHAR), '~'),
                 coalesce(CAST(CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS VARCHAR), '~'),
                 coalesce(l_returnflag, '~'),
                 coalesce(l_linestatus, '~'),
                 coalesce(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'), '~')
               )), 1, 15) AS BIGINT) AS h
        FROM lineitem WHERE l_orderkey % 991 <> 0),
      oth AS (
        SELECT h % 64 AS bucket, h, l_orderkey, l_linenumber,
               CAST(count(*) AS BIGINT) AS n_other
        FROM othercanon GROUP BY 1, 2, 3, 4)
      SELECT coalesce(base.bucket, oth.bucket) AS bucket,
             coalesce(base.l_orderkey, oth.l_orderkey) AS l_orderkey,
             coalesce(base.l_linenumber, oth.l_linenumber) AS l_linenumber,
             coalesce(n_base, 0) AS n_base,
             coalesce(n_other, 0) AS n_other
      FROM base FULL OUTER JOIN oth
        ON base.bucket = oth.bucket AND base.h = oth.h
      WHERE coalesce(n_base, 0) <> coalesce(n_other, 0)
      ORDER BY bucket, l_orderkey, l_linenumber, n_base
    """,

    "k7_gzip_csv_roundtrip" -> """
      SELECT doc_id, text, lang, source
      FROM read_csv('/tmp/graft_k7_out/__SF__/*.csv.gz',
        header=true,
        columns={doc_id: 'BIGINT', text: 'VARCHAR',
                 lang: 'VARCHAR', source: 'VARCHAR'})
      ORDER BY doc_id
    """,

    "k9_sorted_export" -> """
      WITH pf AS (
        SELECT filename AS f, CAST(count(*) AS BIGINT) AS n_rows,
               min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        FROM read_parquet('/tmp/graft_k9_out/__SF__/*.parquet',
                          filename=true)
        GROUP BY filename)
      SELECT CAST(row_number() OVER (ORDER BY min_key) AS INT) AS file_rank,
             n_rows, min_key, max_key,
             CAST(CASE WHEN lag(max_key) OVER (ORDER BY min_key) IS NULL
                         OR min_key > lag(max_key) OVER (ORDER BY min_key)
                       THEN 1 ELSE 0 END AS INT) AS gap_ok
      FROM pf
      ORDER BY file_rank
    """,

    "k14_deletion_vectors" -> """
      SELECT source, CAST(count(*) AS BIGINT) AS n_base,
             CAST(sum(CASE WHEN doc_id % 7 = 0 OR doc_id % 11 = 3
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
             CAST(sum(CASE WHEN doc_id % 7 = 0 OR doc_id % 11 = 3
                           THEN 0 ELSE 1 END) AS BIGINT) AS n_live
      FROM documents GROUP BY source ORDER BY source
    """,

    // Width/height re-derived from the PNG CONTAINER (IHDR bytes 17-24,
    // big-endian, read as hex digits) — the Spark side gets them from
    // the REAL codec's decoded pixels, so the hash match proves a real
    // decode ran and agreed with the container metadata.
    "k17_video_frames" -> """
      WITH RECURSIVE raw AS (
        SELECT clip_id, hex(payload) AS hx, octet_length(payload) AS nb
        FROM read_parquet('/tmp/graft_k17/__SF__/*.parquet')),
      fr AS (
        SELECT clip_id, 0 AS frame_no, 0 AS off,
               CAST(list_sum(list_transform(range(8), i ->
                 (strpos('0123456789ABCDEF', substr(hx, 1 + i, 1)) - 1)
                   * 16 ** (7 - i))) AS BIGINT) AS flen,
               hx, nb
        FROM raw
        UNION ALL
        SELECT clip_id, frame_no + 1, off + 4 + flen,
               CAST(list_sum(list_transform(range(8), i ->
                 (strpos('0123456789ABCDEF',
                    substr(hx, (off + 4 + flen) * 2 + 1 + i, 1)) - 1)
                   * 16 ** (7 - i))) AS BIGINT),
               hx, nb
        FROM fr WHERE off + 4 + flen + 4 <= nb),
      meta AS (
        -- mirror the Spark walker's stop condition: a frame row exists
        -- only when the DECLARED DATA also fits (off + 4 + flen <= nb),
        -- not merely the next 4-byte header — otherwise a truncated
        -- container would emit a garbage row the walker never produces
        SELECT clip_id, frame_no, flen AS n_bytes,
               CAST(list_sum(list_transform(range(8), i ->
                 (strpos('0123456789ABCDEF',
                    substr(hx, (off + 4 + 16) * 2 + 1 + i, 1)) - 1)
                   * 16 ** (7 - i))) AS BIGINT) AS width,
               CAST(list_sum(list_transform(range(8), i ->
                 (strpos('0123456789ABCDEF',
                    substr(hx, (off + 4 + 20) * 2 + 1 + i, 1)) - 1)
                   * 16 ** (7 - i))) AS BIGINT) AS height,
               md5(substr(hx, (off + 4) * 2 + 1, flen * 2)) AS frame_md5
        FROM fr WHERE off + 4 + flen <= nb)
      SELECT clip_id, CAST(frame_no AS BIGINT) AS frame_no, n_bytes,
             width, height, frame_md5
      FROM meta
      ORDER BY clip_id, frame_no
    """,

    "k16_audio_energy" -> """
      WITH raw AS (
        SELECT clip_id, hex(payload) AS hx,
               octet_length(payload) // 2 AS ns
        FROM read_parquet('/tmp/graft_k16/__SF__/*.parquet')),
      vals AS (
        SELECT clip_id,
               list_transform(range(ns), i ->
                 (strpos('0123456789ABCDEF', substr(hx, 4*i + 1, 1)) - 1)
                   * 16
                 + (strpos('0123456789ABCDEF', substr(hx, 4*i + 2, 1)) - 1)
                 + 256 * (
                   (strpos('0123456789ABCDEF', substr(hx, 4*i + 3, 1)) - 1)
                     * 16
                   + (strpos('0123456789ABCDEF', substr(hx, 4*i + 4, 1))
                      - 1))) AS raws
        FROM raw),
      s AS (
        SELECT clip_id, generate_subscripts(raws, 1) - 1 AS idx,
               unnest(raws) AS r
        FROM vals),
      v AS (
        SELECT clip_id, idx // 256 AS frame_no,
               CASE WHEN r >= 32768 THEN r - 65536 ELSE r END AS v
        FROM s)
      SELECT clip_id, CAST(frame_no AS BIGINT) AS frame_no,
             CAST(count(*) AS BIGINT) AS n_samples,
             CAST(sum(v * v) AS BIGINT) AS ssq,
             CAST(max(abs(v)) AS BIGINT) AS peak,
             max(abs(v)) = 0 AS silent
      FROM v GROUP BY 1, 2
      ORDER BY clip_id, frame_no
    """,

    "k15_image_decode" -> """
      SELECT doc_id,
             CAST(octet_length(payload) AS BIGINT) AS n_bytes,
             md5(hex(payload)) AS payload_md5,
             substr(hex(payload), 1, 16) = '89504E470D0A1A0A' AS magic_ok,
             CAST(list_sum(list_transform(range(8), i ->
               (strpos('0123456789ABCDEF',
                  substr(hex(payload), 33 + i, 1)) - 1) * 16 ** (7 - i)))
               AS BIGINT) AS width,
             CAST(list_sum(list_transform(range(8), i ->
               (strpos('0123456789ABCDEF',
                  substr(hex(payload), 41 + i, 1)) - 1) * 16 ** (7 - i)))
               AS BIGINT) AS height
      FROM read_parquet('/tmp/graft_k15/__SF__/*.parquet')
      ORDER BY doc_id
    """,

    "k6_compaction_exec" -> """
      SELECT source, CAST(out_file AS BIGINT) AS out_file,
             CAST(count(*) AS BIGINT) AS n_inputs,
             CAST(sum(n_chars) AS BIGINT) AS out_bytes,
             min(doc_id) AS first_file, max(doc_id) AS last_file
      FROM read_parquet('/tmp/graft_k6_out/__SF__/*/*/*.parquet',
                        hive_partitioning=true)
      GROUP BY source, CAST(out_file AS BIGINT)
      ORDER BY source, out_file
    """,

    "k5_jsonl_roundtrip" -> """
      SELECT doc_id, text, lang, source
      FROM read_json('/tmp/graft_jsonl_out/__SF__/*.json',
        format='newline_delimited',
        columns={doc_id: 'BIGINT', text: 'VARCHAR',
                 lang: 'VARCHAR', source: 'VARCHAR'})
      ORDER BY doc_id
    """,

    // The bucketed-join result must equal the same join computed from
    // the original parquet — bucketing is a layout choice, never a
    // semantics one.
    "k12_bucketed_join" -> """
      SELECT d.source, CAST(e.label AS INT) AS label,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      GROUP BY 1, 2
      ORDER BY 1, 2
    """,

    // Fidelity oracle from the ORIGINAL parquet (DuckDB cannot read
    // ORC): identical filter + per-source counts and row-hash checksum.
    // DuckDB reads the SAME written part files: RFC doubled quotes,
    // embedded newlines and preserved whitespace must all agree.
    "k13_csv_dialect" -> {
      val out = "/tmp/graft_k13_out/__SF__/dialect"
      s"""
      SELECT CAST(doc_id AS BIGINT) AS doc_id, tricky
      FROM read_csv('$out/*.csv', header=true, all_varchar=true)
      ORDER BY doc_id
    """
    },

    "k11_orc_roundtrip" -> """
      SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(sum(CAST('0x' || substr(md5(
               concat_ws('|', doc_id, text, lang, source, n_chars)),
               1, 12) AS BIGINT)) AS BIGINT) AS content_sum
      FROM documents
      WHERE n_chars >= 50
      GROUP BY source
      ORDER BY source
    """,

    "k4_schema_evolution" -> """
      SELECT c_custkey, c_name, acct_cents, segment
      FROM read_parquet(
        ['/tmp/graft_k4_out/__SF__/v1/*.parquet',
         '/tmp/graft_k4_out/__SF__/v2/*.parquet'],
        union_by_name=true)
      ORDER BY c_custkey
    """
  )
}
