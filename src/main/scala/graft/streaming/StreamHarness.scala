package graft.streaming

import java.io.File
import java.nio.file.{Files, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Deterministic file-replay harness: stages a sequence of DataFrames as
  * ONE parquet file each, so the FileStreamSource (with
  * `maxFilesPerTrigger = 1`) replays them as micro-batches in a known
  * order, then runs a streaming transform over the replay to completion
  * and leaves the sink output on disk.
  *
  * This is the bridge that upgrades the streaming operators from
  * MemoryStream unit proofs to DuckDB-oracle CORRECTNESS rows: the
  * staged batches derive from the sf parquet tables (so the oracle can
  * recompute the expected result in SQL from the same inputs), the
  * stream executes under the REAL Structured Streaming runtime —
  * watermarks advance batch by batch, state evicts, event-time timeouts
  * fire — and the written output is then hash-compared against the
  * batch semantics. No driver-side data: staging is a filtered write
  * per batch, never a collect.
  *
  * Ordering guarantee: the source processes new files in (modification
  * time, path) order, so each staged file gets BOTH an ascending name
  * (`b00000.parquet`, `b00001.parquet`, …) and an explicitly ascending
  * mtime — the replay order is the staging order on any filesystem.
  *
  * Sentinel batches: append-mode window finalization and event-time
  * timeouts fire while processing a LATER batch whose watermark has
  * advanced. A replay that needs total flush appends two far-future
  * sentinel batches: the first advances the watermark past every real
  * event, the second executes with that watermark so every remaining
  * timer fires (emissions land inside a DATA batch, which
  * `processAllAvailable()` is guaranteed to wait for — no reliance on
  * the engine scheduling a no-data batch). Sentinel keys are filtered
  * out at readback.
  */
object StreamHarness {

  /** Replay-sized shuffle/state partitioning. Every micro-batch commits
    * EVERY state-store partition of every stateful operator (a
    * stream-stream join carries four stores per partition), so a replay
    * pays fixed per-partition-per-batch commit overhead that dwarfs the
    * actual data movement at harness scale — 32 partitions × 8 batches
    * × 4 stores ≈ 1000 commits for a join whose total input fits in one
    * task. 4 is sized to the replay volume (measured r10: halving from
    * 8 cut the stream suite's commit overhead with identical hashes); a
    * production deployment sizes this to the cluster instead. Safe to
    * vary because every operator's results are partition-count-invariant
    * — the property the ops' determinism rules (integer accumulation,
    * event-time keys) exist to guarantee, and which the oracle gate
    * re-proves on every run of this harness.
    */
  private val replayShufflePartitions = "4"

  private def withReplayConf[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, replayShufflePartitions)
    try body finally spark.conf.set(key, prev)
  }

  /** In-JVM staging cache: `stageCached` callers' staged input is a pure
    * function of the target directory (sf tables + deterministic batch
    * derivation), so within one JVM a second staging of the same dir
    * (bench reps, Verify re-runs) is a no-op. Cross-JVM runs always
    * restage — no stale-file risk.
    */
  private val stagedDirs =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  /** [[stage]], skipping the write when this JVM already staged `inDir`.
    * Only for callers whose batches derive deterministically from
    * `inDir` itself (the StreamSurface queries); tests use [[stage]].
    */
  def stageCached(batches: => Seq[DataFrame], inDir: String): StructType =
    stagedDirs.getOrElseUpdate(inDir, stage(batches, inDir))

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Write each batch as a single parquet file under `inDir`, named and
    * timestamped in sequence. Returns the staged schema (for the
    * readStream, which must declare it up front). An empty batch stages
    * an empty file and replays as an empty micro-batch — harmless (no
    * rows, no watermark movement) and cheaper than spending a count job
    * per batch to detect it.
    */
  def stage(batches: Seq[DataFrame], inDir: String): StructType = {
    require(batches.nonEmpty, "stage needs at least one batch")
    val dir = new File(inDir)
    deleteRecursively(dir)
    dir.mkdirs()
    val tmp = new File(dir, "_stage_tmp")
    batches.zipWithIndex.foreach { case (b, i) =>
      b.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      tmp.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach { part =>
          val dst = new File(dir, f"b$i%05d.parquet")
          Files.move(part.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
          dst.setLastModified(1700000000000L + i * 60000L)
        }
      deleteRecursively(tmp)
    }
    batches.head.schema
  }

  /** The staged single-file-per-trigger readStream over `inDir`. */
  def source(spark: SparkSession, inDir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)

  /** Run `transform` over the staged replay to completion, writing
    * append-mode output to `outDir` via the parquet file sink (its own
    * checkpoint lives beside it; both are wiped first so every run is a
    * fresh, exactly-reproducible replay).
    */
  def run(spark: SparkSession, inDir: String, schema: StructType,
      outDir: String)(transform: DataFrame => Dataset[_]): Unit = {
    val cp = outDir + "_cp"
    deleteRecursively(new File(outDir))
    deleteRecursively(new File(cp))
    withReplayConf(spark) {
      val q = transform(source(spark, inDir, schema)).writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .format("parquet")
        .option("path", outDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
  }

  /** Run an operator that manages its own sink (foreachBatch ops like
    * [[DocStream.ingestWithGrowingIndex]] / [[UpsertSink.runUpsert]])
    * over the staged replay to completion.
    */
  def runQuery(spark: SparkSession, inDir: String, schema: StructType)
      (start: DataFrame => StreamingQuery): Unit =
    withReplayConf(spark) {
      val q = start(source(spark, inDir, schema))
      try q.processAllAvailable() finally q.stop()
    }
}
