package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming MERGE: maintain a keyed snapshot table from a change
  * stream via `foreachBatch` — the bridge between Structured Streaming
  * and the batch m6 (SCD-1) semantics. Structured Streaming has no
  * native MERGE sink; the production pattern (public Delta/Iceberg
  * guidance) is exactly this: per micro-batch, reduce the batch to its
  * latest row per key, merge with the current snapshot, publish a new
  * snapshot version.
  *
  * Determinism under replay: "latest" is decided by EVENT time (the
  * `tsCol`), ties broken by source (batch beats snapshot — last-writer
  * -wins) then by the full payload struct, so re-delivering a
  * micro-batch after a failure converges to the same snapshot
  * (idempotent upsert), which is the property that makes foreachBatch's
  * at-least-once delivery safe.
  *
  * Scale: the per-batch cost here is O(|batch| + |snapshot|) because
  * the snapshot is rewritten whole — correct for model/dimension-sized
  * state. For a 100 TB keyed table the same merge runs against a
  * HASH-PARTITIONED snapshot and rewrites only the partitions the
  * batch's keys touch (partition pruning on `hash(key) % n`), making
  * the cost O(|batch| + touched partitions); versions then need the
  * compaction planner ([[graft.operators.Compaction]]) to fold old
  * snapshot generations. Published versions are immutable directories
  * (`v<batchId>`), so readers never observe a half-written snapshot —
  * the read path takes the highest complete version.
  */
object UpsertSink {

  /** Latest row per key: one `max_by` combine aggregation — map-side
    * partial, no per-key sort, no window. Ordering = (ordCols, payload)
    * so ties cannot make the result partition-dependent.
    */
  def latestPerKey(df: DataFrame, keyCol: String,
      ordCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(_ == keyCol).toSeq
    val ord = struct((ordCols ++ payload.filterNot(ordCols.contains))
      .map(col): _*)
    df.groupBy(col(keyCol))
      .agg(max_by(struct(payload.map(col): _*), ord).as("_p"))
      .select(col(keyCol) +: payload.map(c => col(s"_p.`$c`")): _*)
  }

  /** Pure merge step: apply a micro-batch to an optional prior
    * snapshot. Exposed separately so the semantics are testable without
    * a streaming runtime.
    */
  def upsertSnapshot(snapshot: Option[DataFrame], batch: DataFrame,
      keyCol: String, tsCol: String): DataFrame = {
    val latest = latestPerKey(batch, keyCol, Seq(tsCol))
      .withColumn("_src", lit(1))
    snapshot match {
      case None => latest.drop("_src")
      case Some(sn) =>
        latestPerKey(
          sn.withColumn("_src", lit(0)).unionByName(latest),
          keyCol, Seq(tsCol, "_src"))
          .drop("_src")
    }
  }

  /** Path of the highest COMPLETE published snapshot version, if any.
    *
    * Two guards make crash-replay safe (at-least-once foreachBatch):
    *   - a version counts only if its `_SUCCESS` marker exists, so a
    *     directory left half-written by a mid-write crash is never
    *     picked as the merge base;
    *   - `beforeVersion` (the replaying batchId) excludes the version
    *     the current batch is about to publish — otherwise a replayed
    *     batch whose output was published but whose offset was not
    *     committed would read `v<batchId>` while overwriting it
    *     ("Cannot overwrite a path that is also being read from").
    */
  def latestVersionDir(spark: SparkSession, dir: String,
      beforeVersion: Option[Long] = None): Option[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .flatMap(f => f.getName.drop(1).toLongOption.map(_ -> f.getPath))
      .filter { case (id, path) =>
        beforeVersion.forall(id < _) &&
          new java.io.File(path, "_SUCCESS").isFile
      }
      .sortBy(_._1).lastOption.map(_._2)
  }

  /** Wire a change stream into versioned snapshot maintenance. Each
    * micro-batch publishes `dir/v<batchId>` = previous snapshot merged
    * with the batch. The merge base is the highest complete version
    * strictly below `batchId`, so replaying a batch after a crash
    * recomputes `v<batchId>` from the same base it used the first time
    * (idempotent recovery).
    */
  def runUpsert(stream: DataFrame, keyCol: String, tsCol: String,
      dir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val prev = latestVersionDir(s, dir, Some(batchId))
          .map(s.read.parquet(_))
        upsertSnapshot(prev, batch, keyCol, tsCol)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/v$batchId")
        ()
      }
      .start()
}
