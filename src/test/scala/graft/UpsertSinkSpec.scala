package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.UpsertSink

/** Streaming MERGE via foreachBatch: versioned keyed snapshots from a
  * change stream, with event-time last-writer-wins semantics.
  */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("upsertSnapshot: batch updates, inserts, and leaves untouched keys") {
    val snap = Seq((1L, ts("2024-01-01 00:00:00"), "a1"),
      (2L, ts("2024-01-01 00:00:00"), "b1"))
      .toDF("k", "ts", "v")
    val batch = Seq((2L, ts("2024-01-02 00:00:00"), "b2"),
      (3L, ts("2024-01-02 00:00:00"), "c1"))
      .toDF("k", "ts", "v")
    val got = UpsertSink.upsertSnapshot(Some(snap), batch, "k", "ts")
      .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "a1"), (2L, "b2"), (3L, "c1")))
  }

  test("upsertSnapshot: an OLDER event-time change does not clobber newer state") {
    val snap = Seq((1L, ts("2024-01-05 00:00:00"), "new")).toDF("k", "ts", "v")
    val late = Seq((1L, ts("2024-01-01 00:00:00"), "stale")).toDF("k", "ts", "v")
    val got = UpsertSink.upsertSnapshot(Some(snap), late, "k", "ts")
      .select("v").as[String].collect().toSeq
    assert(got === Seq("new"))
  }

  test("upsertSnapshot: equal event time — the batch wins (last writer)") {
    val t = ts("2024-01-01 00:00:00")
    val snap = Seq((1L, t, "old")).toDF("k", "ts", "v")
    val batch = Seq((1L, t, "resent")).toDF("k", "ts", "v")
    val got = UpsertSink.upsertSnapshot(Some(snap), batch, "k", "ts")
      .select("v").as[String].collect().toSeq
    assert(got === Seq("resent"))
  }

  test("upsertSnapshot is idempotent: re-applying the same batch is a no-op") {
    val snap = Seq((1L, ts("2024-01-01 00:00:00"), "a")).toDF("k", "ts", "v")
    val batch = Seq((1L, ts("2024-01-02 00:00:00"), "a2"),
      (2L, ts("2024-01-02 00:00:00"), "b")).toDF("k", "ts", "v")
    val once = UpsertSink.upsertSnapshot(Some(snap), batch, "k", "ts")
    val twice = UpsertSink.upsertSnapshot(Some(once), batch, "k", "ts")
    assert(twice.orderBy("k").collect().toSeq === once.orderBy("k").collect().toSeq)
  }

  test("ingestWithGrowingIndex dedupes within batches, across batches, and accumulates the index") {
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val (corpus, index) = (s"$root/corpus", s"$root/index")
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStream.ingestWithGrowingIndex(
      input.toDF().toDF("doc_id", "text"), corpus, index)
    try {
      // batch 1: an exact dup WITHIN the batch (keep-first by doc_id)
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      // batch 2: a dup of batch 1 plus a novel doc
      input.addData((4L, "beta"), (5L, "gamma"))
      q.processAllAvailable()
      val got = spark.read.parquet(corpus)
        .orderBy("doc_id").select("doc_id", "text")
        .as[(Long, String)].collect().toSeq
      assert(got === Seq((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
      val idx = spark.read.parquet(index).select("content_sha")
        .as[String].collect().toSeq
      assert(idx.length === 3 && idx.distinct.length === 3)
    } finally q.stop()
  }

  test("runUpsert maintains a versioned snapshot across micro-batches") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = UpsertSink.runUpsert(
      input.toDF().toDF("k", "ts", "v"), "k", "ts", dir)
    try {
      input.addData((1L, ts("2024-01-01 00:00:00"), "a1"),
        (2L, ts("2024-01-01 00:00:00"), "b1"),
        (2L, ts("2024-01-01 06:00:00"), "b1x")) // within-batch: latest wins
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-02 00:00:00"), "b2"),
        (3L, ts("2024-01-02 00:00:00"), "c1"))
      q.processAllAvailable()
      val latest = UpsertSink.latestVersionDir(spark, dir).get
      val got = spark.read.parquet(latest)
        .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
      assert(got === Seq((1L, "a1"), (2L, "b2"), (3L, "c1")))
      // both versions were published; v0 still readable (immutable history)
      val v0 = spark.read.parquet(s"$dir/v0")
        .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
      assert(v0 === Seq((1L, "a1"), (2L, "b1x")))

      // Crash-replay simulation: batch 1's version was published but the
      // offset not committed, so foreachBatch re-runs with batchId=1. The
      // merge base must be v0 (id < 1), NOT the v1 we are about to
      // overwrite — re-running the exact foreachBatch body must succeed
      // and converge to the same snapshot.
      val base = UpsertSink.latestVersionDir(spark, dir, Some(1L))
      assert(base.exists(_.endsWith("v0")))
      val replayed = UpsertSink.upsertSnapshot(
        base.map(spark.read.parquet(_)),
        Seq((2L, ts("2024-01-02 00:00:00"), "b2"),
          (3L, ts("2024-01-02 00:00:00"), "c1")).toDF("k", "ts", "v"),
        "k", "ts")
      replayed.coalesce(1).write.mode("overwrite").parquet(s"$dir/v1")
      val afterReplay = spark.read.parquet(s"$dir/v1")
        .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
      assert(afterReplay === Seq((1L, "a1"), (2L, "b2"), (3L, "c1")))
    } finally q.stop()
  }

  test("latestVersionDir skips half-written versions (no _SUCCESS) and versions >= beforeVersion") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vers").toFile
    def mk(name: String, success: Boolean): Unit = {
      val d = new java.io.File(dir, name); d.mkdir()
      if (success) new java.io.File(d, "_SUCCESS").createNewFile()
    }
    mk("v0", success = true)
    mk("v1", success = true)
    mk("v2", success = false) // mid-write crash: never a merge base
    val p = dir.getPath
    assert(UpsertSink.latestVersionDir(spark, p).exists(_.endsWith("v1")))
    assert(UpsertSink.latestVersionDir(spark, p, Some(1L)).exists(_.endsWith("v0")))
    assert(UpsertSink.latestVersionDir(spark, p, Some(0L)).isEmpty)
  }
}
