package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.operators.MerkleDiff

/** Wall-clock + shuffle-bytes artifact for
  * [[graft.operators.MerkleDiff.diff]] — the empirical proof that the
  * bucket-digest prune turns replica reconciliation into "scan twice,
  * shuffle almost nothing", recorded in BASELINE.md (the exactness
  * proof is MerkleDiffSpec + the `k8_merkle_diff` oracle row, whose
  * oracle IS the brute-force diff; this pins the COST claim).
  *
  * Setup: 4M-row base (id + 4 distinct md5 payload columns ≈ 130 B/row,
  * incompressible for the same reason as BloomJoinBench), replica with
  * SPARSE drift: ~40 modified rows (id % 100003 == 0) and ~40 deleted
  * (id % 99991 == 0) — the realistic anti-entropy regime where almost
  * every bucket digest matches. B = 4096. The brute-force comparison is
  * the oracle's spelling: full per-content multiset counts on both
  * sides through a full-outer join — every row's digest and keys cross
  * the shuffle. Merkle timing INCLUDES both digest passes and the
  * drill-down — the honest end-to-end cost.
  */
object MerkleScaleBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-merkle-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 4000000L
    val buckets = 4096
    val dir = "/tmp/graft_merkle_bench"
    if (!new java.io.File(s"$dir/other/_SUCCESS").exists()) {
      val payload = (0 until 4).map(i =>
        md5(concat(lit(s"p$i"), col("id"))).as(s"p$i"))
      spark.range(n).select(col("id") +: payload: _*)
        .write.mode("overwrite").parquet(s"$dir/base")
      spark.read.parquet(s"$dir/base")
        .filter(col("id") % 99991 =!= 0)
        .withColumn("p0",
          when(col("id") % 100003 === 0, md5(concat(lit("drift"), col("id"))))
            .otherwise(col("p0")))
        .write.mode("overwrite").parquet(s"$dir/other")
    }
    val base = spark.read.parquet(s"$dir/base")
    val other = spark.read.parquet(s"$dir/other")
    val digest = MerkleDiff.rowDigest(
      col("id") +: (0 until 4).map(i => col(s"p$i")))

    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // steady-state regime: digest tables MAINTAINED beside each replica
    // (here: persisted once in setup), reconciliation never scans raw
    if (!new java.io.File(s"$dir/digest_other/_SUCCESS").exists()) {
      MerkleDiff.digestTable(base, digest, Seq("id"), buckets)
        .write.mode("overwrite").parquet(s"$dir/digest_base")
      MerkleDiff.digestTable(other, digest, Seq("id"), buckets)
        .write.mode("overwrite").parquet(s"$dir/digest_other")
    }
    val digBase = spark.read.parquet(s"$dir/digest_base")
    val digOther = spark.read.parquet(s"$dir/digest_other")

    def merkle(): Long =
      MerkleDiff.diff(base, other, digest, Seq("id"), buckets).count()
    def merkleMaintained(): Long =
      MerkleDiff.diffDigested(digBase, digOther, Seq("id")).count()
    // the oracle's spelling: full multiset diff, no prune — every row's
    // (digest, key) crosses the exchange on both sides
    def brute(): Long = {
      def counts(df: org.apache.spark.sql.DataFrame, nCol: String) =
        df.select(digest.as("_h"), col("id"))
          .groupBy("_h").agg(count(lit(1)).as(nCol), min("id").as("id"))
      counts(base, "n_base").as("b")
        .join(counts(other, "n_other").as("o"), Seq("_h"), "full_outer")
        .filter(coalesce(col("n_base"), lit(0L))
          =!= coalesce(col("n_other"), lit(0L)))
        .count()
    }

    def measure(f: () => Long): (Double, Long, Long) = {
      Thread.sleep(500)
      val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val rows = f()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      (sec, rows, shuffleBytes.get() - b0)
    }

    merkle(); merkleMaintained(); brute() // warm-up (JIT + codegen + page cache)
    val reps = 3
    val m = (0 until reps).map(_ => measure(merkle _))
    val mm = (0 until reps).map(_ => measure(merkleMaintained _))
    val br = (0 until reps).map(_ => measure(brute _))
    require((m.map(_._2) ++ mm.map(_._2) ++ br.map(_._2)).distinct.size == 1,
      "merkle (both regimes) and brute-force diffs must agree on every rep")

    val diverged = MerkleDiff
      .bucketSummary(base, digest, buckets).as("b")
      .join(MerkleDiff.bucketSummary(other, digest, buckets).as("o"),
        Seq("bucket"), "full_outer")
      .filter(col("b.n").isNull || col("o.n").isNull ||
        col("b.n") =!= col("o.n") || col("b.x") =!= col("o.x") ||
        col("b.hsum") =!= col("o.hsum"))
      .count()

    val mSec = Bench.median(m.map(_._1))
    val mmSec = Bench.median(mm.map(_._1))
    val bSec = Bench.median(br.map(_._1))
    val mBytes = m.map(_._3).sorted.apply(reps / 2)
    val mmBytes = mm.map(_._3).sorted.apply(reps / 2)
    val bBytes = br.map(_._3).sorted.apply(reps / 2)
    println(
      f"""{"metric":"merkle_diff","cold_sec":$mSec%.3f,"maintained_sec":$mmSec%.3f,"brute_sec":$bSec%.3f,"maintained_speedup":${bSec / mmSec}%.2f,"cold_shuffle_bytes":$mBytes,"maintained_shuffle_bytes":$mmBytes,"brute_shuffle_bytes":$bBytes,"shuffle_reduction":${bBytes.toDouble / mBytes.max(1L)}%.1f,"rows":$n,"buckets":$buckets,"diverged_buckets":$diverged,"diff_rows":${m.head._2}}""")
    spark.stop()
  }
}
