package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.operators.BloomOps

/** Wall-clock + shuffle-bytes artifact for
  * [[graft.operators.BloomOps.bloomAntiJoin]] — the empirical proof that
  * the bloom pre-filter converts a full-probe shuffle into a sliver,
  * recorded in BASELINE.md (the exactness proof is BloomOpsSpec + the
  * `llm_bloom_suppress` oracle row; this pins the COST claim).
  *
  * Setup: 8M-row probe with 32-hex-char string keys (sha-index shape),
  * 200k-key base (2.5% membership), fpp 1%. Broadcast joins disabled —
  * the pattern exists for bases too big to broadcast (a broadcastable
  * base needs no bloom); with broadcast on, both shapes degenerate to
  * zero-shuffle broadcast joins and measure nothing. Shuffle write bytes
  * are summed across stages via a listener, per shape. Bloom timing
  * INCLUDES the filter build (count + distributed aggregate over the
  * base) — the honest end-to-end cost a user pays per run; production
  * amortizes the build across runs by persisting the filter beside the
  * index it summarizes.
  */
object BloomJoinBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-bloom-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val n = 8000000L
    // Parquet-backed inputs (the real shape: the two-branch plan re-scans
    // the PROBE, and a file scan is the cheap half of the trade — page-
    // cached columnar read vs shuffle write+sort+read). The ~264-byte
    // payload is 8 DISTINCT md5s so neither parquet nor the shuffle
    // codec can compress the exchange away — a synthetic in-flight probe
    // (compressible payload, per-branch regeneration) understates the
    // shuffle and double-charges the scan, measuring the wrong thing.
    val dir = "/tmp/graft_bloom_bench"
    if (!new java.io.File(s"$dir/probe/_SUCCESS").exists()) {
      val payload = concat((0 until 8).map(i =>
        md5(concat(lit(s"p$i"), col("id")))): _*)
      spark.range(n)
        .select(col("id"), md5(concat(lit("k"), col("id"))).as("k"))
        .withColumn("payload", payload)
        .write.mode("overwrite").parquet(s"$dir/probe")
      spark.range(n).filter(col("id") % 40 === 0)
        .select(md5(concat(lit("k"), col("id"))).as("k"))
        .write.mode("overwrite").parquet(s"$dir/base")
    }
    val probe = spark.read.parquet(s"$dir/probe")
    val base = spark.read.parquet(s"$dir/base")

    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // aggregate over the payload so the join must deliver it (count()
    // alone would let column pruning shrink the plain shuffle to keys)
    def out(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(length(col("payload")))).head().getLong(0)
    def plainCount(): Long =
      out(probe.join(base, Seq("k"), "left_anti"))
    def bloomCount(): Long =
      out(BloomOps.bloomAntiJoin(probe, base, "k",
        expectedItems = n / 40, fpp = 0.01))

    def measure(f: () => Long): (Double, Long, Long) = {
      // the listener bus is async (and private); a short settle after the
      // job returns lets stage-completed events land before snapshotting
      Thread.sleep(500)
      val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val rows = f()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      (sec, rows, shuffleBytes.get() - b0)
    }

    // warm-up both shapes (JIT + codegen), then 3 measured reps each
    plainCount(); bloomCount()
    val reps = 3
    val plain = (0 until reps).map(_ => measure(plainCount _))
    val bloom = (0 until reps).map(_ => measure(bloomCount _))
    require((plain.map(_._2) ++ bloom.map(_._2)).distinct.size == 1,
      "bloom and plain anti-joins must agree on every rep")

    val pSec = Bench.median(plain.map(_._1))
    val bSec = Bench.median(bloom.map(_._1))
    val pBytes = plain.map(_._3).sorted.apply(reps / 2)
    val bBytes = bloom.map(_._3).sorted.apply(reps / 2)
    println(
      f"""{"metric":"bloom_anti_join","plain_sec":$pSec%.3f,"bloom_sec":$bSec%.3f,"speedup":${pSec / bSec}%.2f,"plain_shuffle_bytes":$pBytes,"bloom_shuffle_bytes":$bBytes,"shuffle_reduction":${pBytes.toDouble / bBytes.max(1L)}%.1f,"rows":$n,"base_keys":${n / 40},"fpp":0.01,"payload_chars":${plain.head._2}}""")
    spark.stop()
  }
}
