package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Shuffle + wall-clock artifact for [[graft.llm.TextOps.heavyHitters]] —
  * the empirical proof that the count-min candidate filter keeps the
  * vocabulary long tail out of the exchange (exactness is
  * HeavyHittersSpec + the `llm_heavy_hitters` oracle row; this pins the
  * COST claim). Recorded in BASELINE.md.
  *
  * Setup: 8M-token corpus, 20 hot words (100k occurrences each) + 6M
  * singleton-ish tail words (the Heaps'-law shape) staged to parquet so
  * both plans read identical columnar input. Plain spelling =
  * `groupBy(word).count.filter(≥T)` — its exchange carries one combine
  * row per (word, partition), i.e. the whole tail; sketch spelling
  * shuffles d×w constant sketch rows plus candidate occurrences only.
  * Shuffle write bytes and records summed across stages via a listener.
  */
object HeavyHittersBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-hh-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nHot = 20L
    val hotEach = 100000L
    val nTail = 6000000L
    val dir = "/tmp/graft_hh_bench"
    if (!new java.io.File(s"$dir/corpus/_SUCCESS").exists()) {
      val hot = spark.range(nHot * hotEach)
        .select(concat(lit("hot"), col("id") % nHot).as("w"))
      val tail = spark.range(nTail)
        .select(concat(lit("t"), col("id")).as("w"))
      // one "text" per 100 tokens so the op's explode path is exercised
      hot.unionAll(tail)
        .withColumn("_g", monotonically_increasing_id() % 80000)
        .groupBy("_g").agg(concat_ws(" ", collect_list("w")).as("text"))
        .select("text")
        .write.mode("overwrite").parquet(s"$dir/corpus")
    }
    val corpus = spark.read.parquet(s"$dir/corpus")

    val shuffleBytes = new AtomicLong
    val shuffleRecords = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shuffleRecords.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
        ()
      }
    })

    val supportPpm = 5000L // T = 0.5% of 8M = 40k → exactly the 20 hot words
    def plain(): Long = {
      val toks = corpus.select(explode(split(col("text"), " ")).as("w"))
      val thr = spark.range(1).select(lit(40000L)).head().getLong(0)
      toks.groupBy("w").count().filter(col("count") >= thr).count()
    }
    def sketch(): Long =
      TextOps.heavyHitters(corpus, "text", supportPpm).count()

    def measure(f: () => Long): (Double, Long, Long, Long) = {
      Thread.sleep(500)
      val b0 = shuffleBytes.get(); val r0 = shuffleRecords.get()
      val t0 = System.nanoTime()
      val rows = f()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      (sec, rows, shuffleBytes.get() - b0, shuffleRecords.get() - r0)
    }

    plain(); sketch() // warm-up
    val reps = 3
    val p = (0 until reps).map(_ => measure(plain _))
    val s = (0 until reps).map(_ => measure(sketch _))
    require((p.map(_._2) ++ s.map(_._2)).distinct == Seq(nHot),
      s"both shapes must find exactly the $nHot hot words on every rep")

    val pSec = Bench.median(p.map(_._1)); val sSec = Bench.median(s.map(_._1))
    val pB = p.map(_._3).sorted.apply(reps / 2); val sB = s.map(_._3).sorted.apply(reps / 2)
    val pR = p.map(_._4).sorted.apply(reps / 2); val sR = s.map(_._4).sorted.apply(reps / 2)
    println(
      f"""{"metric":"heavy_hitters","plain_sec":$pSec%.3f,"sketch_sec":$sSec%.3f,"speedup":${pSec / sSec}%.2f,"plain_shuffle_bytes":$pB,"sketch_shuffle_bytes":$sB,"plain_shuffle_records":$pR,"sketch_shuffle_records":$sR,"shuffle_bytes_reduction":${pB.toDouble / sB.max(1L)}%.1f,"tokens":${nHot * hotEach + nTail},"tail_words":$nTail,"support_ppm":$supportPpm}""")
    spark.stop()
  }
}
