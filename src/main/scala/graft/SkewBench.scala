package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Wall-clock demonstration of [[graft.operators.Skew.saltedJoin]]'s
  * straggler collapse — the timing artifact behind ScaleJoinSpec's
  * deterministic partition-count proof (timing assertions don't belong in
  * unit tests; this main prints one JSON line instead, recorded in
  * BASELINE.md).
  *
  * Setup: 4M-row fact table with 90% of rows on ONE key, sort-merge
  * joined against a 1000-row dim. AQE's skew-join splitting is disabled
  * to model the cases salting exists for (engines pinned to static plans,
  * or skew created mid-query that AQE's stats don't see); broadcast is
  * disabled so the join actually shuffles — at real scale the dim side
  * may be far over broadcast size.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-skew-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val n = 4000000L
    // 90% of fact rows on key 0; the rest spread over 1..999
    val big = spark.range(n).select(
      when(col("id") % 10 === 0, (col("id") % 999) + 1).otherwise(lit(0L)).as("k"),
      col("id").as("v"))
    val small = spark.range(1000).select(col("id").as("k"), (col("id") * 7).as("w"))

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = f
      ((System.nanoTime() - t0) / 1e9, out)
    }
    // warm-up both shapes once so codegen/JIT costs don't skew the compare
    big.join(small, Seq("k")).agg(sum(col("v") + col("w"))).collect()
    Skew.saltedJoin(big, small, Seq("k"), saltSource = col("v"), r = cpus)
      .agg(sum(col("v") + col("w"))).collect()

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("v") + col("w"))).head().getLong(0)
    val reps = 3
    val unsalted = (0 until reps).map(_ => time(agg(big.join(small, Seq("k")))))
    val salted = (0 until reps).map(_ =>
      time(agg(Skew.saltedJoin(big, small, Seq("k"), saltSource = col("v"), r = cpus))))
    // EVERY rep of both shapes must agree — a nondeterministic salted-join
    // bug in a later rep must not slip into the published median.
    require((unsalted.map(_._2) ++ salted.map(_._2)).distinct.size == 1,
      "salted and unsalted joins must agree across all reps")
    val u = Bench.median(unsalted.map(_._1))
    val s = Bench.median(salted.map(_._1))
    println(f"""{"metric":"skew_join","unsalted_sec":$u%.3f,"salted_sec":$s%.3f,"speedup":${u / s}%.2f,"rows":$n,"hot_share":0.9,"r":$cpus}""")
    spark.stop()
  }
}
