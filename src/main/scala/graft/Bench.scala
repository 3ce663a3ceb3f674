package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. A query that throws is recorded under
  * `"errors"` (name → message) and EXCLUDED from the total, so a broken
  * query fails visibly instead of looking fast.
  *
  * Each query runs `SPARK_GRAFT_REPS` times (default 3); the reported
  * per-query number and the total are the MEDIAN across reps (min is also
  * published under `"queries_min"`). A single-iteration bench cannot
  * distinguish regression from machine noise — round 3 recorded 2.7–2.9×
  * per-query swings with zero Spark-side query changes.
  */
object Bench {
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = GraftSession.builder(cpus, "graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def fmt(d: Double): String = f"$d%.3f"
    // Untimed JVM/codegen warmup so the first timed query measures the
    // query, not JIT + whole-stage-codegen compilation of the harness.
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 7)").collect()
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val runs = selected.map { case (name, fn) =>
      // Settle BETWEEN queries: a System.gc() lets the ContextCleaner
      // release the previous query's localCheckpoint/broadcast blocks
      // (cleanup is reference-triggered) so an iterative Lloyd-loop
      // query's memory pressure doesn't bleed into whoever runs next —
      // round 5 recorded 2-5× contamination on the four queries
      // alphabetically following the k-means trio, reproducible only in
      // the full-suite run. Cost: ~0.3 s × |queries|, off the clock.
      System.gc()
      Thread.sleep(300)
      val times = Seq.newBuilder[Double]
      var err: Option[String] = None
      var r = 0
      while (r < reps && err.isEmpty) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable => err = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        r += 1
      }
      (name, times.result(), err)
    }
    val ok = runs.collect { case (n, ts, None) => (n, median(ts), ts.min) }
    val bad = runs.collect { case (n, _, Some(msg)) => (n, msg) }
    val qs = ok.map { case (k, med, _) => s"${jstr(k)}:${fmt(med)}" }.mkString("{", ",", "}")
    val qmins = ok.map { case (k, _, mn) => s"${jstr(k)}:${fmt(mn)}" }.mkString("{", ",", "}")
    val errs = bad.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"queries":$qs,"queries_min":$qmins,"errors":$errs,"n_failed":${bad.size},"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
