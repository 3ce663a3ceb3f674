package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. A query that throws is recorded under
  * `"errors"` (name → message) and EXCLUDED from the total, so a broken
  * query fails visibly instead of looking fast.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // Untimed JVM/codegen warmup so the first timed query measures the
    // query, not JIT + whole-stage-codegen compilation of the harness.
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 7)").collect()
    val runs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val ok = runs.collect { case (n, sec, None) => (n, sec) }
    val bad = runs.collect { case (n, _, Some(msg)) => (n, msg) }
    val qs = ok.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = bad.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":${bad.size},"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
