package graft

/** p_correlation semantics on hand-checkable data: perfect positive /
  * negative linear relationships hit ±1 exactly, and the plan is one
  * partial-combining aggregate (no Expand, no per-pair rescan).
  */
class CorrelationSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked correlations: y = 2x gives +1, y = -x gives -1") {
    import org.apache.spark.sql.functions._
    // mirror the query's arithmetic on a controlled frame via the same
    // cents-quantized exact-decimal moments
    val df = Seq(
      (1.0, 2.0, 5.0), (2.0, 4.0, 4.0), (3.0, 6.0, 3.0), (4.0, 8.0, 2.0))
      .toDF("x", "y", "z")
    val cs = Seq("x", "y", "z")
    val q = df.select(cs.map(c =>
      floor(col(c) * 100 + 0.5).cast("decimal(38,0)").as(c)): _*)
    def corr(a: String, b: String): Double = {
      val m = q.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col(a)).as("sa"), sum(col(b)).as("sb"),
        sum(col(a) * col(a)).as("qa"), sum(col(b) * col(b)).as("qb"),
        sum(col(a) * col(b)).as("xab"))
        .select(
          ((col("n") * col("xab") - col("sa") * col("sb")).cast("double") /
            sqrt((col("n") * col("qa") - col("sa") * col("sa")).cast("double") *
              (col("n") * col("qb") - col("sb") * col("sb")).cast("double")))
            .as("c"))
      m.collect().head.getDouble(0)
    }
    assert(corr("x", "y") === 1.0)   // exactly linear, exact integers → exact ±1
    assert(corr("x", "z") === -1.0)
  }

  test("query plan is one partial-combining aggregate, no Expand") {
    val q = graft.queries.RefSurface.queries("p_correlation")(
      spark, "/root/testdata/sf0.001")
    val p = q.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("partial"),
      s"moment agg must map-side combine:\n$p")
    assert(!p.contains("Expand"), s"no Expand allowed:\n$p")
    assert(!p.contains("Join"), s"one-pass agg, no joins:\n$p")
  }
}
