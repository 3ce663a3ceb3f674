package graft

import org.apache.spark.sql.functions._

/** Sketch-based approximations — the 100 TB substitutes for exact
  * distinct counts and sort-based quantiles. Sketches aren't
  * bit-comparable across engines, so they're bounds-tested here instead
  * of oracle-compared: HyperLogLog++ within its configured relative
  * error, t-digest percentile within a small band of the exact value.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) lands within its error bound") {
    val words = graft.queries.Tables(spark, dir, "documents")
      .select(explode(graft.llm.TextOps.words(col("text"))).as("w"))
    val (exact, approx) = words
      .agg(countDistinct("w"), approx_count_distinct("w", rsd = 0.02))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"HLL estimate $approx too far from exact $exact")

    // per-user event distincts: the grouped (mergeable, map-side) form
    val perUser = graft.queries.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(countDistinct("event_type").as("exact"),
        approx_count_distinct("event_type", rsd = 0.02).as("approx"))
      .filter(abs(col("approx") - col("exact")) > col("exact") * 0.2)
    assert(perUser.count() === 0)
  }

  test("approx_percentile (t-digest) tracks the exact percentile") {
    val ev = graft.queries.Tables.events(spark, dir)
    val rows = ev.groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("exact_med"),
        expr("approx_percentile(value, 0.5, 1000)").as("approx_med"))
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, e, a) =>
      assert(math.abs(a - e) <= math.max(1.0, e * 0.05),
        s"$t: approx median $a vs exact $e")
    }
  }
}
