package graft

import org.apache.spark.sql.functions._

/** X292 dimension-truncation ablation: the d = 64 row must equal the
  * full-dim truth exactly (recall 10⁶), rows cover exactly the four
  * truncation levels, and hit counts are bounded by retrieved counts.
  */
class DimAblationSpec extends SparkSpec {

  import spark.implicits._

  test("sf0.001: d=64 is exact, rows well-formed") {
    val got = graft.queries.LlmSurface.queries("llm_ann_dim_ablation")(
        spark, "/root/testdata/sf0.001")
      .select("dim", "n_retrieved", "n_hits", "recall_micro")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(8, 16, 32, 64))
    val full = got.last
    assert(full._2 === full._3 && full._4 === 1000000L,
      s"d=64 must be self-identical: $full")
    got.foreach { r =>
      assert(r._3 <= r._2 && r._4 >= 0L && r._4 <= 1000000L, r.toString)
    }
  }
}
