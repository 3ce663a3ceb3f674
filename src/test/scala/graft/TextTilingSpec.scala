package graft

import graft.operators.TextTiling

/** X318 TextTiling: hand-computed Jaccard gap profile on a planted
  * 3-block doc, edge-gap depth semantics, the depth threshold, and
  * single-block docs contributing nothing.
  */
class TextTilingSpec extends SparkSpec {

  import spark.implicits._

  private val doc3 = (
    (0 to 9).map(i => s"a$i") ++ // block A
      ((0 to 4).map(i => s"a$i") ++ (0 to 4).map(i => s"b$i")) ++ // B
      (0 to 9).map(i => s"c$i")) // C
    .mkString(" ")

  test("hand-computed profile: overlap gap vs topic break") {
    val df = Seq((1L, doc3), (2L, "tiny doc under one block"))
      .toDF("doc_id", "text")
    val out = TextTiling.gapProfile(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    // gap 0 (A|B): inter 5, union 15 -> 333333; neighbors: none left,
    //   0 right -> not a local min, depth 0
    // gap 1 (B|C): disjoint -> 0; rises 333333 to the left -> boundary
    assert(out === Set(
      (1L, 0L, 333333L, 0L, false),
      (1L, 1L, 0L, 333333L, true)))
  }

  test("depth threshold gates the boundary flag") {
    val df = Seq((1L, doc3)).toDF("doc_id", "text")
    val out = TextTiling.gapProfile(df, "doc_id", "text",
      depthThresholdMicro = 400000L)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(out === Set(
      (1L, 0L, 333333L, 0L, false),
      (1L, 1L, 0L, 333333L, false))) // dip real, depth under bar
  }
}
