package graft

import graft.llm.TextOps

/** Hand-checked semantics for X263 greedy maximum-coverage selection —
  * the shrinking uncovered-pair table, gain accounting, tie-breaks,
  * and the exhausted-corpus tail.
  */
class MaxCoverageSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int) =
    TextOps.maxCoverageSelect(docs.toDF("doc_id", "text"), "doc_id",
        "text", gram = 3, k = k)
      .select("sel_idx", "doc_id", "gain", "covered_cum")
      .as[(Int, Long, Long, Long)].collect().toSeq

  test("greedy order, overlap discount, and covered_cum") {
    // doc 1 "a b c d": {abc, bcd}; doc 2 "b c d e": {bcd, cde};
    // doc 3 "a b c": {abc}. Round 1: docs 1,2 tie at 2 -> doc 1.
    // Round 2: doc 2's bcd now covered -> gain 1 (cde); doc 3 fully
    // covered, vanishes. Round 3: nothing left -> only 2 rows.
    val got = run(Seq(1L -> "a b c d", 2L -> "b c d e", 3L -> "a b c"), 3)
    assert(got === Seq((1, 1L, 2L, 2L), (2, 2L, 1L, 3L)))
  }

  test("tie on gain breaks to the smaller doc id") {
    val got = run(Seq(9L -> "p q r", 4L -> "x y z"), 2)
    assert(got.map(_._2) === Seq(4L, 9L))
    assert(got.map(_._3) === Seq(1L, 1L))
  }

  test("short docs contribute no shingles") {
    // "a b" has no 3-gram; only doc 2 is selectable
    val got = run(Seq(1L -> "a b", 2L -> "u v w"), 2)
    assert(got === Seq((1, 2L, 1L, 1L)))
  }
}
