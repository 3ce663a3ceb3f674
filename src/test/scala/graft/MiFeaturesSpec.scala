package graft

import org.apache.spark.sql.functions._
import graft.llm.FeatureOps

/** Hand-checked semantics for X283 MI feature screening — exact
  * micro-nat integers on a 2×2 table, the absence-cell contribution,
  * and independence scoring zero.
  */
class MiFeaturesSpec extends SparkSpec {

  import spark.implicits._

  private def lmu(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1000000.0).toLong

  private def run(docs: Seq[(Long, String, String)]) =
    FeatureOps.miFeatures(docs.toDF("doc_id", "text", "lang"),
        "doc_id", "text", col("lang"), topK = 10)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("perfectly class-exclusive word: exact 2x2 MI, absence included") {
    // 'm' in both en docs, absent from both fr docs; N=4, df=2, ny=2.
    // present cell (en): 2*(ln(2*4) - ln(2*2)); absence cell (fr):
    // 2*(ln(2*4) - ln(2*2)); en-absent and fr-present cells are 0.
    val got = run(Seq((1L, "m x", "en"), (2L, "m y", "en"),
      (3L, "x q", "fr"), (4L, "y q", "fr")))
    val want = 2L * (lmu(8) - lmu(4)) + 2L * (lmu(8) - lmu(4))
    assert(got("m") === (("m", 2L, want)))
  }

  test("a word exactly independent of the label scores exactly zero") {
    // 'x' in one doc of each class: every cell has n_xy·N = n_x·n_y
    // (present: 1·4 = 2·2; absent: 1·4 = 2·2), so each ln pair
    // cancels term-by-term — integer zero, not float-near-zero.
    val got = run(Seq((1L, "x a", "en"), (2L, "b", "en"),
      (3L, "x c", "fr"), (4L, "d", "fr")))
    assert(got("x")._3 === 0L)
  }

  test("presence-only scoring would miss this: absence carries the MI") {
    // 'z' in ALL docs of en (2/2) and half of fr (1/2): the absence
    // cell (fr, absent) is the informative one.
    val got = run(Seq((1L, "z a", "en"), (2L, "z b", "en"),
      (3L, "z c", "fr"), (4L, "d e", "fr")))
    val present = 2L * (lmu(2L * 4) - lmu(3L * 2)) +
      1L * (lmu(1L * 4) - lmu(3L * 2))
    val absent = 1L * (lmu(1L * 4) - lmu(1L * 2))
    assert(got("z")._3 === present + absent)
    assert(got("z")._2 === 3L)
  }
}
