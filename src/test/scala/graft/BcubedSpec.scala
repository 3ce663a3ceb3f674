package graft

import graft.llm.EvalOps

/** Hand-checked semantics for X282 B-cubed — the textbook worked
  * example, the perfect-clustering fixed point, and the degenerate
  * all-singletons case.
  */
class BcubedSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    EvalOps.bcubed(rows.zipWithIndex
        .map { case ((p, g), i) => (i.toLong, p, g) }
        .toDF("id", "pred", "gold"), "pred", "gold")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head

  test("worked example: P=3/4, R=2/3, per-cell quantization") {
    // gold {a,b,c}{d}; pred {a,b}{c,d}
    val got = run(Seq((1L, "g1"), (1L, "g1"), (2L, "g1"), (2L, "g2")))
    assert(got._1 === 4L && got._2 === 2L && got._3 === 2L)
    assert(got._4 === 750000L)
    assert(got._5 === 666666L)
    assert(got._6 === 2L * 750000L * 666666L / (750000L + 666666L))
  }

  test("perfect clustering scores exactly 1.0 everywhere") {
    val got = run(Seq((1L, "g1"), (1L, "g1"), (2L, "g2")))
    assert(got._4 === 1000000L && got._5 === 1000000L
      && got._6 === 1000000L)
  }

  test("one mega-cluster: perfect recall, precision = avg gold share") {
    // gold {a,b}{c,d}, pred = everything together:
    // P = (1/4)(4/4 + 4/4) = 1/2, R = 1.
    val got = run(Seq((1L, "g1"), (1L, "g1"), (1L, "g2"), (1L, "g2")))
    assert(got._4 === 500000L && got._5 === 1000000L)
  }

  test("all singletons vs one gold group: precision 1, recall 1/n") {
    val got = run(Seq((1L, "g"), (2L, "g"), (3L, "g"), (4L, "g")))
    assert(got._4 === 1000000L && got._5 === 250000L)
  }
}
