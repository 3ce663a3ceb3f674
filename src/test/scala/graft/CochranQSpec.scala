package graft

import graft.operators.CochranQ

/** X377 Cochran's Q: hand-computed statistics on the exact micro grid,
  * the algebraic inertness of all-k subjects, duplicate collapse, and
  * the decision-table range contract.
  */
class CochranQSpec extends SparkSpec {

  import spark.implicits._

  private def q(rows: Seq[(String, String)]) =
    CochranQ.q(rows.toDF("s", "t"), "s", "t")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().head

  test("hand-computed 4-subject 3-treatment panel") {
    // presence: s1{A}, s2{A,B}, s3{A}, s4{A,C}: C=(4,1,1), R=(1,2,1,2)
    // num = 2·(3·18 − 36) = 36, den = 3·6 − 10 = 8 → Q = 4.5; χ²(2) =
    // 5.99 → no rejection
    val r = q(Seq(("s1", "A"), ("s2", "A"), ("s2", "B"), ("s3", "A"),
      ("s4", "A"), ("s4", "C")))
    assert(r === ((3L, 4L, 6L, 18L, 10L, 4500000L, false)))
  }

  test("a strong one-sided panel rejects at df = 1") {
    // nine {A}-only subjects + one {A,B}: Q = 81/9 = 9 ≥ 3.84
    val rows = (1 to 9).map(i => (s"s$i", "A")) ++
      Seq(("s10", "A"), ("s10", "B"))
    val r = q(rows)
    assert(r._6 === 9000000L && r._7 === true)
  }

  test("all-k subjects are algebraically inert") {
    val base = (1 to 9).map(i => (s"s$i", "A")) ++
      Seq(("s10", "A"), ("s10", "B"))
    val withFull = base ++ Seq(("s11", "A"), ("s11", "B"))
    assert(q(base)._6 === q(withFull)._6)
    assert(q(base)._7 === q(withFull)._7)
  }

  test("duplicate observations collapse to presence") {
    val dup = Seq(("s1", "A"), ("s1", "A"), ("s1", "A"), ("s2", "A"),
      ("s2", "B"), ("s3", "A"), ("s4", "A"), ("s4", "C"))
    val single = Seq(("s1", "A"), ("s2", "A"), ("s2", "B"), ("s3", "A"),
      ("s4", "A"), ("s4", "C"))
    assert(q(dup) === q(single))
  }

  test("k outside the decision table raises loudly") {
    val rows = (0 to 7).map(i => ("s1", s"t$i")) ++ Seq(("s2", "t0"))
    val e = intercept[Exception] { q(rows) }
    assert(e.getMessage.contains("CochranQ") ||
      (e.getCause != null && e.getCause.getMessage.contains("CochranQ")))
  }

  test("an all-saturated panel reports zero without dividing") {
    // every subject shows every treatment: den = 0 → Q = 0, no reject
    val rows = for { s <- 1 to 3; t <- Seq("A", "B") }
      yield (s"s$s", t)
    val r = q(rows)
    assert(r._6 === 0L && r._7 === false)
  }
}
