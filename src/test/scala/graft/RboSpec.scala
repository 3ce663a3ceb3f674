package graft

import graft.llm.EvalOps

/** X332 RBO: identical rankings score exactly 1e6 (the d·w_d/d
  * identity), a hand-computed partial overlap at depth 3, and the
  * no-common-item case producing no row (caller zero-fills).
  */
class RboSpec extends SparkSpec {

  import spark.implicits._

  test("identical rankings score exactly 1e6") {
    val m = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
      .toDF("q", "ra", "rb")
    val out = EvalOps.rbo(m, "q", "ra", "rb", depth = 3, pNum = 9, pDen = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("q", 3L, 1000000L)))
  }

  test("hand-computed partial overlap: A=[x,y,z] vs B=[y,x,w]") {
    // x:(1,2) y:(2,1) -> both enter at depth 2; w_micro = 100000,
    // 90000, 81000 (sum 271000); terms d2=(2*90000)//2=90000,
    // d3=(2*81000)//3=54000 -> 144000*1e6//271000 = 531365
    val m = Seq(("q", 1L, 2L), ("q", 2L, 1L)).toDF("q", "ra", "rb")
    val out = EvalOps.rbo(m, "q", "ra", "rb", depth = 3, pNum = 9, pDen = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("q", 2L, 531365L)))
  }

  test("disjoint lists produce no row") {
    val m = Seq.empty[(String, Long, Long)].toDF("q", "ra", "rb")
    assert(EvalOps.rbo(m, "q", "ra", "rb", depth = 3, pNum = 9, pDen = 10)
      .count() === 0L)
  }
}
