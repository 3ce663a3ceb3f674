package graft

import graft.llm.VectorOps

/** X303 Rocchio feedback: on a planted two-cluster corpus a boundary
  * query's label precision@k demonstrably improves after one feedback
  * round, and the integer update is exactly q' = αq + βΣ.
  */
class RocchioSpec extends SparkSpec {

  import spark.implicits._

  // two axis-aligned clusters whose dot scores INTERLEAVE for the
  // boundary query (A: 431+11i vs B: 411+10i): round-0 top-10 is
  // 6 A + 4 B (B's best, 521, outranks A's 4th, 519) and top-5 is
  // 4 A + 1 B — still A-dominated, so the feedback pulls the query
  // into A and round-1 reads 10/10 (hand-computed)
  private def corpus() = {
    val a = (0 until 12).map(i => (100L + i, Seq(30L + i, 10L, 1L), 1))
    val b = (0 until 12).map(i => (200L + i, Seq(10L, 30L + i, 1L), 2))
    val q = Seq((1L, Seq(11L, 10L, 1L), 1))
    (a ++ b ++ q).toDF("vec_id", "qv", "label")
  }

  test("boundary query improves label precision after feedback") {
    val emb = corpus().localCheckpoint(true)
    val queries = emb.filter($"vec_id" === 1L)
    val got = VectorOps.rocchioFeedback(emb, queries, "qv",
        k0 = 5, kEval = 10, alpha = 5L, beta = 2L)
      .select("query_id", "label", "hits_r0", "hits_r1", "uplift")
      .as[(Long, Int, Long, Long, Long)].head()
    assert(got._1 === 1L && got._2 === 1)
    // hand-computed: round-0 6/10, round-1 10/10, uplift +4
    assert(got._3 === 6L, s"pre-feedback hits ${got._3}")
    assert(got._4 === 10L, s"post-feedback hits ${got._4}")
    assert(got._5 === 4L, s"uplift: $got")
  }

  test("a query deep inside its cluster keeps perfect precision (no harm)") {
    val emb = corpus().localCheckpoint(true)
    val queries = emb.filter($"vec_id" === 111L)
    val got = VectorOps.rocchioFeedback(emb, queries, "qv",
        k0 = 5, kEval = 9, alpha = 5L, beta = 2L)
      .select("hits_r0", "hits_r1").as[(Long, Long)].head()
    assert(got === ((9L, 9L)))
  }
}
