package graft

import graft.llm.{EventOps, TextOps}

/** Hand-checked semantics for the round-10 wave-12 ops: weighted
  * MinHash near-dup and the experiment power calculator.
  */
class WeightedMinhashPowerSpec extends SparkSpec {

  import spark.implicits._

  test("weightedMinhashPairs: identical docs collide in every band " +
    "with exact unit similarity") {
    val base = (1 to 16).map(i => s"c$i").mkString(" ")
    val docs = Seq((1L, s"a a a a $base"), (2L, s"a a a a $base"),
      (3L, (1 to 20).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.weightedMinhashPairs(docs, "doc_id", "text",
      cap = 4, k = 16, bandRows = 8, salt = "t")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L, 1000000L, 1000000L)))
  }

  test("weightedMinhashPairs: capped tf weighs repetition — same vocab, " +
    "different multiplicities") {
    // A: a×4 + c1..c16; B: a×1 + c1..c16 + d1..d3. Set Jaccard of the
    // vocab would be 17/20; capped-weighted J = Σmin/Σmax = 17/23.
    val cs = (1 to 16).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"a a a a $cs"),
      (2L, s"a $cs d1 d2 d3")).toDF("doc_id", "text")
    // bandRows = 1: every shared minimum yields the candidate, so the
    // pair cannot be lost to band boundaries in this tiny fixture
    val got = TextOps.weightedMinhashPairs(docs, "doc_id", "text",
      cap = 4, k = 16, bandRows = 1, salt = "t")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === 1)
    val (a, b, est, jw) = got.head
    assert((a, b) === ((1L, 2L)))
    // 17·10⁶ div 23 = 739130
    assert(jw === 739130L)
    assert(est > 500000L && est <= 1000000L)
  }

  test("powerAnalysis: bimodal metric gives the exact textbook n") {
    val ev = (Seq.fill(50)(1.0) ++ Seq.fill(50)(3.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, "m", v) }
      .toDF("event_id", "event_type", "value")
    val got = EventOps.powerAnalysis(ev, "event_type", "value", mdePct = 5)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // mean 2e6 µ; s² = (nΣv²−S²)/(n(n−1)) = 10¹⁶/9900 → 1010101010101;
    // δ = 10⁵ µ; n = ⌈1568·s²/(100·δ²)⌉ = 1584
    assert(got.toSeq === Seq(
      ("m", 100L, 2000000L, 1010101010101L, 100000L, 1584L)))
  }
}
