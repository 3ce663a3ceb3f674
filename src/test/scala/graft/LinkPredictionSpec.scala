package graft

import graft.operators.LinkPrediction

/** Hand-checked semantics for X258 link prediction — wedge-join
  * common neighbors, reverse-membership Jaccard, integer-micro
  * Adamic–Adar, the existing-edge anti-join, and the cap.
  */
class LinkPredictionSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], cap: Int = 12,
      topK: Int = 50) =
    LinkPrediction.scores(edges.toDF("item_a", "item_b", "weight"),
        "item_a", "item_b", cap, topK)
      .select("item_a", "item_b", "cn", "aa_micro", "rdeg_a", "rdeg_b",
        "jaccard")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()

  // 10^12 div floor(ln(d)·10^6) — the per-center AA weight
  private def aaC(d: Int): Long =
    1000000000000L / math.floor(math.log(d) * 1e6).toLong

  test("square: two wedge paths score the diagonal pair exactly") {
    // 1-3, 1-4, 2-3, 2-4: centers 3 and 4 (deg 2 each) connect the
    // non-adjacent pair (1,2); centers 1 and 2 connect (3,4)
    val got = run(Seq((1L, 3L, 1L), (1L, 4L, 1L), (2L, 3L, 1L),
      (2L, 4L, 1L)))
    assert(got.length === 2)
    val m = got.map(r => (r._1, r._2) -> r).toMap
    val d12 = m((1L, 2L))
    assert(d12._3 === 2L)                 // cn: centers 3 and 4
    assert(d12._4 === 2 * aaC(2))         // both centers have deg 2
    assert(d12._5 === 2L && d12._6 === 2L)
    assert(d12._7 === 1.0)                // 2/(2+2-2)
    assert(m((3L, 4L))._3 === 2L)
  }

  test("existing edges never appear as candidates") {
    // triangle 1-2, 1-3, 2-3: every wedge pair is already an edge
    val got = run(Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
    assert(got.isEmpty)
  }

  test("AA weights rare shared neighbors more than popular ones") {
    // pair (1,2) shares rare center 10 (deg 2); pair (3,4) shares
    // popular center 20 (deg 4): same cn = 1, AA must rank (1,2) first
    val edges = Seq((1L, 10L, 1L), (2L, 10L, 1L),
      (3L, 20L, 1L), (4L, 20L, 1L), (5L, 20L, 1L), (6L, 20L, 1L))
    val got = run(edges)
    val m = got.map(r => (r._1, r._2) -> r).toMap
    assert(m((1L, 2L))._4 === aaC(2))
    assert(m((3L, 4L))._4 === aaC(4))
    assert(aaC(2) > aaC(4))
    // ordering: cn ties at 1, aa_micro DESC puts (1,2) first
    assert(got.head._1 === 1L && got.head._2 === 2L)
  }

  test("cap drops the weakest neighbors of a hub deterministically") {
    // hub 100 has 4 neighbors with weights 9,9,2,1; cap=2 keeps the
    // two weight-9 ones (1, 2) — so only the (1,2) wedge survives
    val edges = Seq((1L, 100L, 9L), (2L, 100L, 9L), (3L, 100L, 2L),
      (4L, 100L, 1L))
    val got = run(edges, cap = 2)
    assert(got.map(r => (r._1, r._2)).toSet === Set((1L, 2L)))
    val d = got.head
    // hub's capped degree is 2, and reverse degrees count capped
    // membership only
    assert(d._4 === aaC(2) && d._5 === 1L && d._6 === 1L && d._7 === 1.0)
  }

  test("jaccard uses the exact set identity on reverse memberships") {
    // 1 and 2 share center 10; 1 also belongs to capped(20), 2 to
    // nothing else: rdeg 2 and 1, cn 1 -> jacc = 1/2
    val edges = Seq((1L, 10L, 1L), (2L, 10L, 1L), (1L, 20L, 1L),
      (3L, 20L, 1L))
    val got = run(edges)
    val m = got.map(r => (r._1, r._2) -> r).toMap
    assert(m((1L, 2L))._7 === 0.5)
    // (1,3) shares center 20 similarly
    assert(m((1L, 3L))._7 === 0.5)
  }
}
