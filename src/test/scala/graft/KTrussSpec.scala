package graft

import graft.operators.KTruss

/** X381 k-truss: clique closure grades, pendant pruning, the deletion
  * CASCADE (the property degree-based k-core cannot see), the empty
  * degenerate, and the k contract.
  */
class KTrussSpec extends SparkSpec {

  import spark.implicits._

  private def truss(edges: Seq[(Long, Long)], k: Int) =
    KTruss.truss(edges.toDF("a", "b"), "a", "b", k)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def clique(n: Int): Seq[(Long, Long)] =
    for { i <- 1L to n.toLong; j <- (i + 1) to n.toLong } yield (i, j)

  test("K4 is a complete 4-truss: every edge closes 2 triangles") {
    assert(truss(clique(4), 4) ===
      clique(4).map { case (a, b) => (a, b, 2L) })
  }

  test("K4 is NOT a 5-truss") {
    assert(truss(clique(4), 5).isEmpty)
  }

  test("K5 survives k=5 with support 3 everywhere") {
    val r = truss(clique(5), 5)
    assert(r.size === 10 && r.forall(_._3 === 3L))
  }

  test("a pendant edge is pruned, the clique kept") {
    val r = truss(clique(4) ++ Seq((4L, 9L)), 4)
    assert(r === clique(4).map { case (a, b) => (a, b, 2L) })
  }

  test("deletion CASCADES: two triangles sharing an edge at k=4") {
    // supports: (2,3) closes 2 triangles, all other edges 1 — round 1
    // keeps only (2,3), whose support then collapses to 0 → empty.
    // k-core at degree 2 would have kept the whole butterfly.
    val butterfly = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(truss(butterfly, 4).isEmpty)
  }

  test("empty input yields an empty truss") {
    assert(truss(Seq.empty[(Long, Long)], 4).isEmpty)
  }

  test("incremental support maintenance == naive per-round recompute") {
    // deterministic pseudo-random graph, dense enough for multi-round
    // cascades: triangles survive, pendants and weak bridges peel over
    // several rounds — exactly the regime where a stale carried
    // support would diverge from the naive fixpoint
    val n = 40L
    val edges = (0L until 400L).map { i =>
      val a = (i * 7919 + 13) % n
      val b = (i * 104729 + 31) % n
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    for (k <- Seq(3, 4, 5, 6)) {
      // naive reference: full supportAll recompute every round
      var e = edges
      var stable = false
      while (!stable && e.nonEmpty) {
        val sup = KTruss.supportAll(e.toDF("a", "b"))
          .as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        val keep = e.filter(x => sup(x) >= k - 2)
        stable = keep.size == e.size
        e = keep
      }
      val naive = {
        val sup = KTruss.supportAll(e.toDF("a", "b"))
          .as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        e.map(x => (x._1, x._2, sup(x))).sortBy(r => (r._1, r._2))
      }
      assert(truss(edges, k) === naive, s"diverged at k=$k")
      // force the pure-distributed regime (no local finisher): the
      // carried-support incremental rounds must reach the same fixpoint
      val dist = KTruss.truss(edges.toDF("a", "b"), "a", "b", k,
          localFinishCap = 0L)
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(dist === naive, s"distributed path diverged at k=$k")
    }
  }

  test("k below 3 is rejected") {
    val e = intercept[IllegalArgumentException] {
      truss(clique(3), 2)
    }
    assert(e.getMessage.contains("k"))
  }
}
