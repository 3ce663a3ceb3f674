package graft

import graft.operators.Mst

/** X304 Borůvka minimum spanning forest: hand-checked trees, the
  * cycle-property edge drop, tie-breaking by the (w, lo, hi) total
  * order, parallel-edge consolidation, multi-component forests, and
  * the |V| − #components size invariant.
  */
class MstSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Mst.boruvka(edges.toDF("a", "b", "w"), "a", "b", "w")
      .as[(Long, Long, Long)].collect().toSet

  test("triangle drops exactly its heaviest edge") {
    val mst = run(Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 5L)))
    assert(mst === Set((1L, 2L, 1L), (2L, 3L, 2L)))
  }

  test("square cycle keeps the three lightest edges") {
    val mst = run(Seq((1L, 2L, 1L), (2L, 3L, 7L), (3L, 4L, 2L),
      (1L, 4L, 9L)))
    assert(mst === Set((1L, 2L, 1L), (3L, 4L, 2L), (2L, 3L, 7L)))
  }

  test("equal weights break by (lo, hi): the id-smaller edge wins") {
    // cycle 1-2-3 with all weights equal: under (w, lo, hi) the cycle
    // maximum is (2,3) — lexicographically after (1,2) and (1,3) — so
    // it is the unique drop (the same edge Kruskal would reject)
    val mst = run(Seq((1L, 2L, 4L), (2L, 3L, 4L), (1L, 3L, 4L)))
    assert(mst === Set((1L, 2L, 4L), (1L, 3L, 4L)))
  }

  test("parallel edges collapse to their minimum weight") {
    val mst = run(Seq((1L, 2L, 9L), (2L, 1L, 3L), (2L, 3L, 5L)))
    assert(mst === Set((1L, 2L, 3L), (2L, 3L, 5L)))
  }

  test("two components yield a forest of |V| - 2 edges") {
    val mst = run(Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 3L),
      (10L, 11L, 5L), (11L, 12L, 6L), (10L, 12L, 4L)))
    assert(mst === Set((1L, 2L, 1L), (2L, 3L, 2L),
      (10L, 12L, 4L), (10L, 11L, 5L)))
    assert(mst.size === 6 - 2)
  }

  test("a chain needs multiple Borůvka rounds and survives them") {
    // path 1-2-3-...-9 with increasing weights: the MST is the path
    // itself; components merge pairwise so ~log2(9) rounds run
    val path = (1L to 8L).map(i => (i, i + 1, 10L + i))
    assert(run(path) === path.toSet)
  }

  test("self-loops and the empty graph are harmless") {
    assert(run(Seq((5L, 5L, 1L))) === Set.empty)
    assert(run(Seq.empty) === Set.empty)
  }

  test("star graph finishes in one round with every spoke kept") {
    val star = (2L to 7L).map(i => (1L, i, 100L - i))
    assert(run(star) === star.toSet)
  }

  test("local Kruskal finisher ≡ distributed Borůvka rounds") {
    // two-regime gate: localFinishCap = 0 pins the pure distributed
    // rounds; the default cap takes the one-task Kruskal. The strict
    // (w, lo, hi) total order makes the forest unique, so the edge
    // SETS must match exactly — including tie weights and parallel
    // edges. Graph: 80 nodes, modular edges, many equal weights.
    val edges = (0 until 300)
      .map(i => ((i * 13 % 80).toLong, (i * 31 % 80).toLong, (i % 7).toLong))
      .filter { case (a, b, _) => a != b }
      .toDF("a", "b", "w")
    val viaLocal = Mst.boruvka(edges, "a", "b", "w")
      .as[(Long, Long, Long)].collect().toSet
    val viaDist = Mst.boruvka(edges, "a", "b", "w", localFinishCap = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaLocal === viaDist && viaLocal.nonEmpty)
  }

  test("mid-loop local finish: cap between round sizes matches both regimes") {
    // cap = 60 rejects the ~200-edge input but accepts the contracted
    // list after a round or two of halving — the switch happens inside
    // the loop, unioning distributed-round picks with Kruskal picks.
    val edges = (0 until 300)
      .map(i => ((i * 13 % 80).toLong, (i * 31 % 80).toLong, (i % 7).toLong))
      .filter { case (a, b, _) => a != b }
      .toDF("a", "b", "w")
    val viaMid = Mst.boruvka(edges, "a", "b", "w", localFinishCap = 60L)
      .as[(Long, Long, Long)].collect().toSet
    val viaDist = Mst.boruvka(edges, "a", "b", "w", localFinishCap = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaMid === viaDist)
  }

  test("fractional weight raises loudly instead of truncating") {
    // 1.7 vs 1.2 differ only below the integer grid: a silent long
    // cast would tie them at 1 and mis-rank; the contract raises
    val e = Seq((1L, 2L, 1.7), (2L, 3L, 1.2)).toDF("a", "b", "w")
    val ex = intercept[Exception] {
      Mst.boruvka(e, "a", "b", "w").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("non-integer weight")))
    // integer-valued doubles pass the guard losslessly
    val ok = Seq((1L, 2L, 2.0), (2L, 3L, 1.0)).toDF("a", "b", "w")
    assert(Mst.boruvka(ok, "a", "b", "w").as[(Long, Long, Long)]
      .collect().toSet === Set((1L, 2L, 2L), (2L, 3L, 1L)))
  }
}
