package graft

import graft.operators.Scc

/** Hand-checked semantics for the FB-coloring strongly-connected-
  * components operator.
  */
class SccSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long]) =
    Scc.components(edges.toDF("src", "dst"), nodes.toDF("id"))
      .as[(Long, Long)].collect().toMap

  test("triangle plus tail: cycle collapses, tail stays singleton") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)),
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }

  test("two cycles behind a bridge need the outer peel") {
    // {1,2} and {3,4} are separate SCCs; 2→3 bridges them one-way.
    // Round 1 colors everything 1 but only {1,2} reaches the root —
    // {3,4} must survive to the second peel.
    val got = run(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L)),
      Seq(1L, 2L, 3L, 4L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("isolated nodes and a self-contained DAG are all singletons") {
    val got = run(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L, 9L))
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 9L -> 9L))
  }

  test("condensationLevels: chain of components gets longest-path depths") {
    // {1,2} → {3} → {4,5}, plus a shortcut 2→4: longest path to {4,5}
    // is still 2 (through {3}); sizes 2/1/2
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (2L, 4L),
      (4L, 5L), (5L, 4L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val scc = Scc.components(edges, nodes)
    val got = Scc.condensationLevels(edges, scc)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 0L), (3L, 1L, 1L), (4L, 2L, 2L)))
  }

  test("hillTailIndex: exact integer H on a hand histogram") {
    // k = 3 over values 10.00, 8.00, 6.00, 4.00, 2.00 — ref is the
    // 4th largest (400 cents)
    val ev = Seq(10.0, 8.0, 6.0, 4.0, 2.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "m", v) }
      .toDF("event_id", "event_type", "value")
    val got = graft.llm.EventOps.hillTailIndex(ev, "event_type", "value",
      k = 3).as[(String, Long, Long, Long, Long)].collect().head
    def lnMu(c: Long) = math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong
    val h = (lnMu(1000) + lnMu(800) + lnMu(600) - 3 * lnMu(400)) / 3
    assert(got === (("m", 3L, 400L, h, 1000000000000L / h)))
  }

  test("hillTailIndex: boundary ties contribute exact multiplicities") {
    // values: 900 ×1, 700 ×3 with k = 2: top-2 = {900, one 700},
    // ref = x_(3) = 700 → H = (ln 900 − ln 700) / 2 in micro
    val ev = (Seq(9.0) ++ Seq.fill(3)(7.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, "m", v) }
      .toDF("event_id", "event_type", "value")
    val got = graft.llm.EventOps.hillTailIndex(ev, "event_type", "value",
      k = 2).as[(String, Long, Long, Long, Long)].collect().head
    def lnMu(c: Long) = math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong
    val h = (lnMu(900) + lnMu(700) - 2 * lnMu(700)) / 2
    assert(got._3 === 700L && got._4 === h)
  }

  test("local Tarjan finisher ≡ distributed FB-coloring peel") {
    // directed modular graph with planted cycles of several depths so
    // the distributed path needs multiple outer peel rounds; labels
    // (component MINIMUM id) must match row-for-row
    val nodes = (0L until 80L)
    val edges = (0 until 300)
      .map(i => ((i * 13 % 80).toLong, (i * 57 % 80).toLong))
      .filter { case (a, b) => a != b } ++
      Seq((70L, 71L), (71L, 72L), (72L, 70L)) // isolated 3-cycle risk
    val viaLocal = Scc.components(edges.toDF("src", "dst"),
      nodes.toDF("id")).as[(Long, Long)].collect().toMap
    val viaDist = Scc.components(edges.toDF("src", "dst"),
      nodes.toDF("id"), localFinishCap = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaLocal === viaDist && viaLocal.size === 80)
  }

  test("condensationLevels local DP ≡ max-propagation fixpoint") {
    val nodes = (0L until 40L)
    val edges = (0 until 140)
      .map(i => ((i * 11 % 40).toLong, (i * 23 % 40).toLong))
      .filter { case (a, b) => a != b }
    val e = edges.toDF("src", "dst")
    val scc = Scc.components(e, nodes.toDF("id"))
    val viaLocal = Scc.condensationLevels(e, scc)
      .as[(Long, Long, Long)].collect().toSet
    val viaDist = Scc.condensationLevels(e, scc, localFinishCap = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaLocal === viaDist && viaLocal.nonEmpty)
  }
}
