package graft

import graft.operators.Coreness

/** X389 coreness: hand-computed decompositions plus equivalence with
  * the textbook sequential min-degree peel on a pseudo-random graph.
  */
class CorenessSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Coreness.decompose(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  private def clique(n: Int): Seq[(Long, Long)] =
    for { i <- 1L to n.toLong; j <- (i + 1) to n.toLong } yield (i, j)

  test("path, cycle, clique, pendant") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
      === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
      === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(run(clique(4)).values.toSet === Set(3L))
    // K4 with a pendant: the pendant sits at coreness 1, clique at 3
    val got = run(clique(4) :+ ((4L, 9L)))
    assert(got(9L) === 1L && got(1L) === 3L && got(4L) === 3L)
  }

  test("h-index fixpoint == sequential min-degree peel") {
    val n = 30L
    val edges = (0L until 220L).map { i =>
      val a = (i * 7919 + 13) % n
      val b = (i * 104729 + 31) % n
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    // textbook peel: repeatedly remove a min-degree vertex; its
    // coreness is the running max of min-degrees seen
    var adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).to(collection.mutable.Set) }
    val core = collection.mutable.Map.empty[Long, Long]
    var k = 0L
    val live = collection.mutable.Set(adj.keys.toSeq: _*)
    while (live.nonEmpty) {
      val v = live.minBy(x => (adj(x).size, x))
      k = math.max(k, adj(v).size.toLong)
      core(v) = k
      for (u <- adj(v)) adj(u) -= v
      live -= v
    }
    assert(run(edges) === core.toMap)
  }

  test("full-only and affected-front regimes agree (r15 two-regime)") {
    val n = 30L
    val edges = (0L until 220L).map { i =>
      val a = (i * 7919 + 13) % n
      val b = (i * 104729 + 31) % n
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val df = edges.toDF("a", "b")
    // frontSwitch = 0: the affected path never engages (full rounds
    // only, the pre-r15 behavior). frontSwitch = 2: every round after
    // the first runs the affected-front patch path.
    val full = Coreness.decompose(df, "a", "b", frontSwitch = 0.0)
      .as[(Long, Long)].collect().toMap
    val front = Coreness.decompose(df, "a", "b", frontSwitch = 2.0)
      .as[(Long, Long)].collect().toMap
    assert(full === front)
  }
}
