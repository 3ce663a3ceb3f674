package graft

import org.apache.spark.sql.functions._
import graft.operators.KCore

/** KCore: hand-checked peel (triangle survives, pendant chain strips),
  * cascade correctness vs a reference in-memory peeling on a random-ish
  * graph, and the empty-core case.
  */
class KCoreSpec extends SparkSpec {

  import spark.implicits._

  private def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var e = edges
    var stable = false
    while (!stable) {
      val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (n, v) => n -> v.size }
      val keep = deg.filter(_._2 >= k).keySet
      val pruned = e.filter(p => keep(p._1) && keep(p._2))
      stable = pruned.size == e.size
      e = pruned
    }
    e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (n, v) => n -> v.size }
  }

  test("triangle survives the 2-core, pendant chain peels away") {
    // triangle 1-2-3 plus chain 3-4-5-6
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L)).toDF("a", "b")
    val got = KCore.kCore(edges, "a", "b", k = 2)
      .orderBy("n").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("cascade matches the reference peeling on a mixed graph") {
    // two 4-cliques bridged by a path, plus assorted pendants
    val clique = (off: Long) => for {
      i <- 0 until 4; j <- i + 1 until 4
    } yield (off + i, off + j)
    val edges = (clique(0L) ++ clique(10L) ++
      Seq((3L, 20L), (20L, 21L), (21L, 10L),   // bridge path
        (0L, 30L), (11L, 31L), (31L, 32L)))    // pendants
      .toDF("a", "b")
    for (k <- 2 to 4) {
      val got = KCore.kCore(edges, "a", "b", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = refKCore(edges.as[(Long, Long)].collect().toSeq, k)
        .map { case (n, d) => n -> d.toLong }
      assert(got === want, s"k=$k")
    }
  }

  test("over-strict k yields an empty core, not an error") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(KCore.kCore(edges, "a", "b", k = 5).count() === 0L)
  }
}
