package graft

import org.apache.spark.sql.functions._
import graft.operators.Bfs

/** Bfs.minHops: minimum-distance labeling (a node reachable two ways
  * gets the shorter), the maxHops cutoff, undirected expansion, and
  * early convergence.
  */
class BfsSpec extends SparkSpec {

  import spark.implicits._

  //      1 - 2 - 3 - 4 - 5        (path)
  //      1 ------- 4              (shortcut: 4 is hop 1, 5 is hop 2)
  //      9 (isolated seed)
  private val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (1L, 4L)).toDF("a", "b")

  test("min-hop wins when a node is reachable along two paths") {
    val got = Bfs.minHops(edges, "a", "b", Seq(1L, 9L).toDF("n"), 4)
      .orderBy("n")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq === Seq(
      (1L, 0), (2L, 1), (3L, 2), (4L, 1), (5L, 2), (9L, 0)))
  }

  test("maxHops truncates the closure") {
    val got = Bfs.minHops(edges, "a", "b", Seq(5L).toDF("n"), 1)
      .orderBy("n")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq === Seq((4L, 1), (5L, 0))) // undirected: 5 reaches 4
  }

  test("empty frontier converges before maxHops without extra work") {
    val got = Bfs.minHops(edges, "a", "b", Seq(9L).toDF("n"), 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq === Seq((9L, 0))) // isolated node, loop exits early
  }
}
