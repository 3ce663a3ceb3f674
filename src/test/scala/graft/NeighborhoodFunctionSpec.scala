package graft

import graft.operators.NeighborhoodFunction

/** X307 sampled neighborhood function: hand-traced BFS profile over a
  * path + triangle + isolated seed, the 90%-reach flag marking the
  * effective diameter, and frontier dedup (triangle back-edges).
  */
class NeighborhoodFunctionSpec extends SparkSpec {

  import spark.implicits._

  test("hand-traced profile: path 1-2-3-4, triangle 5-6-7, isolated 9") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L))
    val sym = (und ++ und.map(_.swap)).toDF("a", "b")
    val seeds = Seq(1L, 9L, 5L).toDF("n")
    val out = NeighborhoodFunction.sample(sym, "a", "b", seeds, "n",
      maxHops = 5)
      .as[(Int, Long, Long, Boolean)].collect().toSeq
    // src 1 grows 1->2->3->4 along the path, src 5 absorbs its
    // triangle in one hop, src 9 never leaves itself; fin = 8
    assert(out === Seq(
      (0, 3L, 3L, false),
      (1, 6L, 3L, false),
      (2, 7L, 1L, false),
      (3, 8L, 1L, true), // first true row = sampled effective diameter
      (4, 8L, 0L, true),
      (5, 8L, 0L, true)))
  }

  test("duplicate seeds collapse and maxHops >= 1 is enforced") {
    val sym = Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
    val seeds = Seq(1L, 1L, 1L).toDF("n")
    val out = NeighborhoodFunction.sample(sym, "a", "b", seeds, "n",
      maxHops = 2).as[(Int, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq((0, 1L, 1L, false), (1, 2L, 1L, true),
      (2, 2L, 0L, true)))
    intercept[IllegalArgumentException] {
      NeighborhoodFunction.sample(sym, "a", "b", seeds, "n", maxHops = 0)
    }
  }
}
