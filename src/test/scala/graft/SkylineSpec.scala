package graft

import graft.operators.Skyline

/** Skyline prune-then-verify vs the quadratic dominance definition. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, sx, sy) =>
        sx >= x && sy >= y && (sx > x || sy > y)
      }
    }.map(_._1).toSet

  test("randomized point sets match the quadratic definition") {
    val rnd = new scala.util.Random(3)
    (1 to 5).foreach { trial =>
      val pts = (1 to 200).map(i =>
        (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      val out = Skyline.skyline2D(
        pts.toDF("id", "x", "y"), "id", "x", "y", xBucketWidth = 100L)
        .collect().map(_.getLong(0)).toSet
      assert(out === brute(pts), s"trial $trial")
    }
  }

  test("exact ties survive together; dominated duplicates die together") {
    val pts = Seq(
      (1L, 10L, 10L), (2L, 10L, 10L),   // tied frontier pair
      (3L, 5L, 5L), (4L, 5L, 5L),       // dominated pair
      (5L, 12L, 3L))                    // frontier on x
    val out = Skyline.skyline2D(
      pts.toDF("id", "x", "y"), "id", "x", "y", xBucketWidth = 4L)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 5L))
    assert(out === brute(pts))
  }
}
