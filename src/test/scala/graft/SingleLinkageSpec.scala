package graft

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, GridJoin, Mst}

/** X315 single linkage: the connectivity theorem the query's oracle
  * enforces at corpus scale — CC over the thresholded FOREST equals
  * CC over the thresholded FULL proximity pair set, at every
  * threshold — checked on planted points.
  */
class SingleLinkageSpec extends SparkSpec {

  import spark.implicits._

  test("CC(forest <= T) == CC(all pairs <= T) at every threshold") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (3L, 3L, 0L), (4L, 0L, 2L),
      (5L, 10L, 10L), (6L, 11L, 10L), (7L, 13L, 11L), (8L, 30L, 30L))
      .toDF("id", "x", "y")
    val prox = GridJoin.proximityJoin(pts, "id", "x", "y", maxDist = 6L)
      .localCheckpoint(true)
    val forest = Mst.boruvka(prox, "id_a", "id_b", "dist2")
      .localCheckpoint(true)
    for (t <- Seq(1L, 2L, 5L, 10L, 26L)) {
      val full = ConnectedComponents
        .alternatingStars(prox.filter(col("dist2") <= t), "id_a", "id_b")
        .as[(Long, Long)].collect().toSet
      val viaForest = ConnectedComponents
        .alternatingStars(forest.filter(col("w") <= t), "lo", "hi")
        .as[(Long, Long)].collect().toSet
      assert(viaForest === full, s"threshold $t")
    }
  }
}
