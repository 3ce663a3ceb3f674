package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{GridJoin, Mst}

/** X313 incremental MST: proximityProbe ≡ the self-join restricted to
  * batch-incident pairs, and the maintenance identity
  * MST(forest(base) ∪ batch-incident) ≡ MST(full) on planted points
  * (the cycle-property argument the query's shared oracle enforces at
  * corpus scale).
  */
class MstIncrementalSpec extends SparkSpec {

  import spark.implicits._

  private val pts: DataFrame = Seq(
    (1L, 0L, 0L), (2L, 3L, 0L), (3L, 0L, 4L), (4L, 10L, 10L),
    (5L, 12L, 10L), (6L, 10L, 13L), (7L, 100L, 100L), (8L, 2L, 2L),
    (9L, 11L, 11L), (10L, 101L, 101L)).toDF("id", "x", "y")

  test("proximityProbe finds exactly the batch-incident pair set") {
    val batchIds = Set(8L, 9L, 10L)
    val all = GridJoin.proximityJoin(pts, "id", "x", "y", maxDist = 5L)
      .as[(Long, Long, Long)].collect().toSet
    val expected = all.filter(p =>
      batchIds(p._1) || batchIds(p._2))
    val probed = GridJoin.proximityProbe(
      pts.filter(col("id").isin(8L, 9L, 10L)), pts,
      "id", "x", "y", maxDist = 5L)
      .as[(Long, Long, Long)].collect().toSet
    assert(probed === expected)
    assert(probed.nonEmpty)
  }

  test("forest(base) + batch-incident edges rebuild the full MST") {
    val batch = pts.filter(col("id").isin(8L, 9L, 10L))
    val base = pts.filter(!col("id").isin(8L, 9L, 10L))
    val full = Mst.boruvka(
      GridJoin.proximityJoin(pts, "id", "x", "y", 5L), "id_a", "id_b",
      "dist2").as[(Long, Long, Long)].collect().toSet
    val forest = Mst.boruvka(
      GridJoin.proximityJoin(base, "id", "x", "y", 5L), "id_a", "id_b",
      "dist2")
      .select(col("lo").as("id_a"), col("hi").as("id_b"),
        col("w").as("dist2"))
    val incremental = Mst.boruvka(
      forest.unionByName(
        GridJoin.proximityProbe(batch, pts, "id", "x", "y", 5L)),
      "id_a", "id_b", "dist2").as[(Long, Long, Long)].collect().toSet
    assert(incremental === full)
    assert(full.nonEmpty)
  }
}
