package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly (hand-computed)") {
    val got = Seq((3, 5), (0, 0), (63, 0), (0, 63), (63, 63))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 6).as("z"))
      .as[Long].collect().toSeq
    // z(3,5): x bits 1,1,0 → positions 0,2; y bits 1,0,1 → positions 1,5
    assert(got === Seq(1L + 2 + 4 + 32, 0L, 0x555L, 0xAAAL, 0xFFFL))
  }

  test("z-range buckets cover compact rectangles; a box query touches few") {
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("x", "y")
      .withColumn("layout", lit("z"))
      .withColumn("file", expr("null"))
      .withColumn("_z", ZOrder.zValue(col("x"), col("y"), 6))
      .withColumn("file", expr("_z div 256"))
    val idx = ZOrder.skippingIndex(grid, "layout", "file", "x", "y",
      x0 = 8, x1 = 15, y0 = 16, y1 = 31).collect()
    assert(idx.length === 16)
    // every file is a 16×16 rectangle of the 64×64 grid
    idx.foreach { r =>
      assert(r.getAs[Int]("max_x") - r.getAs[Int]("min_x") === 15)
      assert(r.getAs[Int]("max_y") - r.getAs[Int]("min_y") === 15)
      assert(r.getAs[Long]("n_rows") === 256L)
    }
    // the 8..15 × 16..31 box sits inside exactly one 16×16 tile
    assert(idx.count(_.getAs[Boolean]("scan_needed")) === 1)
  }

  test("skippingIndex never skips a file that holds a matching row") {
    val rows = (0 until 500).map(i => (i * 7 % 64, i * 13 % 64, i % 9))
      .toDF("x", "y", "file").withColumn("layout", lit("any"))
    val idx = ZOrder.skippingIndex(rows, "layout", "file", "x", "y",
      x0 = 10, x1 = 12, y0 = 40, y1 = 45)
    val filesWithHits = rows
      .filter(col("x").between(10, 12) && col("y").between(40, 45))
      .select(col("file")).distinct().as[Int].collect().toSet
    val scanned = idx.filter(col("scan_needed"))
      .select(col("file_id").cast("int")).as[Int].collect().toSet
    assert(filesWithHits.subsetOf(scanned), "skipping must be lossless")
  }
}
