package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.DocStream

/** X362 streaming temperature-mix rebalancer: the allocation always
  * reflects state INCLUDING the batch, every column sums to 10⁶
  * exactly, and the final emission equals the batch temperatureMix
  * on the full corpus (streaming ≡ batch).
  */
class StreamMixMonitorSpec extends SparkSpec {

  import spark.implicits._

  test("cumulative rebalancing, exact sums, and batch equivalence") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "text", "source")
    val base = java.nio.file.Files.createTempDirectory("mix-").toString
    val q = DocStream.mixMonitor(docs, s"$base/counts", s"$base/out")
    def rows() = spark.read.parquet(s"$base/out")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq.sorted
    try {
      // batch 0: a has 4 tokens, b has 1 → prop (800000, 200000);
      // sqrt shares 2:1 → temp (666667, 333333) — one seat by
      // remainder (a's rem 2·10¹⁸·... larger: 2e6/3 → 666666.67 →
      // quota 666666 rem larger than b's? both rem .33/.67 → seat to b
      input.addData((0L, "w w w w", "a"), (1L, "w", "b"))
      q.processAllAvailable()
      val r0 = rows()
      assert(r0.map(_._5).sum === 1000000L)
      assert(r0.map(_._6).sum === 1000000L)
      assert(r0.find(_._2 == "a").get._5 === 800000L)
      // batch 1: b catches up to 4 tokens total → cumulative (4, 5)
      input.addData((2L, "x x x x", "b"))
      q.processAllAvailable()
      val r1 = rows().filter(_._1 == 1L)
      assert(r1.find(_._2 == "a").get._4 === 4L)
      assert(r1.find(_._2 == "b").get._4 === 5L)
      assert(r1.map(_._5).sum === 1000000L && r1.map(_._6).sum === 1000000L)
      // streaming ≡ batch: the last emission equals temperatureMix on
      // the whole corpus
      val batch = graft.llm.TextOps.temperatureMix(
        Seq(("a", 4L), ("b", 1L), ("b", 4L)).toDF("source", "t"),
        "source", col("t"), 1000000)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      r1.foreach { case (_, src, nd, tk, ap, at) =>
        val b = batch.find(_._1 == src).get
        assert((nd, tk, ap, at) === ((b._2, b._3, b._4, b._5)))
      }
    } finally q.stop()
  }
}
