package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DocStream

/** X334 streaming KS monitor: batch 0 freezes the reference and scores
  * an exact 0 against itself, an identically-distributed batch stays
  * at 0, and a shape-shifted batch (same length, different distinct
  * ratio) trips the exact rational α=0.05 rejection.
  */
class StreamKsMonitorSpec extends SparkSpec {

  import spark.implicits._

  private val stop = Seq("the", "a", "of", "to", "in")

  test("reference freeze, null batch, and a rejected shift") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("ksmon-").toString
    val q = DocStream.ksMonitor(docs, s"$base/ref", s"$base/out", stop)
    def rows() = spark.read.parquet(s"$base/out")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq.sorted
    try {
      // ten identical-quality docs -> the frozen reference; KS vs
      // itself is exactly 0
      input.addData((0L until 10L).map(i => (i, "a b c d e")): _*)
      q.processAllAvailable()
      assert(rows() === Seq((0L, 10L, 10L, 0L, 0L, false)))
      // same distribution again -> still 0, no rejection
      input.addData((10L until 20L).map(i => (i, "a b c d e")): _*)
      q.processAllAvailable()
      assert(rows().last === ((1L, 10L, 10L, 0L, 0L, false)))
      // same length, collapsed vocabulary -> different quality value,
      // full separation: D_num = 10*10, ks = 1e6, and 10+10 has the
      // power to reject at 0.05 (1e10 >= 1844164*10*10*20)
      input.addData((20L until 30L).map(i => (i, "a a a a a")): _*)
      q.processAllAvailable()
      assert(rows().last === ((2L, 10L, 10L, 100L, 1000000L, true)))
    } finally q.stop()
  }
}
