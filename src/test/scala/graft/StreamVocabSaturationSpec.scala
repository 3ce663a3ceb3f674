package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DocStream

/** X341 vocabulary-saturation monitor: hand-computed cumulative Chao1
  * rows across three batches — the estimate tightens as singletons
  * get re-observed, and the emitted row always reflects the state
  * INCLUDING the batch (merge-then-emit-then-train ordering).
  */
class StreamVocabSaturationSpec extends SparkSpec {

  import spark.implicits._

  test("cumulative Chao1 tightens as singletons are re-observed") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("vocab-").toString
    val q = DocStream.vocabSaturationMonitor(docs, s"$base/counts",
      s"$base/out")
    def rows() = spark.read.parquet(s"$base/out")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    try {
      // a,b,c singletons; d doubleton; e tripleton -> 5 + 9//2 = 9
      input.addData((0L, "a b c d d e e e"))
      q.processAllAvailable()
      assert(rows() === Seq((0L, 5L, 3L, 1L, 9L, 555555L)))
      // + "a b x": a2 b2 c1 d2 e3 x1 -> f1=2, f2=3 -> 6 + 4//6 = 6
      input.addData((1L, "a b x"))
      q.processAllAvailable()
      assert(rows().last === ((1L, 6L, 2L, 3L, 6L, 1000000L)))
      // + "c x": every word seen twice+ -> f1=0 -> saturated at 6
      input.addData((2L, "c x"))
      q.processAllAvailable()
      assert(rows().last === ((2L, 6L, 0L, 5L, 6L, 1000000L)))
    } finally q.stop()
  }
}
