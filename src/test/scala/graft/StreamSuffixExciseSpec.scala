package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DocStream

/** X287 streaming excision maintenance: retroactive flag emission when a
  * later batch duplicates an earlier gram, and the exactly-once property
  * (a position is emitted only on its gram's unique→duplicated flip).
  */
class StreamSuffixExciseSpec extends SparkSpec {

  import spark.implicits._

  test("retro emission fires once; established dups never re-emit") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("excise-").toString
    val q = DocStream.exciseWithGrowingPostings(docs, s"$base/post",
      s"$base/flags", spanTokens = 3)
    def flags() = spark.read.parquet(s"$base/flags")
      .as[(Long, Int)].collect().toSeq
    try {
      // batch 0: no duplicate grams anywhere -> zero flags
      input.addData((0L, "a b c x y z"), (1L, "p q r s"))
      q.processAllAvailable()
      assert(flags().isEmpty)
      // batch 1: doc 2 re-uses the "a b c" gram -> the NEW position
      // (doc 2 pos 2) AND the RETRO position (doc 0 pos 1) both emit
      input.addData((2L, "k a b c m"))
      q.processAllAvailable()
      assert(flags().sorted === Seq((0L, 1), (2L, 2)))
      // batch 2: a third copy -> only the new position emits (the two
      // established ones must NOT re-emit: prior count is already 2)
      input.addData((3L, "a b c"))
      q.processAllAvailable()
      assert(flags().sorted === Seq((0L, 1), (2L, 2), (3L, 1)))
    } finally q.stop()
  }

  test("within-batch duplication flags both copies immediately") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("excise-").toString
    val q = DocStream.exciseWithGrowingPostings(docs, s"$base/post",
      s"$base/flags", spanTokens = 3)
    try {
      input.addData((10L, "u v w"), (11L, "t u v w"))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$base/flags")
        .as[(Long, Int)].collect().toSeq.sorted
      assert(got === Seq((10L, 1), (11L, 2)))
    } finally q.stop()
  }
}
