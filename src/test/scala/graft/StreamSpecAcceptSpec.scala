package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DocStream

/** X331 prequential acceptance: batch 0 emits the zero row (no draft
  * yet), each later batch scores strictly against the PREFIX draft
  * (test-then-train — the batch's own counts must not influence its
  * own score), and draft ties break lexicographically.
  */
class StreamSpecAcceptSpec extends SparkSpec {

  import spark.implicits._

  test("test-then-train ordering and prefix drafts, hand-computed") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("preq-").toString
    val q = DocStream.prequentialSpecAccept(docs, s"$base/counts",
      s"$base/out")
    def rows() = spark.read.parquet(s"$base/out")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    try {
      // batch 0: no draft exists -> zero row; its own bigrams must NOT
      // score themselves
      input.addData((0L, "a b a c"))
      q.processAllAvailable()
      assert(rows() === Seq((0L, 0L, 0L)))
      // prefix draft: a->b (tie a->b/a->c breaks to b), b->a.
      // batch 1 "a b c": (a,b) accepted, (b,c) rejected
      input.addData((1L, "a b c"))
      q.processAllAvailable()
      assert(rows() === Seq((0L, 0L, 0L), (1L, 2L, 1L)))
      // counts now hold (b,a):1 and (b,c):1 -> draft b->a (tie to a);
      // batch 2 "b c": (b,c) rejected
      input.addData((2L, "b c"))
      q.processAllAvailable()
      assert(rows() === Seq((0L, 0L, 0L), (1L, 2L, 1L), (2L, 1L, 0L)))
      // unseen prefixes are MISSES, not dropped trials: prevs x and y
      // never appeared, so both bigrams count with guess null ≠ w
      // (an inner draft join would report the biased (3, 0, 0))
      input.addData((3L, "x y z"))
      q.processAllAvailable()
      assert(rows() === Seq((0L, 0L, 0L), (1L, 2L, 1L), (2L, 1L, 0L),
        (3L, 2L, 0L)))
    } finally q.stop()
  }
}
