package graft

import org.apache.spark.sql.functions._

/** X339 deletion vectors: executed sidecar roundtrip on a planted
  * table — overlapping commits delete a row once, the merge-on-read
  * anti-join returns exactly the survivors, and the per-source
  * accounting law n_base = n_live + n_deleted holds.
  */
class DeletionVectorsSpec extends SparkSpec {

  import spark.implicits._

  test("overlapping commits, exact survivors, accounting law") {
    val base = java.nio.file.Files.createTempDirectory("dv-").toString
    val docs = (1L to 10L).map(i => (i, if (i <= 5) "s1" else "s2"))
      .toDF("doc_id", "source")
    docs.write.mode("overwrite").parquet(s"$base/base")
    // commit 1 deletes {2, 6}; commit 2 deletes {6, 9}: 6 overlaps
    Seq(2L, 6L).toDF("doc_id")
      .write.mode("overwrite").parquet(s"$base/dv/commit=1")
    Seq(6L, 9L).toDF("doc_id")
      .write.mode("overwrite").parquet(s"$base/dv/commit=2")
    val b = spark.read.parquet(s"$base/base")
    val dv = spark.read.parquet(s"$base/dv").select("doc_id").distinct()
    val live = b.join(dv, Seq("doc_id"), "left_anti")
    assert(live.select("doc_id").as[Long].collect().sorted
      === Array(1L, 3L, 4L, 5L, 7L, 8L, 10L))
    val acct = live.groupBy("source").agg(count(lit(1)).as("n_live"))
      .join(b.groupBy("source").agg(count(lit(1)).as("n_base")), "source")
      .join(b.join(dv, "doc_id").groupBy("source")
        .agg(count(lit(1)).as("n_deleted")), "source")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(acct("s1") === ((4L, 5L, 1L))) // deleted {2}
    assert(acct("s2") === ((3L, 5L, 2L))) // deleted {6, 9}, 6 ONCE
    assert(acct.values.forall { case (l, n, d) => n === l + d })
  }
}
