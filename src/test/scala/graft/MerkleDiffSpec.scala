package graft

import org.apache.spark.sql.functions._
import graft.operators.MerkleDiff

/** MerkleDiff: multiset diff semantics (including copy-count drift a
  * set anti-join cannot see), empty diff on identical replicas, and
  * the broadcast-semi-join drill-down plan.
  */
class MerkleDiffSpec extends SparkSpec {

  import spark.implicits._

  private val digest = MerkleDiff.rowDigest(Seq(col("id"), col("v")))

  test("modification, deletion, and copy-count drift all surface") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (4L, "d"))
      .toDF("id", "v")
    val other = Seq((1L, "a"), (2L, "B"), (4L, "d"), (5L, "e"))
      .toDF("id", "v")
    val got = MerkleDiff.diff(base, other, digest, Seq("id"), buckets = 8)
      .orderBy("id", "n_base")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (2L, 0L, 1L),   // (2,B) only in other (the modification)
      (2L, 1L, 0L),   // (2,b) only in base (modified away)
      (3L, 1L, 0L),   // deleted
      (4L, 2L, 1L),   // COPY-COUNT drift: {d,d} vs {d}
      (5L, 0L, 1L)))  // inserted
  }

  test("identical replicas diff to zero rows") {
    val t = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "v")
    assert(MerkleDiff.diff(t, t, digest, Seq("id"), buckets = 8)
      .count() === 0L)
  }

  test("bucket summary is order-independent and B-row bounded") {
    val t = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val s1 = MerkleDiff.bucketSummary(t, digest, 4).orderBy("bucket")
      .collect().toSeq
    val s2 = MerkleDiff
      .bucketSummary(t.orderBy(desc("id")).repartition(7), digest, 4)
      .orderBy("bucket").collect().toSeq
    assert(s1 === s2 && s1.size <= 4)
  }

  test("drill-down prunes via a broadcast semi-join on diverged buckets") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val other = Seq((1L, "a"), (2L, "B")).toDF("id", "v")
    val p = MerkleDiff.diff(base, other, digest, Seq("id"), buckets = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"semi-join prune missing:\n$p")
    assert(p.contains("Broadcast"), s"diverged list must broadcast:\n$p")
  }
}
