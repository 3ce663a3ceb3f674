package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X328 histogram join estimate: a hand-computed bucket table where
  * the containment assumption is exactly right in one bucket and
  * exactly wrong in another (disjoint keys sharing a bucket), so the
  * audit shows both the estimate's power and its lie.
  */
class HistJoinEstimateSpec extends SparkSpec {

  import spark.implicits._

  private def estimate(o: DataFrame, l: DataFrame) = {
    val wdt = o.agg(max("k").as("m1")).crossJoin(l.agg(max("k").as("m2")))
      .select(expr("greatest(m1, m2) div 32 + 1").as("w"))
    def hist(t: DataFrame, n: String, d: String) =
      t.crossJoin(broadcast(wdt))
        .groupBy(expr("k div w").as("bucket"))
        .agg(count(lit(1)).as(n), countDistinct("k").as(d))
    val h = hist(o, "n1", "d1")
      .join(hist(l, "n2", "d2"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("d1"), lit(0L)).as("d1"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        coalesce(col("d2"), lit(0L)).as("d2"))
      .withColumn("est_b",
        expr("(n1 * n2) div greatest(greatest(d1, d2), 1)"))
    val tot = h.agg(sum("est_b").as("est_total"))
    val tru = o.groupBy("k").agg(count(lit(1)).as("c1"))
      .join(l.groupBy("k").agg(count(lit(1)).as("c2")), "k")
      .agg(sum(expr("c1 * c2")).as("truth"))
    h.crossJoin(broadcast(tot)).crossJoin(broadcast(tru))
      .select(col("bucket"), col("n1"), col("d1"), col("n2"), col("d2"),
        col("est_b"), col("est_total"), col("truth"),
        expr("((est_total - truth) * 1000000) div truth").as("err_micro"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
  }

  test("containment right in one bucket, lying in another") {
    // max key 40 -> width 2. Bucket 0: o{1}, l{1 x10} -> est 10 =
    // truth. Bucket 2: o{5}, l{4 x4} share the bucket but NOT the key
    // -> est 4 vs truth 0: the uniformity lie the audit exists to show.
    val o = Seq(1L, 2L, 5L, 40L).toDF("k")
    val l = (Seq.fill(10)(1L) ++ Seq.fill(4)(4L)).toDF("k")
    val out = estimate(o, l)
    assert(out === Seq(
      (0L, 1L, 1L, 10L, 1L, 10L, 14L, 10L, 400000L),
      (1L, 1L, 1L, 0L, 0L, 0L, 14L, 10L, 400000L),
      (2L, 1L, 1L, 4L, 1L, 4L, 14L, 10L, 400000L),
      (20L, 1L, 1L, 0L, 0L, 0L, 14L, 10L, 400000L)))
  }

  test("unique-key uniform join estimates exactly") {
    val o = (1L to 8L).toDF("k")
    val l = ((1L to 8L) ++ (1L to 8L)).toDF("k")
    val out = estimate(o, l)
    assert(out.map(_._6).sum === 16L)
    assert(out.forall(r => r._7 === 16L && r._8 === 16L && r._9 === 0L))
  }
}
