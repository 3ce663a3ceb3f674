package graft

import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** X340 Chao1: hand-computed richness on a planted vocabulary (3
  * singletons, 1 doubleton -> 5 + 9//2 = 9) and the no-doubleton
  * bias-corrected fallback — via the same expressions the query
  * registers.
  */
class ChaoRichnessSpec extends SparkSpec {

  import spark.implicits._

  private def chao(docs: Seq[(String, String)]) =
    docs.toDF("source", "text")
      .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("s_obs"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("s_est",
        when(col("f2") > 0, col("s_obs") + expr("(f1 * f1) div (2 * f2)"))
          .otherwise(col("s_obs") + expr("(f1 * (f1 - 1)) div 2")))
      .withColumn("cov", expr("(s_obs * 1000000) div greatest(s_est, 1)"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("hand-computed Chao1 with doubletons and the fallback without") {
    val out = chao(Seq(
      // s1: a,b,c singletons; d twice; e thrice -> S=5, f1=3, f2=1
      ("s1", "a b c d d e e e"),
      // s2: two singletons, no doubletons -> fallback S + 2*1/2 = 4
      ("s2", "x y z z z")))
    assert(out("s1") === (("s1", 5L, 3L, 1L, 9L, 555555L)))
    assert(out("s2") === (("s2", 3L, 2L, 0L, 4L, 750000L)))
  }

  test("fully-saturated vocabulary estimates itself") {
    val out = chao(Seq(("s", "a a a b b b")))
    assert(out("s") === (("s", 2L, 0L, 0L, 2L, 1000000L)))
  }
}
