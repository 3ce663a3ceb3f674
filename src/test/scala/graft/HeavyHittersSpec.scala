package graft

import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Sketch-guided heavy hitters: exactness vs the brute-force wordcount
  * (the identity the oracle row rests on), collision robustness at a
  * deliberately tiny sketch, and threshold boundary behavior.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 60 "hot" tokens, 200 singletons, 10 of a mid word → total 270 tokens
  private def corpus = Seq(
    ("hot " * 60).trim,
    (1 to 200).map(i => s"rare$i").mkString(" "),
    ("mid " * 10).trim
  ).toDF("text")

  private def brute(support: Long) = {
    val t = corpus.select(explode(split(col("text"), " ")).as("w"))
    val total = t.count()
    val thr = math.max(1L, total * support / 1000000L)
    t.groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr)
      .select(col("w").as("word"), col("n"))
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long)].collect().toMap

  test("equals the brute-force wordcount at several supports") {
    for (ppm <- Seq(30000L, 100000L, 300000L)) {
      val got = asMap(TextOps.heavyHitters(corpus, "text", ppm))
      val want = asMap(brute(ppm))
      assert(got === want, s"mismatch at supportPpm=$ppm")
    }
    // sanity on the data: T=8 → hot + mid; T=27 → hot only; T=81 → none
    assert(asMap(brute(30000L)).keySet === Set("hot", "mid"))
    assert(asMap(brute(100000L)).keySet === Set("hot"))
    assert(asMap(brute(300000L)).keySet === Set.empty[String])
  }

  test("a colliding sketch (width 2, depth 1) still returns the exact answer") {
    // every word collides into 2 buckets → almost everything becomes a
    // candidate; the exact confirmation pass must still filter precisely
    val got = asMap(TextOps.heavyHitters(corpus, "text", 30000L,
      depth = 1, width0 = 2))
    assert(got === asMap(brute(30000L)))
  }

  test("word exactly at the threshold is kept") {
    // total 270 → supportPpm 37038 gives T = floor(270*0.037038) = 10 = mid's count
    val got = asMap(TextOps.heavyHitters(corpus, "text", 37038L))
    assert(got.contains("mid") && got("mid") === 10L)
  }

  test("sketch aggregate is bounded: candidate shuffle excludes the long tail") {
    // none of the 200 singleton words may reach the exact aggregation
    val t = corpus.select(explode(split(col("text"), " ")).as("w"))
    val got = asMap(TextOps.heavyHitters(corpus, "text", 30000L))
    assert(!got.keySet.exists(_.startsWith("rare")))
    assert(got.values.forall(_ >= 8L))
    assert(t.count() === 270L)
  }
}
