package graft

import org.apache.spark.sql.functions._
import graft.llm.{FeatureOps, TextOps}
import graft.operators.Sampling

/** Hand-checked semantics for the round-8 wave-8 corpus-curation ops:
  * weighted bottom-k sampling, quantile normalization, n-gram novelty,
  * and vocabulary JSD drift.
  */
class Wave8OpsSpec extends SparkSpec {

  import spark.implicits._

  test("weightedBottomK: heavier items oversample, membership is a " +
    "pure function") {
    // one stratum: ids 0..199, weight 32 for ids < 20, weight 1 rest.
    // P(min-of-32 < min-of-1) — heavy items should crowd the bottom-k.
    val df = (0 until 200).map(i => (i.toLong, "s",
      if (i < 20) 32L else 1L)).toDF("id", "cls", "w")
    val got = Sampling.weightedBottomK(df, "cls", "id", "w", k = 10,
      salt = "t1")
      .select("id").as[Long].collect().toSet
    val heavy = got.count(_ < 20)
    // 20 heavy items hold 640 of 820 total draws — expect most of top-10
    assert(heavy >= 6, s"only $heavy heavy ids in sample $got")
    val again = Sampling.weightedBottomK(df, "cls", "id", "w", k = 10,
      salt = "t1").select("id").as[Long].collect().toSet
    assert(again === got)
  }

  test("weightedBottomK: two-phase rank equals the plain rank") {
    val df = (0 until 300).map(i => (i.toLong, s"c${i % 3}",
      (i % 7 + 1).toLong)).toDF("id", "cls", "w")
    val twoPhase = Sampling.weightedBottomK(df, "cls", "id", "w", k = 4,
      salt = "t2")
      .select("cls", "rank", "id").as[(String, Int, Long)].collect().toSet
    // plain spelling: same key, single global rank per stratum
    val key = array_min(transform(sequence(lit(1L),
      least(greatest(col("w"), lit(1L)), lit(32L))),
      j => conv(substring(md5(concat(lit("t2|"), col("id").cast("string"),
        lit("|"), j.cast("string"))), 1, 12), 16, 10).cast("long")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cls")
      .orderBy(col("_k"), col("id"))
    val plain = df.withColumn("_k", key)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .select("cls", "rank", "id").as[(String, Int, Long)].collect().toSet
    assert(twoPhase === plain)
  }

  test("quantileNormalize: mid-rank hand values and tie sharing") {
    // values 1,2,2,3 → micro ranks: 1→(0+0.5)/4=0.125 ; 2→(1+1)/4=0.5 ;
    // 3→(3+0.5)/4=0.875 ; the two 2s share one qnorm
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 2.0), (4L, 3.0))
      .toDF("id", "v")
    val got = FeatureOps.quantileNormalize(df, "id", "v")
      .orderBy("id").select("id", "qnorm")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 0.125), (2L, 0.5), (3L, 0.5), (4L, 0.875)))
  }

  test("noveltyRate: planted overlap fractions") {
    // ref: "a b c d" → shingles {a b c, b c d}
    // cand 1: "a b c x" → {a b c, b c x} → 1 novel of 2
    // cand 2: "p q r s" → all novel (2 of 2)
    // cand 3: "a b" → no 3-gram shingles → drops
    val ref = Seq((10L, "a b c d")).toDF("doc_id", "text")
    val cand = Seq((1L, "a b c x"), (2L, "p q r s"), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = TextOps.noveltyRate(cand, ref, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L, 0.5), (2L, 2L, 2L, 1.0)))
  }

  test("vocabJsd: identical halves → zero; one-sided term → ½p·ln2") {
    val a = Seq("x y", "x z").toDF("text")
    assert(TextOps.vocabJsd(a, a, "text")
      .select("jsd_nano").as[Long].collect().forall(_ === 0L))
    // b has an extra 'only' term: p=0, q=1/5 → contrib ½·0.2·ln2 for it
    val b = Seq("x y only", "x z").toDF("text")
    val gotB = TextOps.vocabJsd(a, b, "text").orderBy("term")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    val expOnly = math.floor(0.5 * 0.2 * math.log(2.0) * 1e9 + 0.5).toLong
    assert(gotB("only") === expOnly)
    // mass conservation sanity: every contribution non-negative
    assert(gotB.values.forall(_ >= 0L))
  }
}
