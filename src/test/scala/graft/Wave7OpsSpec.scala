package graft

import org.apache.spark.sql.functions._
import graft.llm.FeatureOps
import graft.operators.Expectations
import graft.sources.SchemaDrift

/** Hand-checked semantics for the round-8 wave-7 governance ops:
  * expectation-suite audit, WOE/IV binning, DP noised release, and the
  * schema-drift audit.
  */
class Wave7OpsSpec extends SparkSpec {

  import spark.implicits._

  test("Expectations.audit: predicate counts, uniqueness, null-safety") {
    val df = Seq(
      (1L, Some(5.0), "A"), (2L, Some(-1.0), "A"), (2L, Some(3.0), "B"),
      (3L, None, "X"), (4L, Some(2.0), "A"))
      .toDF("id", "v", "flag")
    val got = Expectations.audit(df,
      violations = Seq(
        "v_negative" -> (col("v") < 0),
        "v_not_null" -> col("v").isNull,
        "flag_domain" -> !col("flag").isin("A", "B")),
      uniqueContracts = Seq("id_unique" -> Seq("id")))
      .orderBy("check")
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      ("flag_domain", 5L, 1L, 0.2, false),
      // the None row's null predicate is NOT a violation (null-safety)
      ("id_unique", 5L, 1L, 0.2, false),
      ("v_negative", 5L, 1L, 0.2, false),
      ("v_not_null", 5L, 1L, 0.2, false)))
  }

  test("Expectations.audit: all-pass contract") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val got = Expectations.audit(df,
      violations = Seq("v_neg" -> (col("v") < 0)),
      uniqueContracts = Seq("id_uq" -> Seq("id")))
      .select("pass").as[Boolean].collect().toSeq
    assert(got === Seq(true, true))
  }

  test("woeIv: planted separation lands in the right bins") {
    // 100 good at value 1..100, 100 bad at value 201..300 with 4 bins:
    // bins 1-2 all good, bins 3-4 all bad; WOE sign must flip
    val df = ((1 to 100).map(i => (i.toDouble, false))
      ++ (1 to 100).map(i => (200.0 + i, true)))
      .toDF("f", "bad")
    val got = FeatureOps.woeIv(df, "f", col("bad"), bins = 4)
      .orderBy("bin")
      .select("bin", "n", "n_bad", "woe")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(1, 2, 3, 4))
    assert(got.map(_._2).sum === 200L)
    assert(got.take(2).forall(_._3 === 0L))
    assert(got.drop(2).forall(r => r._3 === r._2)) // all bad
    assert(got.take(2).forall(_._4 > 4.0)) // strongly good bins
    assert(got.drop(2).forall(_._4 < -4.0)) // strongly bad bins
  }

  test("woeIv: value ties share a bin") {
    // one massive point mass: every row value 7 → all rows in ONE bin
    val df = (1 to 50).map(_ => (7.0, false)).toDF("f", "bad")
    val got = FeatureOps.woeIv(df, "f", col("bad"), bins = 5)
      .select("bin", "n").as[(Int, Long)].collect().toSeq
    assert(got === Seq((1, 50L)))
  }

  test("dpNoisedCounts: deterministic, salt-sensitive, near-true") {
    val df = (1 to 300).map(i => (s"g${i % 3}", i)).toDF("g", "x")
    val r1 = FeatureOps.dpNoisedCounts(df, Seq("g"), epsilon = 1.0,
      salt = "e1").orderBy("g").as[(String, Long, Double)].collect().toSeq
    val r2 = FeatureOps.dpNoisedCounts(df, Seq("g"), epsilon = 1.0,
      salt = "e1").orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(r1 === r2) // same epoch salt → identical release
    assert(r1.map(_._2) === Seq(100L, 100L, 100L))
    // Laplace(1) noise: |noise| < 15 with overwhelming margin
    assert(r1.forall(r => math.abs(r._3 - r._2) < 15.0))
    val r3 = FeatureOps.dpNoisedCounts(df, Seq("g"), epsilon = 1.0,
      salt = "e2").orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(r3.map(_._3) !== r1.map(_._3)) // new epoch → fresh draws
  }

  test("SchemaDrift.drift: added/removed/type_changed/unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("w7-drift-").toString
    Seq((1L, 1, "x")).toDF("id", "a", "b")
      .write.mode("overwrite").parquet(s"$dir/v1")
    Seq((1L, 2L, true)).toDF("id", "a", "c")
      .write.mode("overwrite").parquet(s"$dir/v2")
    val got = SchemaDrift.drift(spark, s"$dir/v1", s"$dir/v2")
      .as[(String, String)].collect().toSeq
    assert(got === Seq(("a", "type_changed"), ("b", "removed"),
      ("c", "added"), ("id", "unchanged")))
  }
}
