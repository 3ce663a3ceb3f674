package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomOps

/** Bloom-prefiltered anti-join: exactness vs the plain anti-join (the
  * identity the oracle row rests on), no-false-negatives, measured FPR
  * sanity, null routing, and the plan guarantee the operator exists for
  * (the clean branch reaches output with zero exchanges).
  */
class BloomOpsSpec extends SparkSpec {
  import spark.implicits._

  private def probeDf = (1L to 2000L).map(i => (i, s"key_$i")).toDF("id", "k")
  // every 3rd key is in the base → 666 members, 1334 survivors
  private def baseDf = (1L to 2000L).filter(_ % 3 == 0)
    .map(i => s"key_$i").toDF("k")

  test("bloomAntiJoin result set equals the plain left_anti join") {
    val got = BloomOps.bloomAntiJoin(probeDf, baseDf, "k")
      .select("id").as[Long].collect().sorted
    val want = probeDf.join(baseDf, Seq("k"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq)
    assert(got.length === 1334)
  }

  test("no false negatives: every base key tests maybe=true") {
    val bytes = BloomOps.buildFilterBytes(baseDf, "k")
    val missed = baseDf
      .filter(!BloomOps.mightContain(col("k"), bytes))
      .count()
    assert(missed === 0L, "a base key tested definitively-absent")
  }

  test("measured FPR on non-members stays near the configured bound") {
    val bytes = BloomOps.buildFilterBytes(baseDf, "k", fpp = 0.03)
    val nonMembers = probeDf.filter(col("id") % 3 =!= 0)
    val fp = nonMembers
      .filter(coalesce(BloomOps.mightContain(col("k"), bytes), lit(false)))
      .count()
    val rate = fp.toDouble / nonMembers.count()
    // 3× headroom over the configured 3%: catches a broken hash path
    // (which reads ~100%) without flaking on small-sample variance.
    assert(rate <= 0.09, f"false-positive rate $rate%.4f implausibly high")
  }

  test("NULL probe keys are emitted, matching anti-join semantics") {
    val probe = Seq((1L, Some("key_3")), (2L, Some("key_4")), (3L, None))
      .toDF("id", "k")
    val got = BloomOps.bloomAntiJoin(probe, baseDf, "k")
      .select("id").as[Long].collect().sorted
    // key_3 is a member (dropped); key_4 survives; NULL survives
    assert(got.toSeq === Seq(2L, 3L))
  }

  test("long keys work through the same expression") {
    val probe = (1L to 100L).toDF("k")
    val base = (1L to 100L).filter(_ % 10 == 0).toDF("k")
    val got = BloomOps.bloomAntiJoin(probe, base, "k")
      .as[Long].collect().sorted
    assert(got.length === 90)
    assert(!got.contains(50L))
  }

  // Parquet-backed frames for the plan tests: local relations constant-
  // fold the probe away at optimization time, which hides the plan
  // shapes these tests exist to pin.
  private val dir = "/root/testdata/sf0.001"
  private def docShas = graft.queries.Tables(spark, dir, "documents")
    .select(col("doc_id"), sha2(col("text"), 256).as("k"))
  private def baseShas = docShas.filter(col("doc_id") % 7 === 0).select("k")

  test("bloomAntiJoin over parquet equals the plain anti-join (executed paths)") {
    val got = BloomOps.bloomAntiJoin(docShas, baseShas, "k")
      .select("doc_id").as[Long].collect().sorted
    val want = docShas.join(baseShas, Seq("k"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
  }

  test("plan: the definitely-clean branch is a scan+filter with no exchange") {
    val bytes = BloomOps.buildFilterBytes(baseShas, "k")
    val clean = docShas.filter(
      !coalesce(BloomOps.mightContain(col("k"), bytes), lit(true)))
    val plan = clean.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"clean branch must not shuffle, got:\n$plan")
    assert(plan.contains("bloom_might_contain"),
      "clean branch should be gated by the bloom probe")
    // "*(n)" is the whole-stage-codegen marker in this plan rendering
    assert(plan.contains("*(1) Filter"),
      s"bloom probe fell out of codegen:\n$plan")
  }

  test("probe stays inside whole-stage codegen and keeps members") {
    val bytes = BloomOps.buildFilterBytes(baseShas, "k")
    val df = docShas.filter(BloomOps.mightContain(col("k"), bytes))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter"),
      s"bloom probe fell out of codegen:\n$plan")
    // every true member must pass the probe (no false negatives)
    assert(df.count() >= baseShas.count())
  }
}
