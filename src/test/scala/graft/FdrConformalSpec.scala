package graft

import org.apache.spark.sql.functions._
import graft.llm.{EventOps, FeatureOps}

/** Hand-checked semantics for the round-10 wave-7 inference ops:
  * one-pass permutation-test panel with BH-FDR, and Mondrian split
  * conformal intervals.
  */
class FdrConformalSpec extends SparkSpec {

  import spark.implicits._

  test("permutationFdr: separable planted effect rejects, exact T_obs") {
    // metric "a": arm 1 (odd users) always 100, arm 0 always 0 — the
    // strongest possible assignment alignment; metric "b": constant
    // (every permutation statistic is 0, p = 64/64)
    val rows =
      (0 until 100).map(u => (u.toLong, "a", if (u % 2 == 1) 100.0 else 0.0)) ++
      (0 until 100).map(u => (u.toLong, "b", 7.0))
    val df = rows.toDF("user_id", "event_type", "value")
    val got = EventOps.permutationFdr(df, "user_id", "event_type", "value",
      perms = 63)
      .select("metric", "t_obs", "p_num", "bh_rank", "reject")
      .as[(String, Long, Long, Int, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // T_obs = |n_b·S_a − n_a·S_b| = |50·0 − 50·(50·100·10⁶)| = 2.5e11
    assert(got("a")._2 === 250000000000L)
    // a relabeling ties the planted split only if md5 parity reproduces
    // it on all 100 users — allow the tie but require near-minimal p
    assert(got("a")._3 <= 2 && got("a")._5,
      s"planted effect not rejected: ${got("a")}")
    // constant metric: T_b = 0 = T_obs for every b → p = 64/64, keep
    assert(got("b")._2 === 0L && got("b")._3 === 64L && !got("b")._5)
    assert(got("a")._4 === 1 && got("b")._4 === 2)
  }

  test("permutationFdr: BH step-up rejects a prefix of the p-ranking") {
    val rows = (0 until 60).flatMap(u => Seq(
      (u.toLong, "strong", if (u % 2 == 1) 50.0 else 0.0),
      (u.toLong, "noise", (u % 7).toDouble)))
    val got = EventOps.permutationFdr(rows.toDF("user_id", "event_type",
      "value"), "user_id", "event_type", "value", perms = 63)
      .select("bh_rank", "reject").as[(Int, Boolean)].collect().sortBy(_._1)
    // rejection region is ranks ≤ k*: no rejected rank after a kept one
    val firstKeep = got.indexWhere(!_._2)
    if (firstKeep >= 0)
      assert(got.drop(firstKeep).forall(!_._2), got.mkString(","))
  }

  test("conformalInterval: constant values give zero radius, full coverage") {
    val df = (0 until 400).map(i => ("g", i.toLong, 42.0))
      .toDF("grp", "id", "value")
    val got = FeatureOps.conformalInterval(df, "grp", "id", "value",
      alphaPct = 10, salt = "t")
      .select("n_cal", "pred_cents", "qhat_cents", "n_test", "n_covered",
        "coverage")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length === 1)
    val (nCal, pred, q, nTest, nCov, cov) = got.head
    assert(nCal + nTest === 400L)
    assert(pred === 4200L && q === 0L && nCov === nTest && cov === 1.0)
  }

  test("conformalInterval: order statistics match a brute-force replay") {
    val df = (0 until 500).map(i => ("g", i.toLong, i.toDouble / 7.0))
      .toDF("grp", "id", "value")
    val got = FeatureOps.conformalInterval(df, "grp", "id", "value",
      alphaPct = 10, salt = "t2")
      .select("n_cal", "pred_cents", "qhat_cents", "n_test", "n_covered")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // replay the md5 split with the operator's own expression, then
    // compute every order statistic by brute force in memory
    val calIds = df.select(col("id"),
        (conv(substring(md5(concat(lit("t2|"), col("id").cast("string"))),
          1, 4), 16, 10).cast("int") % 2 === 0).as("cal"))
      .as[(Long, Boolean)].collect().filter(_._2).map(_._1).toSet
    val cents = (0 until 500).map(i => i.toLong -> math.floor(i / 7.0 * 100 + 0.5).toLong).toMap
    val cal = calIds.toSeq.map(cents).sorted
    val n = cal.length
    val pred = cal((n + 1) / 2 - 1)
    val res = cal.map(v => math.abs(v - pred)).sorted
    val k = ((n + 1) * 90 + 99) / 100
    val qhat = res(k - 1)
    val test = (0L until 500L).filterNot(calIds).map(cents)
    val covered = test.count(v => math.abs(v - pred) <= qhat)
    assert(got === ((n.toLong, pred, qhat, test.size.toLong,
      covered.toLong)))
  }
}
