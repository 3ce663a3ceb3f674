package graft

import org.apache.spark.sql.functions._
import graft.llm.{EventOps, TextOps}

/** Hand-checked semantics for the round-10 wave-11 ops: leave-one-
  * source-out data valuation and the Simpson's-paradox audit.
  */
class AblationSimpsonSpec extends SparkSpec {

  import spark.implicits._

  test("sourceAblation: full row is the zero baseline; signal source " +
    "hurts when removed, train-only polluter helps") {
    // replay the operator's own md5 split to place the polluter ONLY
    // on train-resident ids: its junk vocabulary then never appears
    // held-out, so removing it can only sharpen the model
    val heldOf = (0L until 200L).map { i =>
      val h = java.lang.Integer.parseInt(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"abl|$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(4), 16)
      i -> (h % 10 == 9)
    }.toMap
    val trainIds = (0L until 200L).filterNot(heldOf)
    assert((0L until 200L).count(heldOf) >= 5, "need held-out docs")
    val junkIds = trainIds.take(20).toSet
    val docs = (0L until 200L).filterNot(junkIds).map(i =>
      (i, "good", "alpha beta gamma delta")) ++
      junkIds.toSeq.sorted.map(i => (i, "junk", "zz1 zz2 zz3 zz4"))
    val got = TextOps.sourceAblation(docs.toDF("doc_id", "source", "text"),
      "doc_id", "source", "text", buckets = 64, salt = "abl")
      .select("scenario", "n_train_tokens", "n_removed_tokens",
        "xent_micro", "delta_micro")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("__FULL__", "good", "junk"))
    val full = got("__FULL__")
    assert(full._3 === 0L && full._5 === 0L)
    assert(got.values.forall(r => r._2 + r._3 === full._2))
    // every held-out token is 'good' vocabulary: removing good must
    // cost cross-entropy; removing the train-only polluter only
    // shrinks the denominator, so it must strictly HELP
    assert(got("good")._5 > 0L, s"good: ${got("good")}")
    assert(got("junk")._5 < 0L, s"junk: ${got("junk")}")
  }

  test("simpsonAudit: textbook composition reversal fires exactly") {
    // both strata favor arm A (even users); pooled favors B because A's
    // traffic concentrates in the low-value stratum
    def rows(g: Int, arm: Int, n: Int, v: Double) =
      (0 until n).map(i => (2L * i + arm, "m", g, v))
    val ev = (rows(1, 0, 10, 90.0) ++ rows(1, 1, 90, 80.0) ++
      rows(2, 0, 90, 20.0) ++ rows(2, 1, 10, 10.0))
      .toDF("user_id", "event_type", "g", "value")
    val got = EventOps.simpsonAudit(ev, "user_id", "event_type",
      col("g"), "value")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length === 1)
    val (m, overall, nStrata, favA, favB, rev) = got.head
    assert(m === "m" && nStrata === 2L && favA === 2L && favB === 0L)
    // pooled: nb·sa − na·sb = 100·2700e6 − 100·7300e6 = −4.6e11
    assert(overall === -460000000000L)
    assert(rev)
  }

  test("simpsonAudit: aligned strata do not fire") {
    def rows(g: Int, arm: Int, n: Int, v: Double) =
      (0 until n).map(i => (2L * i + arm, "m", g, v))
    val ev = (rows(1, 0, 10, 90.0) ++ rows(1, 1, 10, 80.0) ++
      rows(2, 0, 10, 20.0) ++ rows(2, 1, 10, 10.0))
      .toDF("user_id", "event_type", "g", "value")
    val got = EventOps.simpsonAudit(ev, "user_id", "event_type",
      col("g"), "value")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().head
    assert(got._2 > 0L && got._4 === 2L && !got._6)
  }
}
