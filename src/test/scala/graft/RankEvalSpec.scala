package graft

import org.apache.spark.sql.functions._
import graft.llm.FeatureOps

/** Hand-checked semantics for X257 rankEval — exact ROC-AUC (doubled-rank
  * Mann–Whitney identity), step-wise average precision with micro-floored
  * per-threshold precision, and the decile operating points.
  */
class RankEvalSpec extends SparkSpec {

  import spark.implicits._

  private def eval(rows: Seq[(Long, Boolean)]) =
    FeatureOps.rankEval(rows.toDF("bin", "pos"), "bin", col("pos"))
      .select("measure", "num", "den", "value")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("perfect separation: AUC and AP exactly 1") {
    // bins 1..4, positives are the top two — no inversions, no ties
    val m = eval(Seq((4L, true), (3L, true), (2L, false), (1L, false)))
    assert(m("auc")._2 === m("auc")._3) // u1_x2 = 2·n1·n0 = 8
    assert(m("auc")._4 === 1.0)
    assert(m("ap")._2 === 1000000L && m("ap")._4 === 1.0)
    assert(m("n_pos")._2 === 2L && m("n_neg")._2 === 2L)
  }

  test("reversed separation: AUC exactly 0, AP = worst-case") {
    val m = eval(Seq((4L, false), (3L, false), (2L, true), (1L, true)))
    assert(m("auc")._2 === 0L && m("auc")._4 === 0.0)
    // thresholds desc: prec at bin2 = 1/3, at bin1 = 2/4; AP =
    // (333333 + 500000) div 2 = 416666 — hand-replay of the micro floor
    assert(m("ap")._2 === 416666L)
  }

  test("all-tied scores: AUC exactly 1/2, AP = prevalence") {
    // one bin holds everything: midranks make AUC exactly half, and the
    // single threshold's precision is the positive rate
    val m = eval(Seq((7L, true), (7L, false), (7L, false), (7L, false)))
    // u1_x2 = n1·n0 (midrank identity) → auc = 1/2 exactly
    assert(m("auc")._2 * 2 === m("auc")._3)
    assert(m("auc")._4 === 0.5)
    assert(m("ap")._2 === 250000L)
  }

  test("hand-computed two-bin tie case") {
    // (bin2: 1 pos 1 neg), (bin1: 1 pos 1 neg): by symmetry AUC = 1/2;
    // r1_x2 = 1·(2·0+2+1) + 1·(2·2+2+1) = 10, u1_x2 = 10 − 2·3 = 4,
    // den = 2·2·2 = 8
    val m = eval(Seq((2L, true), (2L, false), (1L, true), (1L, false)))
    assert(m("auc")._2 === 4L && m("auc")._3 === 8L && m("auc")._4 === 0.5)
    // prec(≥2) = 500000, prec(≥1) = 500000 → AP = 500000
    assert(m("ap")._2 === 500000L)
  }

  test("decile operating points: exact TPR/FPR on 10 distinct bins") {
    // bins 10..1, positives are bins 10..6 (top half)
    val rows = (1 to 10).map(b => (b.toLong, b >= 6))
    val m = eval(rows)
    // j=3: threshold = bin 8 (top 3 rows), all positive
    assert(m("tpr_3")._2 === 3L && m("tpr_3")._4 === 0.6)
    assert(m("fpr_3")._2 === 0L && m("fpr_3")._4 === 0.0)
    // j=5: top 5 rows = exactly the positives
    assert(m("tpr_5")._4 === 1.0 && m("fpr_5")._4 === 0.0)
    // j=9: top 9 rows: 5 pos + 4 neg
    assert(m("tpr_9")._2 === 5L && m("fpr_9")._2 === 4L
      && m("fpr_9")._4 === 0.8)
  }

  test("AUC invariant under a monotone bin transform") {
    val rows = Seq((9L, true), (5L, false), (5L, true), (2L, false),
      (1L, false), (12L, true))
    val a = eval(rows)
    val b = eval(rows.map { case (bin, p) => (bin * 7 + 3, p) })
    assert(a("auc") === b("auc") && a("ap") === b("ap"))
    (1 to 9).foreach { j =>
      assert(a(s"tpr_$j") === b(s"tpr_$j") && a(s"fpr_$j") === b(s"fpr_$j"))
    }
  }
}
