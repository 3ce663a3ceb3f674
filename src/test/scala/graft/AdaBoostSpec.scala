package graft

import org.apache.spark.sql.functions.col

import graft.operators.AdaBoost

/** X306 AdaBoost stumps: a hand-traced 3-round run (winner stump,
  * exact eps, micro-floored ln-pair vote weight, cross-multiplied
  * weight update driving round 2 to the uniform-error fixpoint), the
  * perfect-stump clamp path, feature tie-breaking, and the rounds
  * bound.
  */
class AdaBoostSpec extends SparkSpec {

  import spark.implicits._

  private val cols = Seq("fa", "fb")

  test("hand-traced rounds: winner, eps, alpha2, reweighting fixpoint") {
    // fa: bucket 0 = {2 pos, 1 neg}, bucket 1 = {1 pos, 2 neg};
    // fb constant 0 (useless: its best error is 3 > fa's 2)
    val rows = Seq(
      (0L, 0L, true), (0L, 0L, true), (0L, 0L, false),
      (1L, 0L, true), (1L, 0L, false), (1L, 0L, false))
      .toDF("fa", "fb", "y")
    val out = AdaBoost.trainStumps(rows, cols, col("y"), rounds = 3)
      .as[(Int, String, Long, String, Double, Long, Long)]
      .collect().toSeq
    // r1: err 2/6; alpha2 = floor(ln 4 * 1e6) - floor(ln 2 * 1e6)
    // r2: misclassified x4, correct x2 -> every cell weighs 4 ->
    //     every candidate errs 8/16 -> alpha2 = 0, ensemble frozen
    assert(out === Seq(
      (1, "fa", 0L, "le_pos", 0.333333, 693147L, 2L),
      (2, "fa", 0L, "le_pos", 0.5, 0L, 2L),
      (3, "fa", 0L, "le_pos", 0.5, 0L, 2L)))
  }

  test("a perfect stump clamps the ln-pair and freezes the weights") {
    // fa separates exactly: bucket 0 all pos, buckets 1,2 all neg
    val rows = Seq(
      (0L, 0L, true), (0L, 1L, true), (0L, 0L, true),
      (1L, 0L, false), (2L, 1L, false), (2L, 0L, false))
      .toDF("fa", "fb", "y")
    val out = AdaBoost.trainStumps(rows, cols, col("y"), rounds = 2)
      .as[(Int, String, Long, String, Double, Long, Long)]
      .collect().toSeq
    // err 0 -> weG clamps to 1, wcG = 6: alpha2 = floor(ln 6 * 1e6);
    // all rows correct -> weights scale by 1 -> round 2 re-picks it
    assert(out === Seq(
      (1, "fa", 0L, "le_pos", 0.0, 1791759L, 0L),
      (2, "fa", 0L, "le_pos", 0.0, 1791759L, 0L)))
  }

  test("rounds outside [1, 6] are rejected") {
    val rows = Seq((0L, 0L, true)).toDF("fa", "fb", "y")
    intercept[IllegalArgumentException] {
      AdaBoost.trainStumps(rows, cols, col("y"), rounds = 7)
    }
  }
}
