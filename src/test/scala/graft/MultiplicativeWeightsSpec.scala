package graft

import graft.operators.MultiplicativeWeights

/** X322 MW/Hedge mixture schedule: hand-computed two-group dynamics
  * (shares concentrate exponentially on the lossy group, never zeroing
  * the easy one) and the loss clamp that keeps compounding in Long.
  */
class MultiplicativeWeightsSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed two-group schedule concentrates on the lossy group") {
    val losses = Seq(("a", 0L), ("b", 1000000L)).toDF("group", "loss_micro")
    val out = MultiplicativeWeights
      .schedule(losses, rounds = 5, etaPermille = 500L)
      .as[(Long, String, Long)].collect().toSet
    // mult: a 1.0, b 1.5 -> w_b = 1.5^r, shares floored on the micro
    // grid; a keeps a nonzero floor share at every round.
    assert(out === Set(
      (0L, "a", 500000L), (0L, "b", 500000L),
      (1L, "a", 400000L), (1L, "b", 600000L),
      (2L, "a", 307692L), (2L, "b", 692307L),
      (3L, "a", 228571L), (3L, "b", 771428L),
      (4L, "a", 164948L), (4L, "b", 835051L),
      (5L, "a", 116363L), (5L, "b", 883636L)))
  }

  test("losses clamp to the micro grid: 5e6 behaves exactly like 1e6") {
    val big = Seq(("a", 0L), ("b", 5000000L)).toDF("group", "loss_micro")
    val ref = Seq(("a", 0L), ("b", 1000000L)).toDF("group", "loss_micro")
    val run = (df: org.apache.spark.sql.DataFrame) => MultiplicativeWeights
      .schedule(df, rounds = 3, etaPermille = 500L)
      .as[(Long, String, Long)].collect().toSet
    assert(run(big) === run(ref))
  }
}
