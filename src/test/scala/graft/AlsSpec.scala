package graft

import graft.llm.AlsOps

/** X298 rank-2 ALS: planted two-block taste structure is recovered
  * (a user's strong block outranks their weak cross rating), the
  * regularized solve never divides by zero on degenerate users, and
  * the fit is deterministic.
  */
class AlsSpec extends SparkSpec {

  import spark.implicits._

  private def blockRatings() = {
    val a = for (u <- 1L to 5L; i <- 101L to 105L) yield (u, i, 10L)
    val b = for (u <- 6L to 10L; i <- 201L to 205L) yield (u, i, 10L)
    // user 1 once touched a B item: the model must still rank their
    // A items above it
    (a ++ b :+ ((1L, 201L, 1L))).toDF("cust", "item", "r")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    AlsOps.alsFactors(df, "cust", "item", "r", rounds = 2,
        lambdaMilli2 = 100000L, topUsers = 20)
      .select("cust", "n_items", "f1_milli", "f2_milli", "top_item",
        "top_score_milli2")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)

  test("planted blocks: the strong block wins the top slot") {
    val got = run(blockRatings())
    val u1 = got.find(_._1 == 1L).get
    assert((101L to 105L).contains(u1._5),
      s"user 1 top item ${u1._5} is not in their strong block")
    // every pure-block user's top item is inside their block
    got.filter(r => r._1 >= 2 && r._1 <= 5).foreach(r =>
      assert((101L to 105L).contains(r._5), r.toString))
    got.filter(_._1 >= 6).foreach(r =>
      assert((201L to 205L).contains(r._5), r.toString))
  }

  test("single-rating user solves through the regularizer, no blowup") {
    val got = run(Seq((1L, 7L, 3L), (2L, 7L, 3L), (2L, 8L, 1L))
      .toDF("cust", "item", "r"))
    assert(got.length === 2)
    got.foreach { r =>
      assert(math.abs(r._3) < 100000L && math.abs(r._4) < 100000L,
        s"factor blowup: $r")
    }
  }

  test("deterministic: two fits are identical") {
    def fit() = run(blockRatings()).toSeq
    assert(fit() === fit())
  }
}
