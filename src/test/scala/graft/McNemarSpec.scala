package graft

import org.apache.spark.sql.functions._

/** X338 McNemar: the exact rational chi-square-1 decision on planted
  * disagreement cells — one-sided dominance rejects, a small mixed
  * disagreement does not, and zero disagreement degenerates safely —
  * via the same aggregation the query registers.
  */
class McNemarSpec extends SparkSpec {

  import spark.implicits._

  private def mc(pairs: Seq[(Boolean, Boolean)]) =
    pairs.toDF("a_ok", "b_ok")
      .agg(count(lit(1)).as("n"),
        sum(when(col("a_ok") && !col("b_ok"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("a_ok") && col("b_ok"), 1L).otherwise(0L)).as("n_c"))
      .select(col("n"), col("n_b"), col("n_c"),
        when(col("n_b") + col("n_c") > 0,
          expr("((n_b - n_c) * (n_b - n_c) * 1000000) div (n_b + n_c)"))
          .otherwise(lit(0L)).as("chi2"),
        (col("n_b") + col("n_c") > 0 &&
          expr("(n_b - n_c) * (n_b - n_c) * 10000")
            >= expr("38416 * (n_b + n_c)")).as("rej"))
      .as[(Long, Long, Long, Long, Boolean)].collect().head

  test("one-sided disagreement rejects: b=10, c=0") {
    val pairs = Seq.fill(10)((true, false)) ++ Seq.fill(30)((true, true))
    assert(mc(pairs) === ((40L, 10L, 0L, 10000000L, true)))
  }

  test("mixed small disagreement does not reject: b=6, c=2") {
    // chi2 = 16/8 = 2.0 < 3.8416
    val pairs = Seq.fill(6)((true, false)) ++ Seq.fill(2)((false, true)) ++
      Seq.fill(10)((false, false))
    assert(mc(pairs) === ((18L, 6L, 2L, 2000000L, false)))
  }

  test("zero disagreement degenerates to no evidence") {
    assert(mc(Seq.fill(5)((true, true))) === ((5L, 0L, 0L, 0L, false)))
  }
}
