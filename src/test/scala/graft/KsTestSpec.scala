package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X333 exact two-sample KS: a hand-computed cross-multiplied CDF gap
  * with its argmax location, the no-evidence small-n case, and the
  * exact rational α=0.05 rejection on a fully-separated large pair —
  * via the same expressions the query registers.
  */
class KsTestSpec extends SparkSpec {

  import spark.implicits._

  private def ks(rows: Seq[(String, Long)]) = {
    val d = rows.toDF("source", "s")
    val s0 = d.agg(min("source").as("s0"))
    val c = d.crossJoin(broadcast(s0))
      .groupBy("s")
      .agg(sum(when(col("source") === col("s0"), 1L).otherwise(0L))
        .as("c1"),
        sum(when(col("source") =!= col("s0"), 1L).otherwise(0L)).as("c2"))
    val cum = c
      .withColumn("f1", sum("c1").over(Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("f2", sum("c2").over(Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = c.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val dec = (x: Column) => x.cast("decimal(38,0)")
    cum.crossJoin(broadcast(n))
      .select(col("s"), col("n1"), col("n2"),
        abs(col("f1") * col("n2") - col("f2") * col("n1")).as("dd"))
      .groupBy("n1", "n2")
      .agg(min(struct((-col("dd")).as("nd"), col("s").as("v"))).as("b"))
      .select(col("n1"), col("n2"), (-col("b.nd")).as("d_num"),
        col("b.v").as("at_value"))
      .select(col("n1"), col("n2"), col("d_num"), col("at_value"),
        expr("(d_num * 1000000) div (n1 * n2)").as("ks_micro"),
        (dec(col("d_num")) * dec(col("d_num")) * lit(1000000L)
          >= dec(lit(1844164L)) * dec(col("n1")) * dec(col("n2"))
            * dec(col("n1") + col("n2"))).as("reject_05"))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().head
  }

  test("hand-computed gap and location") {
    // a: {1, 3}; z: {2, 4, 4}. Gaps (x n1*n2=6): s=1 -> 3, s=2 -> 1,
    // s=3 -> 4, s=4 -> 0. Max 4 at s=3, ks = 4e6 div 6 = 666666.
    assert(ks(Seq(("a", 1L), ("a", 3L),
      ("z", 2L), ("z", 4L), ("z", 4L)))
      === ((2L, 3L, 4L, 3L, 666666L, false)))
  }

  test("full separation at tiny n: D = 1 but no rejection (no power)") {
    val r = ks(Seq(("a", 1L), ("a", 2L), ("z", 10L), ("z", 11L)))
    assert(r._5 === 1000000L && !r._6)
  }

  test("full separation at n = 50 + 50 rejects at alpha = 0.05") {
    val rows = Seq.fill(50)(("a", 1L)) ++ Seq.fill(50)(("z", 2L))
    val r = ks(rows)
    assert(r._5 === 1000000L && r._6)
  }
}
