package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X324 AGMS self-join-size sketch: the single-key exactness identity
  * (|X_e| = n for every estimator, so the estimate and truth coincide
  * and err_micro = 0), and sign sums on a mixed corpus matching a JVM
  * md5 replay of the same ±1 family.
  */
class JoinSizeSketchSpec extends SparkSpec {

  import spark.implicits._

  private def sketch(keys: Seq[String]) = {
    val ks = keys.toDF("k")
    val sums = (0 until 16).map { e =>
      sum(when(conv(substring(col("h"), e + 1, 1), 16, 10)
          .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L)))
        .as(s"x$e")
    }
    val est = ks
      .select(md5(concat(lit("f2|"), col("k"))).as("h"))
      .agg(sums.head, sums.tail: _*)
      .selectExpr(s"stack(16, ${(0 until 16)
        .map(e => s"CAST($e AS INT), x$e").mkString(", ")}) AS (e, x)")
    val med = est.withColumn("g", expr("e div 4"))
      .groupBy("g").agg(expr("sum(x * x) div 4").as("mean_sq"))
      .withColumn("rn", row_number().over(Window.orderBy("mean_sq", "g")))
      .filter(col("rn") === 2).select(col("mean_sq").as("f2_est"))
    val tru = ks.groupBy("k").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * c")).as("f2_true"))
    est.crossJoin(broadcast(med)).crossJoin(broadcast(tru))
      .select(col("e").cast("long").as("estimator"),
        col("x").as("x_sign_sum"), expr("x * x").as("sq"),
        col("f2_est"), col("f2_true"),
        expr("((f2_est - f2_true) * 1000000) div f2_true").as("err_micro"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
  }

  private def jvmSign(e: Int, k: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"f2|$k".getBytes("UTF-8"))
    val nib = if (e % 2 == 0) (d(e / 2) >> 4) & 0xf else d(e / 2) & 0xf
    if (nib % 2 == 0) 1L else -1L
  }

  test("single-key corpus: every estimator is exact, err_micro = 0") {
    val out = sketch(Seq.fill(5)("only"))
    assert(out.length === 16)
    // X_e = ±5 for every e, so sq = 25 = F2 exactly
    assert(out.forall(r => math.abs(r._2) === 5L && r._3 === 25L))
    assert(out.forall(r => r._4 === 25L && r._5 === 25L && r._6 === 0L))
  }

  test("mixed corpus: sign sums replay the JVM md5 family, truth exact") {
    val keys = Seq("a", "a", "a", "b", "b", "c")
    val out = sketch(keys)
    assert(out.forall(r => r._5 === (9L + 4L + 1L))) // 3² + 2² + 1²
    for (r <- out) {
      val e = r._1.toInt
      val expected = keys.map(jvmSign(e, _)).sum
      assert(r._2 === expected, s"estimator $e sign sum")
      assert(r._3 === expected * expected)
    }
  }
}
