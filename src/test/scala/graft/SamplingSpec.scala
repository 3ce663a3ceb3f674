package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (0 until 600)
    .map(i => (i.toLong, s"strat${i % 3}"))
  private val df = rows.toDF("id", "strat")

  test("stratifiedTopK selects exactly the single-window result") {
    val twoPhase = Sampling.stratifiedTopK(df, "strat", "id", k = 7, salt = "t")
      .select("strat", "id", "rank").as[(String, Long, Int)].collect().toSet
    val w = Window.partitionBy("strat")
      .orderBy(col("sample_key"), col("id"))
    val single = df
      .withColumn("sample_key", md5(concat(lit("t|"), col("id").cast("string"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select("strat", "id", "rank").as[(String, Long, Int)].collect().toSet
    assert(twoPhase === single)
    assert(twoPhase.size === 21) // 3 strata × 7
  }

  test("stratifiedTopK is invariant to input partitioning") {
    val a = Sampling.stratifiedTopK(df, "strat", "id", 5, "p")
      .select("strat", "id").as[(String, Long)].collect().toSet
    val b = Sampling.stratifiedTopK(df.repartition(13), "strat", "id", 5, "p")
      .select("strat", "id").as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("stratifiedTopK returns whole stratum when it is smaller than k") {
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "strat")
    val got = Sampling.stratifiedTopK(tiny, "strat", "id", k = 10, salt = "s")
      .select("strat", "id").as[(String, Long)].collect().toSet
    assert(got === Set(("x", 1L), ("x", 2L), ("y", 3L)))
  }

  test("different salts select different samples") {
    val s1 = Sampling.stratifiedTopK(df, "strat", "id", 10, "saltA")
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.stratifiedTopK(df, "strat", "id", 10, "saltB")
      .select("id").as[Long].collect().toSet
    assert(s1 !== s2)
  }
}
