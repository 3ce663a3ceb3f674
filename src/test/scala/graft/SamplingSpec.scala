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

  test("rendezvous assign: n->n+1 moves rows ONLY into the new shard; partition-independent; hash-mod moves most") {
    import graft.operators.Rendezvous
    val ids = (0L until 400L).toDF("id")
    val a4 = Rendezvous.assign(ids, "id", 4, "s").withColumnRenamed("shard", "s4")
    val a5 = Rendezvous.assign(ids, "id", 5, "s").withColumnRenamed("shard", "s5")
    val moved = a4.join(a5, "id").filter($"s4" =!= $"s5")
      .select("s5").as[Int].collect()
    assert(moved.nonEmpty && moved.forall(_ === 4)) // movers land on the NEW shard only
    assert(moved.length < 400 / 3)                  // ~1/5 expected, never mass reshuffle
    // hash(id) % n for contrast: growing 4->5 re-homes the large majority
    val modMoved = ids.filter(abs(hash($"id")) % 4 =!= abs(hash($"id")) % 5).count()
    assert(modMoved > 400 / 2)
    // pure function of (id, n, salt): partitioning cannot change it
    val b4 = Rendezvous.assign(ids.repartition(13), "id", 4, "s")
      .withColumnRenamed("shard", "s4b")
    assert(a4.join(b4, "id").filter($"s4" =!= $"s4b").count() === 0)
  }
}
