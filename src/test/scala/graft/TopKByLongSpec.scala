package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llm.VectorOps

class TopKByLongSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows: (group, payload, ord) with ord
  // collisions to exercise the tie-break
  private val rows = (0 until 5000).map { i =>
    ((i % 7).toLong, i.toLong, (i * 131 % 97).toLong)
  }
  private val df = rows.toDF("g", "p", "o")

  test("topk_by_long equals the row_number window form, ties included") {
    val viaAgg = df.groupBy("g")
      .agg(call_function("topk_by_long", col("p"), col("o"), lit(10)).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("e.payload").as("p"), col("e.ord").as("o"))
      .as[(Long, Int, Long, Long)].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("o").desc, col("p"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("g", "rank", "p", "o")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(viaAgg === viaWindow)
    assert(viaAgg.size === 70)
  }

  test("topk_by_long is invariant to input partitioning (partial merge)") {
    def run(d: org.apache.spark.sql.DataFrame) = d.groupBy("g")
      .agg(call_function("topk_by_long", col("p"), col("o"), lit(5)).as("tk"))
      .select(col("g"), col("tk").cast("string").as("s"))
      .as[(Long, String)].collect().toSet
    assert(run(df) === run(df.repartition(17)))
    assert(run(df) === run(df.coalesce(1)))
  }

  test("topk_by_long returns fewer than k when the group is small") {
    val tiny = Seq((1L, 10L, 5L), (1L, 11L, 9L)).toDF("g", "p", "o")
    val got = tiny.groupBy("g")
      .agg(call_function("topk_by_long", col("p"), col("o"), lit(4)).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.payload", "e.ord")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((11L, 9L), (10L, 5L))) // best (highest ord) first
  }

  test("topk_by_long skips null inputs") {
    val got = df
      .withColumn("o2", when(col("o") > 50, col("o"))) // nulls below 51
      .groupBy("g")
      .agg(call_function("topk_by_long", col("p"), col("o2"), lit(3)).as("tk"))
      .select(explode(col("tk")).as("e")).select(col("e.ord"))
      .as[Long].collect()
    assert(got.nonEmpty && got.forall(_ > 50))
  }

  test("topk_by_long works from SQL text") {
    df.createOrReplaceTempView("tkl_rows")
    val got = spark.sql(
      "SELECT g, topk_by_long(p, o, 2) AS tk FROM tkl_rows GROUP BY g")
    assert(got.count() === 7)
  }

  test("plan: heap aggregate is partial+final ObjectHashAggregate, no sort") {
    val plan = df.groupBy("g")
      .agg(call_function("topk_by_long", col("p"), col("o"), lit(5)).as("tk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_topk_by_long"), "map-side partial combine")
    assert(!plan.toLowerCase.contains("sortaggregate"))
  }

  test("topKHeap matches topK (window form) on quantized vectors") {
    val emb = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 17) % 19 - 9) / 10.0f))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
    val qs = emb.filter(col("vec_id") % 50 === 0)
    val a = VectorOps.topK(emb, qs, "vec_id", "qv", k = 4)
      .as[(Long, Int, Long, Long)].collect().toSet
    val b = VectorOps.topKHeap(emb, qs, "vec_id", "qv", k = 4)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}
