package graft

import org.apache.spark.sql.functions._
import graft.llm.{EventOps, TextOps}
import graft.operators.Sampling

/** Hand-checked semantics for the round-8 wave-5 ops: max-run repetition,
  * Welch A/B, few-shot prompt packing, and the time-RANGE trailing-spend
  * frame.
  */
class Wave5OpsSpec extends SparkSpec {

  import spark.implicits._

  private def runOf(text: String): (Long, Long, String) = {
    val r = Seq(text).toDF("t")
      .select(TextOps.maxRun(split(col("t"), " ")).as("r"))
      .select("r.n_tokens", "r.max_run", "r.run_token")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getString(2))
  }

  test("maxRun: longest run, first-longest tie rule, degenerate docs") {
    assert(runOf("a b b b c c") === ((6L, 3L, "b")))
    // tie at len 2: x's run starts first — first-longest owns the report
    assert(runOf("x x y y") === ((4L, 2L, "x")))
    assert(runOf("z") === ((1L, 1L, "z")))
    assert(runOf("k k k k") === ((4L, 4L, "k")))
    // interleaving resets runs: no run exceeds 1
    assert(runOf("a b a b a") === ((5L, 1L, "a")))
  }

  test("abWelch: hand-computed t and Satterthwaite df") {
    // A (even users): 1,2,3  → n=3, mean 2, var 1,   se²=1/3
    // B (odd users):  2,4    → n=2, mean 3, var 2,   se²=1
    // t  = 1/√(4/3)          = 0.866025
    // df = (4/3)² / ((1/9)/2 + 1) = 1.684211
    val ev = Seq(
      (0L, "t", 1.0), (2L, "t", 2.0), (4L, "t", 3.0),
      (1L, "t", 2.0), (3L, "t", 4.0))
      .toDF("user_id", "event_type", "value")
    val r = EventOps.abWelch(ev, "user_id", "event_type", "value")
      .collect().head
    assert(r.getLong(1) === 3L && r.getLong(2) === 2L)
    assert(r.getDouble(3) === 2.0 && r.getDouble(4) === 3.0)
    assert(r.getDouble(5) === 0.5)        // lift (3-2)/2
    assert(r.getDouble(6) === 0.866025)   // t
    assert(r.getDouble(7) === 1.684211)   // df
  }

  test("abWelch: an arm with < 2 samples drops the type") {
    val ev = Seq((0L, "solo", 1.0), (2L, "solo", 2.0), (1L, "solo", 5.0),
      (0L, "ok", 1.0), (2L, "ok", 2.0), (1L, "ok", 1.0), (3L, "ok", 2.0))
      .toDF("user_id", "event_type", "value")
    val types = EventOps.abWelch(ev, "user_id", "event_type", "value")
      .select("event_type").as[String].collect().toSet
    assert(types === Set("ok")) // "solo" has nb=1 — no variance estimate
  }

  test("promptPack: prefix-stop equals the reference walk, never skips") {
    // 40 docs across 2 classes; one whale doc (1000 tokens) per class —
    // if the whale lands early in hash order it must STOP the prefix,
    // not be skipped past.
    val df = (0 until 40)
      .map(i => (i.toLong, s"c${i % 2}", if (i < 2) 1000L else 30L))
      .toDF("id", "cls", "n_tok")
    // reference walk: rank by (md5('w5|'||id), id) per class, take the
    // strict prefix while cum <= 100 (max 8)
    val ranked = df.withColumn("sk",
      md5(concat(lit("w5|"), col("id").cast("string"))))
      .select("cls", "id", "n_tok", "sk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).map { case (cls, rows) =>
        val order = rows.sortBy(r => (r._4, r._2)).take(8)
        var cum = 0L
        val kept = order.takeWhile { r => cum += r._3; cum <= 100L }
        (cls, (kept.length.toLong, kept.map(_._3).sum,
          kept.map(_._2).mkString(",")))
      }
    val gotMap = Sampling.promptPack(df, "cls", "id", "n_tok",
      budgetTokens = 100L, maxExamples = 8, salt = "w5")
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(gotMap === ranked.toMap)
  }

  test("p_trailing_spend: same-day ties share the identical RANGE frame") {
    val dir = java.nio.file.Files.createTempDirectory("w5-orders-").toString
    Seq(
      (1L, 1L, "2024-01-01 00:00:00", 10.00, "O", "1-URGENT"),
      (2L, 1L, "2024-01-03 00:00:00", 20.00, "O", "1-URGENT"),
      (3L, 1L, "2024-01-03 00:00:00", 5.00, "O", "1-URGENT"),
      (4L, 1L, "2024-01-10 00:00:00", 7.00, "O", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice",
        "o_orderstatus", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.queries.RefSurface.queries("p_trailing_spend")(spark, dir)
      .select("o_orderkey", "spend_7d_cents", "n_orders_7d")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, 1000L, 1L),   // alone in its week
      (2L, 3500L, 3L),   // day-3 ties: both see day1 + both day-3 orders
      (3L, 3500L, 3L),   //   ← identical frame, no tie-break needed
      (4L, 700L, 1L)))   // day 10: days 4..10 hold only itself
  }
}
