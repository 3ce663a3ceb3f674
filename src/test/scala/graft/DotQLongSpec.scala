package graft

import org.apache.spark.sql.functions._
import graft.llm.VectorOps

/** The custom Catalyst dot_q_long expression: value parity with the
  * portable zip_with/aggregate spelling on both the interpreted and
  * codegen paths, plus null propagation.
  */
class DotQLongSpec extends SparkSpec {
  import spark.implicits._

  test("dot_q_long is registered by GraftExtensions and matches dotQ") {
    assert(spark.catalog.functionExists("dot_q_long"))
    val rows = (0 until 200).map { i =>
      (Array.tabulate(64)(d => (i * 31 + d * 7 - 100).toLong),
        Array.tabulate(64)(d => (d * 13 - i).toLong))
    }
    val df = rows.toDF("a", "b")
    val native = df.select(call_function("dot_q_long", col("a"), col("b")))
      .as[Long].collect().toSeq
    val portable = df.select(VectorOps.dotQ(col("a"), col("b")))
      .as[Long].collect().toSeq
    assert(native === portable)
  }

  test("dot_q_long works through SQL text and propagates null inputs") {
    val got = spark.sql(
      "SELECT dot_q_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").as[Long].head()
    assert(got === 4L + 10L + 18L)
    val nulls = spark.sql(
      "SELECT dot_q_long(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d")
      .select(col("d").isNull).as[Boolean].head()
    assert(nulls)
  }

  test("dotFn upgrades to the native expression on extension sessions") {
    val fn = VectorOps.dotFn(spark)
    val d = Seq((Array(2L, 3L), Array(10L, 100L))).toDF("a", "b")
      .select(fn(col("a"), col("b"))).as[Long].head()
    assert(d === 320L)
  }
}
