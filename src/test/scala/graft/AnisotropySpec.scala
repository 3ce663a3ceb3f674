package graft

import org.apache.spark.sql.functions._

import graft.llm.{TextOps, VectorOps}

/** X335 anisotropy: the exact integer cosine on the milli grid via
  * probed isqrt norms — collinear 1e6, orthogonal 0, opposite -1e6,
  * and the 45-degree value to the last floored unit.
  */
class AnisotropySpec extends SparkSpec {

  import spark.implicits._

  private def cos(a: Seq[Long], b: Seq[Long]): Long = {
    val dot = VectorOps.dotFn(spark)
    Seq((a, b)).toDF("qv", "qv2")
      .select(dot(col("qv"), col("qv")).as("aa"),
        dot(col("qv2"), col("qv2")).as("bb"),
        dot(col("qv"), col("qv2")).as("ab"))
      .select((col("ab") * 1000000L).as("num"),
        greatest(TextOps.isqrt(col("aa")) * TextOps.isqrt(col("bb")),
          lit(1L)).as("den"))
      .select(expr("num div den"))
      .as[Long].collect().head
  }

  test("collinear, orthogonal, opposite, and the floored 45-degree value") {
    assert(cos(Seq(3000L, 4000L), Seq(6000L, 8000L)) === 1000000L)
    assert(cos(Seq(1000L, 0L), Seq(0L, 1000L)) === 0L)
    assert(cos(Seq(1000L, 0L), Seq(-1000L, 0L)) === -1000000L)
    // isqrt(2e6) = 1414 -> 1e12 div 1414000 truncates to 707213
    assert(cos(Seq(1000L, 0L), Seq(1000L, 1000L)) === 707213L)
  }

  test("zero vector hits the den guard, not a divide-by-zero") {
    assert(cos(Seq(0L, 0L), Seq(1000L, 0L)) === 0L)
  }
}
