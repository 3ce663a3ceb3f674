package graft

import graft.llm.VectorOps
import org.apache.spark.sql.functions._

/** Power-iteration top principal component: planted-direction recovery,
  * determinism, and output-shape invariants.
  */
class PcaPowerSpec extends SparkSpec {

  /** 40 vectors in 8 dims: ±big on dim 2 (the planted direction), small
    * deterministic jitter elsewhere. PC1 must concentrate on dim 2.
    */
  private def planted() = {
    val s = spark
    import s.implicits._
    (0 until 40).map { r =>
      val sign = if (r % 2 == 0) 1.0f else -1.0f
      (r.toLong, (0 until 8).map { d =>
        if (d == 2) sign * 0.9f
        else (((r * 7 + d * 3) % 11) - 5) * 0.01f
      }.toArray)
    }.toDF("vec_id", "embedding")
  }

  test("planted dominant direction is recovered with high var_share") {
    val out = VectorOps.topPrincipalComponent(planted(), "embedding", rounds = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val loadings = out.collect { case ("loading", d, v) => d -> v }.toMap
    assert(loadings.size === 8)
    // planted dim carries the max-magnitude loading (rescale pins it to ±1)
    assert(math.abs(loadings(2L)) === 1.0)
    // every other dim is far smaller
    loadings.filter(_._1 != 2L).values.foreach(v => assert(math.abs(v) < 0.2))
    val share = out.collectFirst { case ("var_share", _, v) => v }.get
    assert(share > 0.9, s"planted direction should dominate, got $share")
    val eig = out.collectFirst { case ("eigenvalue_q", _, v) => v }.get
    // planted variance: components ±900 milli → var ≈ 900² = 810000 milli²
    assert(eig > 700000.0 && eig < 900000.0, s"eigenvalue_q $eig")
  }

  test("incremental (monoid-merged stats) equals full recompute bit for bit") {
    val df = planted()
    val full = VectorOps.topPrincipalComponent(df, "embedding", rounds = 6)
      .collect().toSeq
    val incr = VectorOps.topPrincipalComponentIncremental(
      df.filter(col("vec_id") % 3 =!= 0), df.filter(col("vec_id") % 3 === 0),
      "embedding", rounds = 6).collect().toSeq
    assert(incr === full)
  }

  test("deterministic across invocations") {
    val a = VectorOps.topPrincipalComponent(planted(), "embedding", rounds = 4)
      .collect().toSeq
    val b = VectorOps.topPrincipalComponent(planted(), "embedding", rounds = 4)
      .collect().toSeq
    assert(a === b)
  }
}
