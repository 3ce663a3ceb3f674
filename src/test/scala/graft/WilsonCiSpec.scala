package graft

/** X369 Wilson score interval: the textbook 19/25 case, the k = 0 and
  * k = n extremes where Wald collapses and Wilson stays honest, and
  * containment of the point rate.
  */
class WilsonCiSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir = {
    val d = "/tmp/graft_wilson_fixture"
    val long50 = Seq.fill(50)("w").mkString(" ")
    val docs =
      (0 until 19).map(i => (i.toLong, long50, "en", "srcA", 50L)) ++
      (19 until 25).map(i => (i.toLong, "a b c", "en", "srcA", 5L)) ++
      (25 until 30).map(i => (i.toLong, long50, "en", "srcZ", 50L)) ++
      (30 until 34).map(i => (i.toLong, "x y", "en", "srcQ", 3L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("textbook 19/25 interval; extremes stay inside [0, 1]") {
    val r = graft.queries.LlmSurface.queries("p_wilson_ci")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    // 19/25 at 95%: Wilson = [0.5657, 0.8850] — pinned on the micro grid
    val a = r("srcA")
    assert(a._4 === 760000L && a._5 === 565703L && a._6 === 885036L)
    // all-pass: the true Wilson upper at k = n is exactly 1; the raw
    // floored-sqrt grid reads 999999 and the containment clamp
    // restores the point rate
    val z = r("srcZ")
    assert(z._4 === 1000000L && z._6 === 1000000L
      && z._5 > 500000L && z._5 < 1000000L)
    // none-pass: lower clamps to 0, upper honestly above 0
    val q = r("srcQ")
    assert(q._4 === 0L && q._5 === 0L && q._6 > 0L && q._6 < 600000L)
    // the point rate always sits inside its interval
    r.values.foreach(x => assert(x._5 <= x._4 && x._4 <= x._6))
  }
}
