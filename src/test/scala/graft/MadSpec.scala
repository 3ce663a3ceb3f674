package graft

import graft.llm.EventOps

/** Hand-checked semantics for X275 MAD outlier census — the two
  * histogram rank walks, the integer threshold clearing, and the
  * MAD = 0 degeneracy.
  */
class MadSpec extends SparkSpec {

  import spark.implicits._

  private def run(cents: Seq[Long]) =
    EventOps.madOutliers(
        cents.map(c => ("a", c / 100.0)).toDF("event_type", "value"),
        "event_type", "value")
      .select("n", "median_cents", "mad_cents", "n_outliers")
      .as[(Long, Long, Long, Long)].collect().head

  test("single spike: exact median, MAD, and the one outlier") {
    // residuals of [1,2,3,4,100] around med 3: lower median 1;
    // only 97*1e4 > 44478*1 clears
    assert(run(Seq(1L, 2L, 3L, 4L, 100L)) === ((5L, 3L, 1L, 1L)))
  }

  test("MAD = 0 degeneracy flags every off-median value") {
    assert(run(Seq(5L, 5L, 5L, 9L)) === ((4L, 5L, 0L, 1L)))
  }

  test("a tight symmetric cluster has zero outliers") {
    assert(run((1L to 7L).toSeq) === ((7L, 4L, 2L, 0L)))
  }
}
