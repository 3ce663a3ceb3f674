package graft

import org.apache.spark.sql.functions._

/** X391 Bartels' rank test: the query's exact integers re-derived
  * independently from the same daily series on the driver.
  */
class BartelsRankSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("NM, RVN and the decision match an independent re-derivation") {
    val got = graft.queries.LlmSurface.queries("p_bartels_rank")(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().head
    val daily = graft.queries.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
      .orderBy("day").as[(java.sql.Date, Long)].collect()
    val n = daily.length.toLong
    // ranks tie-broken by day = the query's permutation policy
    val rankOf = daily.zipWithIndex
      .sortBy { case ((d, x), _) => (x, d.toString) }
      .zipWithIndex.map { case ((_, orig), r) => orig -> (r + 1L) }.toMap
    val rs = daily.indices.map(rankOf)
    val nm = rs.sliding(2).map { case Seq(a, b) => (a - b) * (a - b) }.sum
    val n3n = BigInt(n) * n * n - n
    assert(got._1 === n && got._2 === nm)
    assert(got._3 === (BigInt(nm) * 12 * 1000000 / n3n).toLong)
    val dev = BigInt(nm) * 12 - 2 * n3n
    val lhs = dev * dev * 1000000 * 5 * n * (n + 1) * (n - 1) * (n - 1)
    val rhs = BigInt(3841458) * 4 * (n - 2) *
      (BigInt(5) * n * n - 2 * n - 9) * n3n * n3n
    assert(got._4 === (lhs >= rhs))
  }
}
