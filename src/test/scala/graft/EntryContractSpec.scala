package graft

/** Driver-contract guards. Round 8 shipped one query (p_profile_approx)
  * with no oracle entry and the gap surfaced only as a red row in the
  * EXTERNAL harness — this spec turns map drift into a local test
  * failure with the offending names in the message.
  */
class EntryContractSpec extends SparkSpec {

  test("queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o,
      s"queries without oracle: ${(q -- o).toSeq.sorted.mkString(", ")}; " +
        s"oracles without query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("no oracle SQL is blank and every one reads like SQL") {
    for ((name, sql) <- SparkEntry.oracleSql) {
      assert(sql.trim.nonEmpty, s"$name oracle is blank")
      assert(sql.toUpperCase.contains("SELECT"), s"$name oracle has no SELECT")
    }
  }

  test("flagship entry returns rows at sf0.001 (the driver's t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
