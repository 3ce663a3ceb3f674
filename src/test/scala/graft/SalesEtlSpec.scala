package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.SalesEtl

/** Reference-semantics golden tests over the FIXTURES.md §1 trap rows:
  * every subtle behavior of `main.py:53-151` asserted against
  * pandas-derived expectations.
  */
class SalesEtlSpec extends SparkSpec {
  import spark.implicits._

  /** (Sale_ID, Product, Amount, Date, auditIso-or-null, ord) */
  private def mkDf(rows: Seq[(String, String, String, String, String, Long)]): DataFrame =
    rows.toDF("Sale_ID", "Product", "Amount", "Date", "_audit_raw", "_ord")
      .withColumn("Audit_Date", to_timestamp(col("_audit_raw"), "yyyy-MM-dd"))
      .drop("_audit_raw")

  private val traps = mkDf(Seq(
    ("ab12cd34", "cat-x", "123.45 USD", "2024-09-22", "2025-01-01", 0L),
    ("dupid", "cat-y", "99.10 EUR", "2024-09-22", "2025-01-01", 1L),
    ("DUPID", "CAT - Y", "50EUR", "2024-09-23", "2025-01-01", 2L),
    ("plain1", "plain", "EUR 100", "2024-09-24", "2025-01-01", 3L),
    ("noc1", "cat-z", "224.12", "2024-09-25", "2025-01-01", 4L),
    (null, "cat-q", "10.00 USD", "2024-09-26", "2025-01-01", 5L)))

  private def validOf(df: DataFrame) =
    SalesEtl.cleanValidSales(df, orderCols = Seq(col("_ord")))
      .orderBy("Sale_ID")
      .select("Sale_ID", "Product", "Amount")
      .as[(String, String, Double)].collect().toSeq

  private def reasonsOf(df: DataFrame) =
    SalesEtl.detectInvalidSales(df)
      .select("Sale_ID", "Reason")
      .as[(String, String)].collect().toSeq.sorted

  test("Q1 traps: upper, dedup keep-first, split-last, EUR suffix vs prefix, numpy rounding") {
    val v = validOf(traps)
    assert(v === Seq(
      ("AB12CD34", "X", 123.45),
      // keep-first kept the _ord=1 copy; 99.10*0.85=84.234999..; *100 == 8423.5 exactly -> 84.24
      ("DUPID", "Y", 84.24),
      // "EUR 100" strips to 100.0 but does NOT end with EUR -> no *0.85
      ("NOC1", "Z", 224.12),
      ("PLAIN1", "PLAIN", 100.0)))
  }

  test("Q2 traps: D for all dup copies, A for currency-less, lone null Sale_ID vanishes") {
    // r1/r4 have currency + unique -> absent; r6 null sid -> "NAN", unique,
    // has currency -> appears NOWHERE (trap 3: erased before the null check)
    assert(reasonsOf(traps) === Seq(("DUPID", "D"), ("DUPID", "D"), ("NOC1", "A")))
  }

  test("Q2 trap: two null Sale_IDs collide as NAN -> Reason D") {
    val df = mkDf(Seq(
      (null, "cat-a", "10.00 USD", "2024-09-22", "2025-01-01", 0L),
      (null, "cat-b", "20.00 USD", "2024-09-23", "2025-01-01", 1L)))
    assert(reasonsOf(df) === Seq(("NAN", "D"), ("NAN", "D")))
  }

  test("Q2 traps: null Amount/Audit_Date -> N (priority over A/D); garbage Date string is NOT null") {
    val df = mkDf(Seq(
      ("a1", "cat-a", null, "2024-09-22", "2025-01-01", 0L), // null Amount -> N
      ("a2", "cat-a", "5.00", null, "2025-01-01", 1L), // null Date -> N (beats A)
      ("a3", "cat-a", "5.00 USD", "2024-09-22", null, 2L), // notes.csv case -> N
      ("a4", "cat-a", "6.00 USD", "not-a-date", "2025-01-01", 3L))) // garbage string: no reason
    assert(reasonsOf(df) === Seq(("A1", "N"), ("A2", "N"), ("A3", "N")))
  }

  test("Q3: lexicographic group order and non-null count semantics") {
    val valid = SalesEtl.cleanValidSales(traps, orderCols = Seq(col("_ord")))
    val rows = SalesEtl.monthlySummary(valid)
      .as[(String, String, Double, Long, Double)].collect().toSeq
    assert(rows === Seq(
      ("09/2024", "PLAIN", 100.0, 1L, 100.0),
      ("09/2024", "X", 123.45, 1L, 123.45),
      ("09/2024", "Y", 84.24, 1L, 84.24),
      ("09/2024", "Z", 224.12, 1L, 224.12)))
  }

  test("numpyRound2 matches numpy.round(x, 2) on the classic half-even traps") {
    // Expectations are ACTUAL numpy (np.round / pandas Series.round)
    // outputs, not folklore: 2.675*100 is exactly 267.5 in IEEE, so
    // half-to-even rounds UP to 268 -> 2.68.
    val cases = Seq(
      2.675 -> 2.68, // 2.675*100 == 267.5 exactly; half-even -> 268
      0.125 -> 0.12, // exact 12.5 -> half-to-even -> 12
      1.005 -> 1.0, // 100.49999999999999 -> 100
      0.135 -> 0.14, // 13.500000000000002 -> 14
      2.5 -> 2.5,
      (99.10 * 0.85) -> 84.24) // 84.2349999..; *100 == 8423.5 exactly -> 8424
    val got = cases.map(_._1).toDF("x")
      .select(SalesEtl.numpyRound2(col("x"))).as[Double].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("keep-first dedup is stable under repartitioning given a total order") {
    val base = mkDf((0 until 200).map { i =>
      (s"id${i % 37}", "cat-a", s"$i.00 USD", "2024-09-22", "2025-01-01", i.toLong)
    })
    val a = validOf(base)
    val b = validOf(base.repartition(7))
    assert(a === b)
    assert(a.map(_._1).distinct.size === a.size)
  }

  test("P8 strict mode raises on an unparseable Amount, naming the string (pandas astype parity)") {
    // pandas `astype(float)` at main.py:79 RAISES on garbage text; the
    // default try_cast drops the row silently (documented divergence)
    val garbage = mkDf(Seq(
      ("ok1", "cat-a", "10.00 USD", "2024-09-22", "2025-01-01", 0L),
      ("bad1", "cat-b", "12,50 USD", "2024-09-22", "2025-01-01", 1L))) // comma decimal
    val e = intercept[Exception] {
      SalesEtl.cleanValidSales(garbage, orderCols = Seq(col("_ord")),
        strictAmount = true).count()
    }
    assert(e.getMessage.contains("could not convert string to float") ||
      Option(e.getCause).exists(_.getMessage.contains("could not convert string to float")),
      s"wrong error: ${e.getMessage}")
  }

  test("P8 default mode drops the garbage-Amount row; strict mode equals default on a clean feed") {
    val garbage = mkDf(Seq(
      ("ok1", "cat-a", "10.00 USD", "2024-09-22", "2025-01-01", 0L),
      ("bad1", "cat-b", "not-a-number", "2024-09-22", "2025-01-01", 1L)))
    assert(validOf(garbage).map(_._1) === Seq("OK1"))
    // a null Amount is NOT a strict failure (pandas: None -> NaN, no raise)
    val withNull = mkDf(Seq(
      ("ok1", "cat-a", "10.00 USD", "2024-09-22", "2025-01-01", 0L),
      ("nul1", "cat-b", null, "2024-09-22", "2025-01-01", 1L)))
    val strict = SalesEtl.cleanValidSales(withNull, orderCols = Seq(col("_ord")),
      strictAmount = true).orderBy("Sale_ID")
      .select("Sale_ID", "Amount").as[(String, Double)].collect().toSeq
    assert(strict === Seq(("OK1", 10.0)))
  }
}
