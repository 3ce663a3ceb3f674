package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.etl.SalesEtl

/** Property-based checks over randomized sales feeds (SURVEY §5.3).
  * Few iterations — each case runs Spark jobs.
  */
object SalesProps extends Properties("SalesEtl") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val sidGen = Gen.oneOf(
    Gen.const(null: String),
    Gen.choose(0, 12).map(i => s"id$i"),
    Gen.choose(0, 12).map(i => s"ID$i"))
  private val prodGen = Gen.oneOf(
    Gen.const(null: String), Gen.const("cat-x"), Gen.const("  gros-y  "),
    Gen.const("plain"))
  private val amtGen = Gen.oneOf(
    Gen.const(null: String),
    Gen.choose(0, 99999).map(c => s"${c / 100}.${"%02d".format(c % 100)} USD"),
    Gen.choose(0, 99999).map(c => s"${c / 100}.${"%02d".format(c % 100)} EUR"),
    Gen.choose(0, 99999).map(c => s"${c / 100}.${"%02d".format(c % 100)}EUR"),
    Gen.choose(0, 99999).map(c => s"${c / 100}.${"%02d".format(c % 100)}"),
    Gen.const("garbage"))
  private val dateGen = Gen.oneOf(
    Gen.const(null: String), Gen.const("not-a-date"),
    Gen.choose(1, 28).map(d => s"2024-09-${"%02d".format(d)}"))
  private val auditGen = Gen.oneOf(Gen.const(null: String), Gen.const("2025-01-01"))

  private val rowGen = for {
    s <- sidGen; p <- prodGen; a <- amtGen; d <- dateGen; ad <- auditGen
  } yield (s, p, a, d, ad)

  private val feedGen = Gen.listOfN(60, rowGen).map { rows =>
    rows.zipWithIndex.map { case ((s, p, a, d, ad), i) => (s, p, a, d, ad, i.toLong) }
  }

  private def df(rows: List[(String, String, String, String, String, Long)]) =
    rows.toDF("Sale_ID", "Product", "Amount", "Date", "_audit_raw", "_ord")
      .withColumn("Audit_Date", to_timestamp(col("_audit_raw"), "yyyy-MM-dd"))
      .drop("_audit_raw")

  property("valid output has unique, non-null, uppercase Sale_IDs") =
    forAll(feedGen) { rows =>
      val sids = SalesEtl.cleanValidSales(df(rows), orderCols = Seq(col("_ord")))
        .select("Sale_ID").as[String].collect().toSeq
      sids.forall(s => s != null && s == s.toUpperCase) &&
        sids.distinct.size == sids.size
    }

  property("every row gets at most one Reason; D implies >=2 currency-valid copies") =
    forAll(feedGen) { rows =>
      val inv = SalesEtl.detectInvalidSales(df(rows))
        .select("Sale_ID", "Reason", "_ord").as[(String, String, Long)].collect().toSeq
      val oneReasonPerRow = inv.map(_._3).distinct.size == inv.size
      val dSids = inv.collect { case (s, "D", _) => s }
      val dCounts = dSids.groupBy(identity).view.mapValues(_.size)
      oneReasonPerRow && dCounts.forall(_._2 >= 2)
    }

  property("summary sum/count/min agree with a driver-side fold of the valid rows") =
    forAll(feedGen) { rows =>
      val valid = SalesEtl.cleanValidSales(df(rows), orderCols = Seq(col("_ord")))
      val got = SalesEtl.monthlySummary(valid)
        .as[(String, String, Double, Long, Double)].collect().toSeq
      val base = valid
        .select(date_format(col("Date"), "MM/yyyy"), col("Product"), col("Amount"))
        .as[(String, String, Double)].collect().toSeq
      val expect = base.groupBy(r => (r._1, r._2)).map { case ((m, p), g) =>
        (m, p, g.map(_._3).sum, g.size.toLong, g.map(_._3).min)
      }.toSeq.sortBy(r => (r._1, r._2))
      got.map(r => (r._1, r._2, math.abs(r._3), r._4, r._5)) ==
        expect.map(r => (r._1, r._2, math.abs(r._3), r._4, r._5)) ||
        got.zip(expect).forall { case (a, b) =>
          a._1 == b._1 && a._2 == b._2 && math.abs(a._3 - b._3) < 1e-9 &&
            a._4 == b._4 && a._5 == b._5
        }
    }
}
