package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Machine-checkable invariants of the reference's committed golden
  * outputs (the CSVs under /root/reference/Resultados — its only
  * verifiable artifact, SURVEY §5.1). These pin the shape our pipelines must
  * reproduce: row counts, Reason distribution and block order, unique
  * valid Sale_IDs, the 79-ID valid∩invalid overlap, lexicographic summary
  * sort, and raw float64 artifacts (DoubleType, not Decimal).
  */
class GoldenInvariantsSpec extends AnyFunSuite {

  private val dir = "/root/reference/Resultados"

  private def readCsv(name: String): Seq[Array[String]] = {
    val lines = Files.readAllLines(Paths.get(s"$dir/$name"), StandardCharsets.UTF_8)
      .asScala.toSeq
    // strip the utf-8-sig BOM the reference writes (etl_utils.py:124)
    val header = lines.head.replace("﻿", "")
    (header +: lines.tail).map(_.split(",", -1))
  }

  private lazy val valid = readCsv("Ventas_Validas_M.csv")
  private lazy val invalid = readCsv("Ventas_Invalidas_M.csv")
  private lazy val resumen = readCsv("Ventas_Resumen_Mensual.csv")

  test("valid: 192 rows, unique Sale_IDs, 5 columns") {
    assert(valid.head.toSeq === Seq("Sale_ID", "Product", "Amount", "Date", "Audit_Date"))
    val rows = valid.tail
    assert(rows.size === 192)
    assert(rows.map(_(0)).distinct.size === 192)
  }

  test("invalid: 184 rows = 59 N + 82 A + 43 D, in N->A->D block order") {
    assert(invalid.head.toSeq ===
      Seq("Sale_ID", "Product", "Amount", "Date", "Audit_Date", "Reason"))
    val reasons = invalid.tail.map(_(5))
    assert(reasons.size === 184)
    assert(reasons.count(_ == "N") === 59)
    assert(reasons.count(_ == "A") === 82)
    assert(reasons.count(_ == "D") === 43)
    val rank = Map("N" -> 0, "A" -> 1, "D" -> 2)
    assert(reasons.map(rank) === reasons.map(rank).sorted,
      "invalid output must preserve the N, A, D concat order (main.py:141)")
  }

  test("valid and invalid overlap on exactly 79 Sale_IDs (independent flows)") {
    val overlap = valid.tail.map(_(0)).toSet intersect invalid.tail.map(_(0)).toSet
    assert(overlap.size === 79)
  }

  test("summary: 167 groups, lexicographically sorted, float64 artifacts intact") {
    assert(resumen.head.toSeq ===
      Seq("Mes", "Producto", "Ventas_Totales", "Numero_Transacciones", "Venta_Minima"))
    val rows = resumen.tail
    assert(rows.size === 167)
    val keys = rows.map(r => (r(0), r(1)))
    assert(keys === keys.sorted, "pandas groupby sort=True: lexicographic key order")
    // IEEE double sum artifacts prove the reference uses float64, so our
    // engine must use DoubleType (SURVEY §1) — never DecimalType.
    val totals = rows.map(_(2))
    assert(totals.contains("377.08000000000004"))
    assert(totals.contains("970.5899999999999"))
  }
}
