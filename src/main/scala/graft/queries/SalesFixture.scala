package graft.queries

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Deterministic on-disk sales-CSV fixture for the file-based S1
  * correctness entry: three dated files (`2025-0M-01.csv`, stem →
  * `Audit_Date`) plus `notes.csv` (non-date stem → null `Audit_Date`,
  * FIXTURES.md §1). Rows are pure modular arithmetic so the same files
  * are byte-identical across runs; the DuckDB oracle reads the SAME files
  * via `read_csv`, so generation only has to be stable, not mirrored in
  * SQL.
  *
  * Each row carries an explicit `Row_Idx` — the recommended at-scale
  * pattern for total ingestion order (a file larger than one split loses
  * within-file order with `monotonically_increasing_id`; an explicit
  * sequence column never does).
  */
object SalesFixture {

  val schema: StructType = StructType(Seq(
    StructField("Sale_ID", StringType),
    StructField("Product", StringType),
    StructField("Amount", StringType),
    StructField("Date", StringType),
    StructField("Row_Idx", StringType)
  ))

  val rowsPerFile = 300

  private def fileStem(f: Int): String =
    if (f < 3) s"2025-0${f + 1}-01" else "notes"

  private def row(f: Int, i: Int): String = {
    val sid = if (i % 37 == 0) "" else s"s${(i * 7 + f * 13) % 140}"
    val letter = ('a' + i % 3).toChar
    val prod =
      if (i % 23 == 0) ""
      else if (i % 5 == 0) s"  gros-$letter  "
      else s"cat-$letter"
    val cents = (i * 131 + f * 977) % 100000
    val amt = s"${cents / 100}.${"%02d".format(cents % 100)}"
    val amount = (i % 6) match {
      case 0 => s"$amt USD"
      case 1 => s"$amt EUR"
      case 2 => s"${amt}EUR"
      case 3 => amt
      case 4 => s"EUR $amt"
      case _ => ""
    }
    val date = ((i + f) % 29) match {
      case 0 => "not-a-date"
      case 1 => ""
      case _ => s"2025-0${f % 3 + 1}-${"%02d".format(1 + i % 28)}"
    }
    s"$sid,$prod,$amount,$date,$i"
  }

  /** Materialize the fixture for scale-factor directory `sfName` (e.g.
    * "sf0.01") under /tmp, once; returns the directory path. Idempotent
    * and race-safe within a JVM.
    */
  def ensure(sfName: String): String = synchronized {
    val dir = s"/tmp/graft_s1_sales/$sfName"
    val done = Paths.get(dir, "_DONE")
    if (!Files.exists(done)) {
      Files.createDirectories(Paths.get(dir))
      (0 until 4).foreach { f =>
        val body = (0 until rowsPerFile).map(i => row(f, i))
          .mkString("Sale_ID,Product,Amount,Date,Row_Idx\n", "\n", "\n")
        Files.write(Paths.get(dir, s"${fileStem(f)}.csv"),
          body.getBytes(StandardCharsets.UTF_8))
      }
      Files.write(done, Array.emptyByteArray)
    }
    dir
  }

  def sfName(sfDir: String): String = new File(sfDir).getName
}
