package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sales CSV sources (SURVEY §2.1).
  *
  * S1 — directory CSV scan with a filename-derived `Audit_Date` column
  * (reference: `etl_utils.py:166-206`): every `*.csv` in a directory is
  * read with a fixed schema; `Audit_Date` is parsed from the filename stem
  * (null when the stem is not a date, matching `errors='coerce'` at
  * `etl_utils.py:190`).
  *
  * S2 — single CSV read with optional coercing date parse
  * (reference: `etl_utils.py:71-106`).
  *
  * Scale note: the reference loads files one-by-one on a single thread and
  * concatenates in memory. Here the whole directory is a single distributed
  * scan — Spark splits large files, schedules one task per split, and the
  * filename-derived column is a per-partition constant (no shuffle). At
  * 100 TB this is embarrassingly parallel; `Audit_Date` derivation adds no
  * exchange.
  */
object SalesSource {

  /** Raw schema: everything is a nullable string — `pd.read_csv` infers
    * object dtype for all four columns of the sales feed (SURVEY §1).
    * Explicit so multi-file reads are deterministic (no per-file inference).
    */
  val salesRawSchema: StructType = StructType(Seq(
    StructField("Sale_ID", StringType),
    StructField("Product", StringType),
    StructField("Amount", StringType),
    StructField("Date", StringType)
  ))

  /** Column with this row's source-file stem (name minus `.csv`). */
  private def fileStem: org.apache.spark.sql.Column =
    regexp_extract(input_file_name(), "([^/]+)\\.csv$", 1)

  /** S1: read every `*.csv` under `dir`, adding:
    *  - `Audit_Date`: timestamp parsed from the filename stem (null when
    *    the stem is not `yyyy-MM-dd` — `errors='coerce'`),
    *  - `_ingest_file`, `_ingest_id`: ingestion-order key used by
    *    keep-first dedup (M1). pandas keep-first depends on file
    *    enumeration order then row order; we order by (file name, id
    *    within scan). `monotonically_increasing_id` is ordered within a
    *    partition, and each small CSV is one partition; for files larger
    *    than one split the within-file order is only per-split — callers
    *    needing a total order at scale should carry an explicit sequence
    *    column in the data instead.
    */
  def readSalesDirectory(
      spark: SparkSession,
      dir: String,
      schema: StructType = salesRawSchema): DataFrame = {
    // Reference fidelity (etl_utils.py:200-202): an empty/absent input
    // directory yields an EMPTY frame, not an error — Spark's glob read
    // would throw PATH_NOT_FOUND instead. The listing is a cheap
    // driver-side stat, not a data read.
    //
    // The TOP-LEVEL file list is passed explicitly (not a dir +
    // pathGlobFilter, which recurses into subdirectories and runs
    // partition discovery — a key=value subdir would append an unexpected
    // partition column to the fixed schema and nested CSVs would be
    // ingested, deviating from the reference's flat os.listdir semantics
    // at etl_utils.py:166-206). At cluster scale the driver-side listing
    // of one directory is O(files) metadata, not a data scan.
    val csvFiles = {
      val files = new java.io.File(dir).listFiles()
      if (files == null) Array.empty[String]
      else files.filter(f => f.isFile && f.getName.endsWith(".csv"))
        .map(_.getPath).sorted
    }
    val raw =
      if (csvFiles.nonEmpty)
        spark.read
          .schema(schema)
          .option("header", "true")
          .option("mode", "PERMISSIVE")
          .csv(csvFiles: _*)
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    raw
      .withColumn("Audit_Date", try_to_timestamp(fileStem, lit("yyyy-MM-dd")))
      .withColumn("_ingest_file", input_file_name())
      .withColumn("_ingest_id", monotonically_increasing_id())
  }

  /** S2: single CSV read + optional coercing date parse
    * (`etl_utils.py:71-106`; dead code in the reference but part of its
    * public util surface).
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      convertDate: Boolean = false,
      dateCol: String = "Date"): DataFrame = {
    val df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    if (convertDate && df.columns.contains(dateCol))
      df.withColumn(dateCol, try_to_timestamp(col(dateCol), lit("yyyy-MM-dd")))
    else df
  }
}
