package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's three transform pipelines plus the date formatter
  * (SURVEY §2.5: Q1–Q4), re-expressed as pure `DataFrame => DataFrame`
  * column-expression chains.
  *
  * Faithfulness notes (each cites the reference line it reproduces):
  *  - EUR→USD is ×0.85 as coded (`main.py:81`; README confirms).
  *  - EUR detection tests the ORIGINAL string's suffix (`main.py:81`),
  *    while stripping removes `USD`/`EUR` anywhere (`main.py:77`).
  *  - Rounding matches numpy: scale by 100, round-half-even on the scaled
  *    double, divide (`Series.round(2)`, `main.py:83`) — expressed as
  *    `bround(x*100, 0)/100`, NOT Spark's `bround(x, 2)` (which rounds the
  *    shortest decimal repr instead of the scaled raw double).
  *  - The invalid flow stringifies nulls to "nan" (`astype(str)`,
  *    `main.py:112-113`) BEFORE the any-null mask (`main.py:119`), so null
  *    Sale_ID/Product never produce Reason=N.
  *  - Valid and invalid flows both consume the raw input independently —
  *    their outputs overlap by design (`main.py:184-185`).
  *
  * Execution shape at scale: Q1 is one narrow codegen'd stage plus a single
  * hash-partitioned exchange for keep-first dedup; Q2 is narrow plus one
  * exchange for the duplicate-count window; Q3 is a partial+final hash
  * aggregate (one exchange) plus a range exchange for the ordered output.
  * Nothing here collects to the driver.
  */
object SalesEtl {

  /** numpy `np.round(x, 2)` semantics: half-to-even applied to the scaled
    * raw double (`rint(x*100)/100`), matching `Series.round(2)` at
    * `main.py:83`. numpy rounds by scale → `rint` → unscale, and Spark's
    * `rint` IS `Math.rint` — IEEE round-half-to-even on the raw double —
    * so this is bit-equal to numpy (verified against numpy/pandas on the
    * classic traps: 2.675→2.68 because 2.675*100 == 267.5 exactly in
    * IEEE, 0.125→0.12, 1.005→1.0, 0.135→0.14). Preferred over
    * `bround(x*100, 0)`, which detours through BigDecimal re-rounding of
    * the shortest decimal repr — same results on doubles but a far
    * slower non-intrinsic path.
    */
  def numpyRound2(c: Column): Column = rint(c * 100) / 100

  /** Deterministic cross-engine rounding for oracle-checked queries: pure
    * IEEE ops (`floor(x*100 + 0.5)/100`) that evaluate bit-identically in
    * Spark and DuckDB. Semantically half-up on the raw double.
    */
  def halfUpCents(c: Column): Column = floor(c * 100 + 0.5) / 100.0

  /** `Product` normalization used by Q1 (`main.py:67`): upper → trim →
    * split on '-' → last token. The last token is NOT re-trimmed
    * ("CAT - Y" → " Y"), matching pandas.
    */
  private def productLastToken(c: Column): Column =
    element_at(split(trim(upper(c)), "-"), -1)

  /** Q1 — `limpiar_ventas_validas` (`main.py:53-100`).
    *
    * @param orderCols ingestion-order columns for keep-first dedup
    *        (`drop_duplicates(keep='first')`, `main.py:63`). pandas
    *        keep-first is ingestion-order-dependent; Spark needs the order
    *        made explicit — and it must be a TOTAL order (add payload
    *        columns as tiebreakers if the leading key can repeat). The
    *        default matches `SalesSource.readSalesDirectory`'s documented
    *        ingestion order: file path first (pandas enumerates files in
    *        name order), then id-within-scan — NOT `_ingest_id` alone,
    *        whose partition-index prefix follows Spark's size-descending
    *        file bin-packing rather than filename order.
    * @param round2 rounding strategy (numpyRound2 for pandas fidelity;
    *        halfUpCents for cross-engine-deterministic oracle queries).
    * @param extraCols input columns to carry through to the output (e.g.
    *        ingestion-order keys, so callers can reproduce pandas' row
    *        order at the sink).
    * @param strictAmount P8 strictness parity (`main.py:79`): pandas
    *        `astype(float)` RAISES on unparseable text (a None passes
    *        through as NaN), and that crash is the signal that tells an
    *        operator their feed is garbage. Default `false` = `try_cast`
    *        nulls the row into the drop path (documented divergence —
    *        convenient, but silent); `true` fails the job with the
    *        offending string in the message, matching the reference.
    */
  def cleanValidSales(
      df: DataFrame,
      orderCols: Seq[Column] = Seq(col("_ingest_file"), col("_ingest_id")),
      round2: Column => Column = numpyRound2,
      extraCols: Seq[String] = Nil,
      strictAmount: Boolean = false): DataFrame = {
    // ---- Sale_ID: upper, drop nulls, keep-first dedup (main.py:59-63).
    // Keep-first under a TOTAL ascending order is argmin — expressed as
    // min_by(payload, orderKey) so the aggregation gets a map-side
    // partial combine: the shuffle carries ~|keys| rows per partition
    // instead of every row, and no per-key sort runs (the row_number
    // window form shuffles everything and sorts each key group — at
    // 100 TB that's the difference between a combine-style agg and a
    // full-data sort). Struct comparison is field-lexicographic with
    // nulls first, matching the oracle's ORDER BY ... NULLS FIRST.
    val upped = df
      .withColumn("Sale_ID", upper(col("Sale_ID")))
      .filter(col("Sale_ID").isNotNull)
    val others = upped.columns.filterNot(_ == "Sale_ID")
    val dedup = upped
      .groupBy("Sale_ID")
      .agg(min_by(struct(others.map(col): _*), struct(orderCols: _*)).as("_first"))
      .select(col("Sale_ID") +: others.map(n => col(s"_first.`$n`").as(n)): _*)
    // ---- Product: upper/trim/split-last, drop nulls (main.py:67-69)
    val prod = dedup
      .withColumn("Product", productLastToken(col("Product")))
      .filter(col("Product").isNotNull)
    // ---- Amount (main.py:75-87): strip currency tokens anywhere, float
    // cast, ×0.85 when the ORIGINAL string ends with EUR, round, drop null.
    // Default: try_cast = null-on-garbage (pandas astype raises;
    // documented divergence, SURVEY P8). strictAmount restores the
    // pandas raise via assert_true, evaluated in-row so the job fails on
    // the FIRST unparseable amount with the string in the message.
    val origEndsEur = coalesce(col("Amount").endsWith("EUR"), lit(false))
    val tried = regexp_replace(col("Amount"), "USD|EUR", "").try_cast(DoubleType)
    val parsed =
      if (!strictAmount) tried
      else when(
        assert_true(col("Amount").isNull || tried.isNotNull,
          concat(lit("could not convert string to float (strict P8, main.py:79): '"),
            col("Amount"), lit("'"))).isNull,
        tried)
    val amount = prod
      .withColumn(
        "Amount",
        round2(when(origEndsEur, parsed * 0.85).otherwise(parsed)))
      .filter(col("Amount").isNotNull)
    // ---- Dates: coercing parse, drop nulls (main.py:92-97)
    val dated = amount
      .withColumn("Date", coerceTimestamp(amount, "Date"))
      .withColumn("Audit_Date", coerceTimestamp(amount, "Audit_Date"))
      .filter(col("Date").isNotNull)
      .filter(col("Audit_Date").isNotNull)
    val out = Seq("Sale_ID", "Product", "Amount", "Date", "Audit_Date") ++ extraCols
    dated.select(out.map(col): _*)
  }

  /** Q2 — `limpiar_ventas_invalidas` (`main.py:106-151`).
    *
    * Reason priority N > A > D via cascading mask subtraction; a row gets
    * exactly one Reason; output block order is N, A, D (`main.py:141`).
    * Emits a `_block` ordering column so callers can reproduce the
    * reference's output order; `Amount`/`Date` stay RAW strings.
    */
  def detectInvalidSales(df: DataFrame): DataFrame = {
    // astype(str) maps null → "nan" → "NAN" after upper (main.py:112-113)
    val d = df
      .withColumn("Sale_ID", upper(coalesce(col("Sale_ID"), lit("nan"))))
      .withColumn(
        "Product",
        upper(element_at(split(coalesce(col("Product"), lit("nan")), "-"), -1)))
    // any-null across the frame AFTER stringification (main.py:119): only
    // Amount / Date / Audit_Date can still be null.
    val anyNull = Seq("Amount", "Date", "Audit_Date")
      .map(col(_).isNull).reduce(_ || _)
    // Amount_str regex currency test (main.py:127-129); null=false is
    // unreachable here (null Amount rows are Reason=N).
    val hasCurrency = coalesce(upper(col("Amount")).rlike("USD|EUR"), lit(false))

    // Single pass (vs the pandas 3-way frame split at main.py:119-141):
    // the D rule only counts duplicates among rows that survived N and A
    // (duplicated(keep=False) on the remaining frame, main.py:136), so the
    // per-Sale_ID copy count is a CONDITIONAL window sum over the same
    // scan instead of a filter → window → union-back-together. One read of
    // the input + one hash exchange on Sale_ID; the cascaded `when`
    // preserves the strict N > A > D priority.
    val wDup = Window.partitionBy("Sale_ID")
    val restCopies =
      sum(when(!anyNull && hasCurrency, 1).otherwise(0)).over(wDup)
    d.withColumn(
        "Reason",
        when(anyNull, "N")
          .when(!hasCurrency, "A")
          .when(restCopies > 1, "D"))
      .filter(col("Reason").isNotNull)
      // N-block, then A, then D — the reference's concat order (main.py:141)
      .withColumn(
        "_block",
        when(col("Reason") === "N", 1).when(col("Reason") === "A", 2).otherwise(3))
  }

  /** Q3 — `generar_ventas_resumen_mensual` (`main.py:156-179`): Mes
    * (`MM/yyyy`, `main.py:164`) × Product → sum/count/min of Amount,
    * lexicographically sorted by the string group keys (pandas groupby
    * sort=True — note "06/2023" sorts AFTER "05/2025").
    * `count` counts non-null Amount only (agg on the Amount column).
    */
  def monthlySummary(df: DataFrame): DataFrame =
    df.withColumn("Mes", date_format(col("Date"), "MM/yyyy"))
      .groupBy(col("Mes"), col("Product").as("Producto"))
      .agg(
        sum("Amount").as("Ventas_Totales"),
        count("Amount").as("Numero_Transacciones"),
        min("Amount").as("Venta_Minima"))
      .orderBy("Mes", "Producto")

  /** Q4 — `formatear_fechas` (`main.py:201-210`): for `Date`/`Audit_Date`
    * if present, coercing re-parse then format `yyyy-MM-dd` (NaT → null →
    * empty cell at the CSV sink).
    */
  def formatDates(df: DataFrame): DataFrame =
    Seq("Date", "Audit_Date").foldLeft(df) { (d, c) =>
      if (d.columns.contains(c))
        d.withColumn(c, date_format(coerceTimestamp(d, c), "yyyy-MM-dd"))
      else d
    }

  /** `pd.to_datetime(col, errors='coerce')`: identity on timestamps,
    * null-on-garbage parse for strings (ANSI-safe via try_to_timestamp).
    */
  private def coerceTimestamp(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case TimestampType | DateType => col(name).cast(TimestampType)
      case _ => try_to_timestamp(col(name))
    }
}
