package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A deterministic "raw sales feed" derived from `lineitem`, exercising
  * every trap in the reference's input domain (SURVEY §2.5, FIXTURES.md §1):
  * lowercase Sale_IDs with nulls and duplicates, dash-separated Products
  * with padding and nulls, Amounts as strings with `USD`/`EUR` suffixes
  * (spaced and unspaced), an `EUR `-prefixed form, currency-less numerics,
  * and nulls, Dates with garbage and nulls, and a sometimes-null
  * `Audit_Date`.
  *
  * Every expression is pure integer/string arithmetic so the identical CTE
  * (`SyntheticSales.sql`) evaluates bit-identically in DuckDB for the
  * oracle compare — amounts are built from integer cents, never from
  * double→string casts (whose formatting differs across engines).
  */
object SyntheticSales {

  /** Spark side. Columns: Sale_ID, Product, Amount, Date (all nullable
    * strings), Audit_Date (nullable timestamp), _ord (unique long,
    * ingestion order for keep-first dedup).
    */
  def apply(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val cents = (col("l_partkey") * 7919 + col("l_linenumber") * 131) % 1000000
    val amt = concat(
      (cents / 100).cast("long").cast("string"),
      lit("."),
      lpad((cents % 100).cast("string"), 2, "0"))
    val m = col("l_linenumber") % 6
    li.select(
      // Sale_ID cardinality must GROW with data size (a fixed modulus
      // caps dedup parallelism at scale): orderkey DIV 4 keeps ~4 orders
      // × ~4 lines = ~16 copies per key at every sf.
      when(col("l_orderkey") % 97 === 0, lit(null))
        .otherwise(concat(lit("s"), expr("l_orderkey DIV 4").cast("string")))
        .as("Sale_ID"),
      when(col("l_partkey") % 53 === 0, lit(null))
        .when(col("l_partkey") % 7 === 0,
          concat(lit("  gros-"), lower(col("l_returnflag")), lit("  ")))
        .otherwise(concat(lit("cat-"), lower(col("l_returnflag"))))
        .as("Product"),
      when(m === 0, concat(amt, lit(" USD")))
        .when(m === 1, concat(amt, lit(" EUR")))
        .when(m === 2, concat(amt, lit("EUR")))
        .when(m === 3, amt)
        .when(m === 4, concat(lit("EUR "), amt))
        .otherwise(lit(null))
        .as("Amount"),
      when((col("l_orderkey") + col("l_linenumber")) % 29 === 0, lit("not-a-date"))
        .when((col("l_orderkey") + col("l_linenumber")) % 29 === 1, lit(null))
        .otherwise(date_format(col("l_shipdate"), "yyyy-MM-dd"))
        .as("Date"),
      when(col("l_suppkey") % 13 === 0, lit(null).cast("timestamp"))
        .otherwise(date_trunc("month", col("l_shipdate")))
        .as("Audit_Date"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("_ord"))
  }

  /** The same frame as a DuckDB CTE body (`SELECT ... FROM lineitem`). */
  val sql: String = """
    SELECT
      CASE WHEN l_orderkey % 97 = 0 THEN NULL
           ELSE 's' || CAST(l_orderkey // 4 AS VARCHAR) END AS "Sale_ID",
      CASE WHEN l_partkey % 53 = 0 THEN NULL
           WHEN l_partkey % 7 = 0 THEN '  gros-' || lower(l_returnflag) || '  '
           ELSE 'cat-' || lower(l_returnflag) END AS "Product",
      CASE l_linenumber % 6
           WHEN 0 THEN amt || ' USD'
           WHEN 1 THEN amt || ' EUR'
           WHEN 2 THEN amt || 'EUR'
           WHEN 3 THEN amt
           WHEN 4 THEN 'EUR ' || amt
           ELSE NULL END AS "Amount",
      CASE WHEN (l_orderkey + l_linenumber) % 29 = 0 THEN 'not-a-date'
           WHEN (l_orderkey + l_linenumber) % 29 = 1 THEN NULL
           ELSE strftime(l_shipdate, '%Y-%m-%d') END AS "Date",
      CASE WHEN l_suppkey % 13 = 0 THEN NULL
           ELSE date_trunc('month', l_shipdate) END AS "Audit_Date",
      l_orderkey * 10 + l_linenumber AS _ord
    FROM (
      SELECT *,
        CAST(((l_partkey * 7919 + l_linenumber * 131) % 1000000) // 100 AS VARCHAR)
          || '.' ||
        lpad(CAST(((l_partkey * 7919 + l_linenumber * 131) % 1000000) % 100 AS VARCHAR), 2, '0')
          AS amt
      FROM lineitem)
  """
}
