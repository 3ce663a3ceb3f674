package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{RefSurface, SyntheticSales}
import graft.etl.SalesEtl
import org.apache.spark.sql.functions.col

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline shape: raw sales feed → valid-sales
    * cleaning (Q1) → monthly Mes×Producto summary (Q3).
    */
  def entry(spark: SparkSession): DataFrame =
    RefSurface.queries("q3_monthly_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-data-pipeline extension surface (BASELINE.json north star).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefSurface.queries ++ graft.queries.LlmSurface.queries ++
      graft.queries.StreamSurface.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefSurface.oracleSql ++ graft.queries.LlmSurface.oracleSql ++
      graft.queries.StreamSurface.oracleSql

  /** Queries whose result must be NON-EMPTY at verify scale (sf0.01): a
    * 0-row result that hash-matches an equally empty oracle is a vacuous
    * green — both engines agreeing on nothing verifies nothing
    * (`llm_curation_pipeline` shipped exactly that for two rounds).
    * Every current query is expected to produce rows; list-valued so a
    * future legitimately-empty query (e.g. an anti-join over clean data)
    * can opt out explicitly rather than silently.
    */
  def expectNonEmpty: Set[String] = queries.keySet
}
