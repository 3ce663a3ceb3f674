package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Parquet table loader for the harness test data (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as two different parquet logical types across
    * harness generations, so the conversion branches on the LOADED schema
    * rather than assuming either:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright; the session
    *    reads the nanos as LONG (`spark.sql.legacy.parquet.nanosAsLong`,
    *    set once in [[graft.GraftSession.builder]] — never flipped here: a
    *    library function mutating session confs leaks configuration into
    *    every later query on the session) and this converts with exact
    *    integer `DIV` (the data carries µs precision, nothing truncates;
    *    `/` would be a lossy DOUBLE divide).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark loads it natively
    *    as TIMESTAMP_NTZ; cast to TimestampType so downstream operators
    *    see one type either way. The session timezone is pinned to UTC
    *    (GraftSession), so the cast reinterprets the wall-clock as the
    *    same epoch-µs instant the nanos branch produces — the two paths
    *    are value-identical, and the DuckDB oracles read `ts` natively.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    val ts = df.schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts DIV 1000"))
      case _        => col("ts").cast(TimestampType)
    }
    df.withColumn("ts", ts)
  }
}
