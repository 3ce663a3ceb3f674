package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the harness test data (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * outright; the session reads the nanos as LONG
    * (`spark.sql.legacy.parquet.nanosAsLong`, set once in
    * [[graft.GraftSession.builder]] — never flipped here: a library
    * function mutating session confs leaks configuration into every
    * later query on the session) and this converts to a microsecond
    * timestamp with exact integer division (the data carries µs
    * precision, so nothing truncates).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
}
