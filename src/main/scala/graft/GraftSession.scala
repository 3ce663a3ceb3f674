package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession builder for this engine — the configuration
  * we would ship to a 1000-executor cluster, applied identically to the
  * local harness so plans exercised here are the plans run there.
  *
  *  - AQE on (runtime partition coalescing, skew-join splitting,
  *    join-strategy re-planning from real stats);
  *  - shuffle partitions sized to the parallelism at hand — NOT the
  *    200-partition default, which at local scale means 200 tiny tasks
  *    and at 100 TB means far too few (set it to ~2-3× total cores in
  *    production, AQE coalesces the excess);
  *  - 128 MiB scan splits (`files.maxPartitionBytes`) so a task's input
  *    fits comfortably in executor memory with room for shuffle buffers;
  *  - UTC session timezone — timestamp semantics must not depend on
  *    driver locale (and the DuckDB oracle compares UTC renderings).
  */
object GraftSession {

  def builder(cores: Int, appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet has shipped as both TIMESTAMP(NANOS) and
      // TIMESTAMP(MICROS) across harness generations. NANOS is rejected by
      // the vectorized reader, so keep reading nanos as LONG (Tables.events
      // branches on the loaded schema and converts with exact integer
      // division); the flag is a no-op for MICROS files. Set HERE, once, at
      // session build — a library function silently flipping session confs
      // mid-flight is the same leak class as persisting inside operators.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
