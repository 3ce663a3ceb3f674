package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sinks.Sinks

/** Execution coverage for the K2 JDBC sink (no SQL Server in the sandbox;
  * Derby embedded — shipped with Spark for the metastore — stands in:
  * same `df.write.format("jdbc")` path, same SaveMode semantics), plus a
  * partition-pruning proof for the partitioned parquet layout a 100 TB
  * deployment would use.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driverOpt = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  test("writeJdbc Overwrite then Append: replace drops+recreates, append inserts") {
    val df = Seq((1L, "a", 10.5), (2L, "b", 20.25), (3L, "c", 30.0))
      .toDF("id", "name", "amount")
    Sinks.writeJdbc(df, url, "t_sales", SaveMode.Overwrite, options = driverOpt)
    def readBack() = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "t_sales").options(driverOpt).load()
    assert(readBack().count() === 3)
    // overwrite replaces
    Sinks.writeJdbc(df, url, "t_sales", SaveMode.Overwrite, options = driverOpt)
    assert(readBack().count() === 3)
    // append inserts
    Sinks.writeJdbc(df, url, "t_sales", SaveMode.Append, options = driverOpt)
    assert(readBack().count() === 6)
    val sums = readBack().agg(sum("amount")).as[Double].head()
    assert(math.abs(sums - 2 * (10.5 + 20.25 + 30.0)) < 1e-9)
  }

  test("writeCsvGolden round-trips adversarial fields (commas, quotes, newlines, whitespace)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quote-").toString
    val rows = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line\nbreak"),
      (5L, " leading and trailing "),
      (6L, null.asInstanceOf[String]))
    val df = rows.toDF("id", "v")
    val target = s"$dir/edge.csv"
    Sinks.writeCsvGolden(df, target)
    // read back with multiLine (embedded newlines live inside quotes) and
    // whitespace preservation — values must survive byte-for-byte, and
    // null must come back as null (written as the empty string)
    val back = spark.read
      .option("header", "true").option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(target)
      .select(col("id").cast("long"), col("v"))
      .as[(Long, Option[String])].collect().toMap
    rows.foreach { case (id, v) =>
      assert(back(id) === Option(v), s"field for id=$id must round-trip")
    }
  }

  test("K2 against SQL Server: dialect type mapping + replace semantics (etl_utils.py:134-160)") {
    // No SQL Server in the sandbox; what CAN be pinned without a server
    // is the DDL Spark would generate for the reference's three output
    // tables — Spark resolves jdbc:sqlserver URLs to MsSqlServerDialect,
    // and getJDBCType decides every column's database type. The
    // reference's pandas.to_sql(if_exists='replace') creates
    // varchar(max)/float/datetime columns via SQLAlchemy; Spark's
    // dialect choices below are the documented equivalents (NVARCHAR
    // (MAX) is unicode-safe where pandas' varchar(max) is not — an
    // improvement, not a divergence, for the Spanish product names in
    // the feed).
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    val d = JdbcDialects.get("jdbc:sqlserver://host;databaseName=ventas;integratedSecurity=true")
    assert(d.getClass.getName.contains("MsSqlServer"),
      s"sqlserver URL must resolve the MsSqlServer dialect, got ${d.getClass}")
    def ddl(t: DataType): Option[String] = d.getJDBCType(t).map(_.databaseTypeDefinition)
    // the three output tables' column types: valid (string/double/
    // timestamp), invalid (+Reason string), summary (string/double/long)
    assert(ddl(StringType) === Some("NVARCHAR(MAX)"), s"StringType -> ${ddl(StringType)}")
    assert(ddl(TimestampType) === Some("DATETIME"), s"TimestampType -> ${ddl(TimestampType)}")
    // Double/Long fall through to Spark's common JDBC mapping (DOUBLE
    // PRECISION / BIGINT) — the dialect deliberately doesn't override
    assert(ddl(DoubleType).isEmpty && ddl(LongType).isEmpty)
    // SaveMode.Overwrite parity with pandas if_exists='replace': Spark
    // DROPs and recreates by default (same as to_sql replace); with
    // option("truncate", true) it TRUNCATEs instead — keeping indexes/
    // permissions but requiring the schema to already match. The drop
    // default is the reference-faithful choice; the truncate statement
    // the dialect would issue is pinned here for the day someone flips
    // the option.
    assert(d.getTruncateQuery("dbo.ventas_validas") === "TRUNCATE TABLE dbo.ventas_validas")
  }

  test("month-partitioned parquet layout prunes partitions at scan time") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-part-").toString
    val df = (0 until 1000).map { i =>
      (s"2024-${"%02d".format(1 + i % 6)}", i.toLong, i * 1.5)
    }.toDF("mes", "id", "v")
    df.write.mode("overwrite").partitionBy("mes").parquet(tmp)

    val pruned = spark.read.parquet(tmp).filter(col("mes") === "2024-03")
    assert(pruned.count() === 1000 / 6 + (if (3 <= 1000 % 6) 1 else 0))
    // the filter must reach the scan as a PARTITION filter (directory
    // pruning), not a post-scan predicate (inputFiles reports the whole
    // relation pre-pruning, so assert on the planned scan instead)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in plan"))
    assert(scan.partitionFilters.map(_.sql).exists(_.contains("mes")),
      s"partition filters missing: ${scan.partitionFilters}")
    assert(scan.relation.partitionSchema.fieldNames.contains("mes"))
  }

  test("RFC CSV dialect: escape='\"' writes DOUBLED quotes, newline " +
    "fields stay quoted, roundtrip is lossless") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft-k13-unit-").toString + "/csv"
    val df = Seq((1L, "say \"hi\" now"), (2L, "a,b"), (3L, "l1\nl2"),
      (4L, "  pad  ")).toDF("id", "v")
    df.coalesce(1).write.option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .mode("overwrite").csv(out)
    val part = new java.io.File(out).listFiles()
      .find(_.getName.startsWith("part-")).get
    val raw = new String(java.nio.file.Files.readAllBytes(part.toPath),
      "UTF-8")
    // RFC 4180: quote-in-field doubles; Spark's DEFAULT backslash
    // escape would write \" and DuckDB would misread it
    assert(raw.contains("\"say \"\"hi\"\" now\""), raw)
    assert(raw.contains("\"l1\nl2\""), raw)
    assert(!raw.contains("\\\""), s"backslash escaping leaked: $raw")
    val back = spark.read.option("header", "true")
      .option("multiLine", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out).select(col("id").cast("long"), col("v"))
      .as[(Long, String)].collect().toSet
    assert(back === Set((1L, "say \"hi\" now"), (2L, "a,b"),
      (3L, "l1\nl2"), (4L, "  pad  ")))
  }
}
