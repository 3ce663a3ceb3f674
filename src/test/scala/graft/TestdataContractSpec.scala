package graft

import org.apache.spark.sql.types._

/** Schema contract for the harness testdata (TESTDATA.md).
  *
  * Round 8 lost its entire external verification run to silent environment
  * drift: `/root/testdata` was regenerated with `events.ts` as parquet
  * TIMESTAMP(MICROS) where every prior generation shipped TIMESTAMP(NANOS),
  * and the first symptom was 32 queries erroring deep inside the driver
  * harness. This spec turns the next such drift into a one-glance
  * diagnosis: it pins the schema each table presents AFTER loading through
  * [[graft.queries.Tables]] (i.e. the contract every operator in the repo
  * programs against), and on mismatch the failure message prints the
  * actual loaded schema next to the expected one.
  *
  * `events.ts` is asserted as TimestampType specifically because
  * `Tables.events` normalizes both known on-disk encodings (nanos-as-LONG
  * and native µs TIMESTAMP_NTZ) to that one type — if the driver ships a
  * third encoding, this is the test that names it.
  */
class TestdataContractSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  private def loaded(name: String) = name match {
    case "events" => graft.queries.Tables.events(spark, dir)
    case other    => graft.queries.Tables(spark, dir, other)
  }

  // `o_orderdate`/`l_shipdate` may legitimately arrive as NTZ or (if a
  // future regeneration flips isAdjustedToUTC) instant timestamps; both
  // behave identically under the session's pinned UTC zone, so the
  // contract accepts either rather than failing on a no-op drift.
  private def compatible(exp: DataType, got: DataType): Boolean =
    exp == got || (exp == TimestampNTZType && got == TimestampType)

  for ((table, cols) <- expected.toSeq.sortBy(_._1))
    test(s"$table loads with the contracted schema") {
      val df     = loaded(table)
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      val render = actual.map { case (n, t) => s"$n:${t.simpleString}" }
        .mkString(", ")
      assert(actual.map(_._1) == cols.map(_._1),
        s"column drift in $table — loaded schema is [$render]")
      for (((name, exp), (_, got)) <- cols.zip(actual))
        assert(compatible(exp, got),
          s"type drift in $table.$name — expected ${exp.simpleString}, " +
            s"parquet now loads as ${got.simpleString} " +
            s"(full loaded schema: [$render])")
    }

  test("events.ts normalizes to one type at every shipped SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val t = graft.queries.Tables.events(spark, s"/root/testdata/$sf")
        .schema("ts").dataType
      assert(t == TimestampType, s"$sf events.ts loaded as ${t.simpleString}")
    }
  }
}
