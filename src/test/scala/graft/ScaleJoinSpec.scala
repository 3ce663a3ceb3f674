package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale-mechanics proofs: bucketing removes the join shuffle entirely,
  * and salted joins spread a hot key without changing results.
  */
class ScaleJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join with ZERO shuffle exchanges (co-located join)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.queries.Tables(spark, dir, "orders")
      val customer = graft.queries.Tables(spark, dir, "customer")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

      val bucketed = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free, got:\n$plan")

      val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"),
        "sanity: the unbucketed shuffle join does exchange")
      assert(bucketed.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // heavy-tailed: 80% of rows share one key
    val big = (0 until 5000).map { i =>
      (if (i % 5 == 0) i % 7 else 1L, i.toLong)
    }.toDF("k", "payload")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltSource = col("payload"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }
}
