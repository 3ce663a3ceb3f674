package graft

import scala.collection.concurrent.TrieMap
import graft.etl.{EtlMetrics, SalesJob}
import graft.queries.SalesFixture

/** observe()-based row-count metrics: counts ride along with existing
  * actions (no extra jobs) and reach the listener.
  */
class EtlMetricsSpec extends SparkSpec {

  test("SalesJob emits observed row counts for every stage") {
    val seen = TrieMap.empty[String, Long]
    val listener = EtlMetrics.onMetrics(spark)((name, rows) => seen.put(name, rows))
    try {
      val outputs = SalesJob.run(spark, SalesFixture.ensure("metricstest"), SalesFixture.schema)
      val validRows = outputs.valid.count()
      val invalidRows = outputs.invalid.count()
      // listener delivery is async on the listener bus — poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
        !(seen.contains("sales_valid") && seen.contains("sales_invalid"))) Thread.sleep(50)
      assert(seen.get("sales_valid").contains(validRows))
      assert(seen.get("sales_invalid").contains(invalidRows))
      assert(seen.contains("sales_raw"), "raw scan count observed via the same actions")
    } finally spark.listenerManager.unregister(listener)
  }
}
