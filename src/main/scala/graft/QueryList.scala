package graft

/** Prints every registered SparkEntry query name, one per line, without
  * starting Spark — the chunked close driver (tools/run_close.py) uses
  * this to split the suite into separate-JVM SPARK_GRAFT_ONLY batches.
  */
object QueryList {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
