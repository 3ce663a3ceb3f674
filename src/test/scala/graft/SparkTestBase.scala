package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for the suite (one JVM per `sbt test` fork; the
  * session is never stopped so suites can share it).
  */
object SparkTestBase {
  // the production builder (same confs the mains run with — tests audit
  // the plans users get), scaled down to 4 cores
  lazy val spark: SparkSession = graft.GraftSession.builder(4, "graft-test")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse-").toString)
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
}
