package graft
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.execution.FormattedMode

/** Measurement tooling (optimization guide §1/§7.2): dump the
  * `.explain("formatted")` physical plan of named queries to
  * `<outDir>/<name>.txt` so plan claims (Exchange count, join strategy,
  * PushedFilters, ReadSchema, codegen spans) are checkable artifacts.
  *
  * Usage: PlanDump <sfDir> <outDir> [name ...]   (no names = all)
  *
  * Plans only — nothing executes, so this is cheap and safe to run
  * next to a bench. Queries that stage side inputs (streaming harness
  * replays) still run their staging; pass names deliberately.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-plandump")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val txt =
        try fn(spark, sfDir).queryExecution.explainString(FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      Files.write(Paths.get(outDir, s"$n.txt"),
        txt.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      println(s"planned $n (${txt.length} chars)")
    }
    spark.stop()
  }
}
