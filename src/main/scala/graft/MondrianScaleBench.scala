package graft

import org.apache.spark.sql.functions._
import graft.operators.Mondrian

/** Scale/growth artifact for Mondrian k-anonymization (X214) — one JSON
  * line, recorded in BASELINE.md.
  *
  * The claim under test: `partition` costs `depth` LINEAR corpus passes
  * (one combine-agg + metadata window + broadcast join + slim
  * checkpoint per round), so doubling the corpus should roughly double
  * the wall clock — and the doubled corpus gets MORE cuts (every region
  * has twice the mass to halve), so leaf count growth is also reported:
  * sublinear-in-rows leaf growth with ~linear time is the signature of
  * the per-round shape holding. The 2× corpus unions a price-shifted
  * copy (shift keeps the distribution's SHAPE but moves the mass, so
  * cuts land differently — the artifact is not a cache replay).
  */
object MondrianScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(cpus, "graft-mondrian-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (Double, T) = {
      val s = System.nanoTime()
      val out = f
      ((System.nanoTime() - s) / 1e9, out)
    }

    val rows = spark.read.parquet(s"$sfDir/orders.parquet").select(
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
        .cast("long").as("eday"))
    val n1 = rows.count()
    val doubled = rows.unionByName(
      rows.select((col("cents") + 2000000L).as("cents"), col("eday")))

    def leaves(df: org.apache.spark.sql.DataFrame): Long =
      Mondrian.generalize(
        Mondrian.partition(df, "cents", "eday",
          k = 50, depth = 8, w1 = 500000L, w2 = 30L)).count()

    val (t1a, l1) = time(leaves(rows))
    val (t2, l2) = time(leaves(doubled))
    val (t1b, _) = time(leaves(rows)) // repeat 1x to expose warmup skew

    val t1 = math.min(t1a, t1b)
    println(
      s"""{"metric":"mondrian_scale","rows_1x":$n1,"rows_2x":${n1 * 2},""" +
      s""""sec_1x":${f"$t1%.2f"},"sec_2x":${f"$t2%.2f"},""" +
      s""""growth":${f"${t2 / t1}%.2f"},""" +
      s""""leaves_1x":$l1,"leaves_2x":$l2,"sf":"$sfDir"}""")
    spark.stop()
  }
}
