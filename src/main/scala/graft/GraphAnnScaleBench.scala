package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.VectorOps

/** Scale artifact for the partitioned graph ANN (X286) — one JSON line,
  * recorded in BASELINE.md.
  *
  * The claim under test: beam-search probe cost is STRUCTURE-bounded
  * (≤ beam·(degree+ringLinks+1)·hops scored candidates per query per
  * shard), independent of corpus size — the property that makes a graph
  * index the serving shape at very large scale, vs IVF's nProbe/nList
  * corpus fraction. Measured: explored (scored) candidates per query at
  * 1× and 2× corpus (id-shifted union — every doc gains a twin, shard
  * populations double), plus edge counts (must grow linearly) and
  * build/search wall-clock.
  */
object GraphAnnScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(cpus, "graft-ann-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (Double, T) = {
      val s = System.nanoTime()
      val out = f
      ((System.nanoTime() - s) / 1e9, out)
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qv"))
      .localCheckpoint(true)

    // the SAME panel rule object the graded query uses — shared, so the
    // bench can never silently measure a different panel
    def panelOf(e: DataFrame): DataFrame =
      graft.queries.LlmSurface.annPanel(e.filter(col("vec_id") % 100 === 0))

    final case class Run(buildSec: Double, searchSec: Double, nEdges: Long,
      explored: Long, nQueries: Long)

    def run(e: DataFrame): Run = {
      val qs = panelOf(e).localCheckpoint(true)
      val nQ = qs.count()
      val (tBuild, edges) = time {
        val ed = VectorOps.graphAnnEdges(e, "vec_id", "qv",
          shards = 4, bits = 4, degree = 6, ringLinks = 2)
          .localCheckpoint(true)
        ed
      }
      val nEdges = edges.count()
      // TIMED search runs probe-free (a hopProbe count() would execute
      // each hop's candidate plan a second time INSIDE the timer and
      // inflate the recorded cost); the explored-candidate census runs
      // as a separate untimed pass with the probe attached
      val (tSearch, _) = time {
        VectorOps.graphAnnSearch(edges, e, qs, "vec_id", "qv",
          k = 5, beam = 8, hops = 4, shards = 4).count()
      }
      var explored = 0L
      VectorOps.graphAnnSearch(edges, e, qs, "vec_id", "qv",
        k = 5, beam = 8, hops = 4, shards = 4,
        hopProbe = (_, cand) => explored += cand.count()).count()
      Run(tBuild, tSearch, nEdges, explored, nQ)
    }

    val r1 = run(emb)
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val doubled = emb.unionByName(
        emb.select((col("vec_id") + maxId + 1).as("vec_id"), col("qv")))
      .localCheckpoint(true)
    val r2 = run(doubled)

    def perQ(r: Run): Double = r.explored.toDouble / r.nQueries
    println(
      s"""{"metric":"graph_ann_scale","build_1x_sec":${f"${r1.buildSec}%.2f"},""" +
      s""""search_1x_sec":${f"${r1.searchSec}%.2f"},"edges_1x":${r1.nEdges},""" +
      s""""explored_per_query_1x":${f"${perQ(r1)}%.1f"},"n_queries_1x":${r1.nQueries},""" +
      s""""build_2x_sec":${f"${r2.buildSec}%.2f"},"search_2x_sec":${f"${r2.searchSec}%.2f"},""" +
      s""""edges_2x":${r2.nEdges},"explored_per_query_2x":${f"${perQ(r2)}%.1f"},""" +
      s""""n_queries_2x":${r2.nQueries},""" +
      s""""explored_growth":${f"${perQ(r2) / perQ(r1)}%.2f"},""" +
      s""""edge_growth":${f"${r2.nEdges.toDouble / r1.nEdges}%.2f"},"sf":"$sfDir"}""")
    spark.stop()
  }
}
