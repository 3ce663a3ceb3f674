package graft

import org.apache.spark.sql.functions._
import graft.llm.VectorOps

/** X286 partitioned graph ANN: degree bounds, ring reachability
  * (Hamiltonian cycle per shard), exhaustive-beam ≡ exact-search
  * equivalence, and the recall-vs-IVF-PQ criterion from VERDICT r10 #7.
  */
class GraphAnnSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic pseudo-random 4-dim integer vectors. */
  private def corpus(n: Int) = (0 until n).map { i =>
    (i.toLong, Array.tabulate(4)(j => (((i * 31 + j * 17) % 21) - 10).toLong).toSeq)
  }.toDF("vec_id", "qv")

  test("out-degree bounded by degree + ringLinks") {
    val edges = VectorOps.graphAnnEdges(corpus(60), "vec_id", "qv",
      shards = 3, bits = 2, degree = 4, ringLinks = 2)
    val maxDeg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(maxDeg <= 6L)
    // every node has at least its ring successors (connectivity floor)
    val n = edges.select("src").distinct().count()
    assert(n === 60L)
  }

  test("ring makes every shard strongly connected from its entry") {
    val edges = VectorOps.graphAnnEdges(corpus(40), "vec_id", "qv",
      shards = 2, bits = 2, degree = 3, ringLinks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (sh <- 0 until 2) {
      val es = edges.filter(_._1 == sh).map(e => e._2 -> e._3)
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
      val nodes = (0 until 40).map(_.toLong).filter(_ % 2 == sh).toSet
      // BFS from an arbitrary node must reach the whole shard
      var seen = Set(nodes.head)
      var frontier = Set(nodes.head)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(es.getOrElse(_, Set.empty)) -- seen
        seen ++= frontier
      }
      assert(seen === nodes, s"shard $sh: ${nodes.size - seen.size} unreachable")
    }
  }

  test("exhaustive beam (beam/hops >= shard size) equals exact search") {
    val c = corpus(40).localCheckpoint(true)
    val qs = c.filter(col("vec_id") % 10 === 0)
    val edges = VectorOps.graphAnnEdges(c, "vec_id", "qv",
      shards = 2, bits = 2, degree = 3, ringLinks = 2)
    val g = VectorOps.graphAnnSearch(edges, c, qs, "vec_id", "qv",
      k = 5, beam = 24, hops = 24, shards = 2)
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "vec_id", "dist_q")
      .as[(Long, Int, Long, Long)].collect().toSet
    val allPairs = qs.select(col("vec_id").as("query_id"))
      .crossJoin(c.select(col("vec_id")))
      .filter(col("query_id") =!= col("vec_id"))
    val exact = VectorOps.refineTopK(allPairs, c, qs, "vec_id", "qv", k = 5)
      .select("query_id", "rank", "vec_id", "dist_q")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(g === exact)
  }

  test("insert: exhaustive-beam insertion edges are the exact 6-NN") {
    // with beam/hops covering whole shards, each inserted vector's
    // new out-edges must be exactly its 6 nearest base vectors
    val c = corpus(44).localCheckpoint(true)
    val base = c.filter(col("vec_id") % 11 =!= 7)
    val batch = c.filter(col("vec_id") % 11 === 7)
    val edges = VectorOps.graphAnnEdges(base, "vec_id", "qv",
      shards = 2, bits = 2, degree = 3, ringLinks = 2)
    val ins = VectorOps.graphAnnSearch(edges, base, batch, "vec_id", "qv",
        k = 6, beam = 24, hops = 24, shards = 2)
      .filter(col("rank") <= 6)
      .select("query_id", "rank", "vec_id")
      .as[(Long, Int, Long)].collect().toSet
    val allPairs = batch.select(col("vec_id").as("query_id"))
      .crossJoin(base.select(col("vec_id")))
    val exact = VectorOps.refineTopK(allPairs, base, batch, "vec_id",
        "qv", k = 6)
      .select("query_id", "rank", "vec_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(ins === exact)
  }

  test("sf0.001: graph top-5 recall >= the IVF-PQ row on the same panel") {
    val dir = "/root/testdata/sf0.001"
    def hits(name: String, flagCol: String): Long =
      graft.queries.LlmSurface.queries(name)(spark, dir)
        .filter(col(flagCol)).count()
    val graph = hits("llm_ann_graph", "in_graph_top5")
    val ivfPq = hits("llm_ann_recall", "in_approx_top5")
    assert(graph >= ivfPq, s"graph recall $graph < ivf-pq $ivfPq (of 25)")
  }
}
