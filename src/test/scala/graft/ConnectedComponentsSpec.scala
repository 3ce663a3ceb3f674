package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .labelPropagation(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("labelPropagation: chain, star, cycle, and separate components") {
    // chain 1-2-3-4-5 (diameter stresses iteration), star 10-{11,12,13},
    // 3-cycle 20-21-22-20, isolated pair 30-31
    val got = labels(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (22L, 20L),
      (31L, 30L)))
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("labelPropagation: empty edge list converges to empty output") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.labelPropagation(empty, "a", "b").count() === 0)
  }

  test("labelPropagation matches driver-side union-find on a random graph") {
    // deterministic pseudo-random graph: 120 nodes, 90 modular edges
    val edges = (0 until 90).map(i => ((i * 37 % 120).toLong, (i * 53 % 120).toLong))
      .filter { case (a, b) => a != b }
    val got = labels(edges)

    // brute-force union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(n => n -> find(n)).toMap
    // union-find representative under min-merge = min id of the component
    assert(got === want)
    assert(got.nonEmpty)
    // the O(log n) star algorithm must agree on the same graph
    val viaStars = ConnectedComponents
      .alternatingStars(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(viaStars === want)
  }

  test("dupGroups: group id is min doc id, sizes cover every member") {
    val pairs = Seq((5L, 3L), (3L, 9L), (100L, 101L)).toDF("doc_a", "doc_b")
    val got = ConnectedComponents.dupGroups(pairs, "doc_a", "doc_b")
      .select("doc_id", "group_id", "group_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (3L, 3L, 3L), (5L, 3L, 3L), (9L, 3L, 3L),
      (100L, 100L, 2L), (101L, 100L, 2L)))
  }

  test("alternatingStars agrees with labelPropagation on mixed graphs") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (22L, 20L),
      (31L, 30L))
    val viaStars = ConnectedComponents
      .alternatingStars(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(viaStars === labels(edges))
  }

  test("alternatingStars converges in O(log n) rounds on a 200-node chain") {
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    // diameter 199: labelPropagation would need ~200 rounds; the star
    // algorithm must finish within its default 20-round budget
    val got = ConnectedComponents.alternatingStars(chain, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 200 && got.values.forall(_ === 0L))
  }

  test("alternatingStars handles duplicate/reversed/self edges and empties") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 2L), (3L, 1L)).toDF("a", "b")
    val got = ConnectedComponents.alternatingStars(messy, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.alternatingStars(empty, "a", "b").count() === 0)
  }

  test("labelPropagation fails loudly when maxIter is below the diameter") {
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.labelPropagation(chain, "a", "b", maxIter = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
