package graft

import org.apache.spark.sql.functions._
import graft.operators.RecordLinkage

/** X291 sorted-neighborhood blocking: exact window semantics (every
  * pair within rank distance < w, nothing else), tie determinism, and
  * the motivating case — a prefix-damaged key that equi-blocking on a
  * prefix loses but a suffix sort keeps adjacent.
  */
class SortedNeighborhoodSpec extends SparkSpec {

  import spark.implicits._

  test("pairs are exactly the rank-window pairs, in sort order") {
    val recs = Seq((1L, "b"), (2L, "a"), (3L, "d"), (4L, "c"))
      .toDF("id", "k")
    // sort order by k: 2(a) 1(b) 4(c) 3(d); w=2 -> adjacent pairs only
    val got = RecordLinkage.sortedNeighborhoodPairs(recs, "id",
        Seq(col("k")), w = 2)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 1L), (1L, 4L), (4L, 3L)))
  }

  test("w=3 adds exactly the distance-2 pairs") {
    val recs = Seq((1L, "b"), (2L, "a"), (3L, "d"), (4L, "c"))
      .toDF("id", "k")
    val got = RecordLinkage.sortedNeighborhoodPairs(recs, "id",
        Seq(col("k")), w = 3)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 1L), (1L, 4L), (4L, 3L), (2L, 4L), (1L, 3L)))
  }

  test("equal keys order by the id tie-break") {
    val recs = Seq((30L, "x"), (10L, "x"), (20L, "x")).toDF("id", "k")
    val got = RecordLinkage.sortedNeighborhoodPairs(recs, "id",
        Seq(col("k")), w = 2)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 20L), (20L, 30L)))
  }

  test("suffix sort keeps a prefix-damaged record adjacent to its master") {
    // master "Customer#42" vs OCR'd "XCustomer#42": a first-3-chars
    // equi-block separates them forever; sorting by reverse(name)
    // puts them side by side
    val recs = Seq(
      (1L, "Customer#41"), (2L, "Customer#42"), (3L, "Customer#43"),
      (1000002L, "XCustomer#42")).toDF("id", "name")
    val sn = RecordLinkage.sortedNeighborhoodPairs(recs, "id",
        Seq(reverse(col("name"))), w = 2)
      .as[(Long, Long)].collect().toSet
    assert(sn.contains((2L, 1000002L)) || sn.contains((1000002L, 2L)),
      s"dirty twin not adjacent under suffix sort: $sn")
    val equiBlock = recs.withColumn("_b", substring(col("name"), 1, 3))
      .as[(Long, String, String)].collect()
      .groupBy(_._3).values.filter(_.length > 1)
      .flatMap(g => g.combinations(2)).map(p => (p(0)._1, p(1)._1)).toSet
    assert(!equiBlock.exists(p =>
      Set(p._1, p._2) == Set(2L, 1000002L)),
      "prefix equi-block unexpectedly kept the damaged pair")
  }
}
