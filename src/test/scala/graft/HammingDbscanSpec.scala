package graft

import graft.operators.HammingDbscan

/** Hand-checked DBSCAN semantics in hamming space (X281) — the
  * bridge-demotion property that distinguishes it from CC dup groups,
  * border assignment, noise, and the dense-bridge merge case.
  *
  * Geometry (bits=12, maxHamming=2, minPts=4 ⇒ core needs ≥3
  * neighbors): cluster A = {0,1,2,3} (pairwise ≤2, each 3 neighbors),
  * cluster B = {448,449,450,451} (same shape, ≥3 bits from A),
  * bridge 12 = 0b000001100 (only neighbor in A: 0 — border),
  * hermit 45 = 0b000101101 (only neighbor: the non-core 12 — noise).
  */
class HammingDbscanSpec extends SparkSpec {

  import spark.implicits._

  private def run(hashes: Seq[Long], minPts: Int) =
    HammingDbscan.cluster(hashes.map(h => (h, h)).toDF("doc_id", "h"),
        "doc_id", "h", maxHamming = 2, minPts = minPts,
        chunks = 4, bits = 12)
      .as[(Long, Long, String, Option[Long])].collect()
      .map(r => r._1 -> r).toMap

  private val base = Seq(0L, 1L, 2L, 3L, 448L, 449L, 450L, 451L, 12L, 45L)

  test("two dense clusters stay separate; bridge is border, not glue") {
    val got = run(base, minPts = 4)
    for (d <- Seq(0L, 1L, 2L, 3L))
      assert(got(d)._3 === "core" && got(d)._4 === Some(0L), got(d))
    for (d <- Seq(448L, 449L, 450L, 451L))
      assert(got(d)._3 === "core" && got(d)._4 === Some(448L), got(d))
    // a CC dup-grouping would still keep these separate here, but the
    // point: 12 touches cluster A without ever extending it
    assert(got(12L) === ((12L, 2L, "border", Some(0L))))
    assert(got(45L) === ((45L, 1L, "noise", None)))
  }

  test("neighbor counts are the exact hamming-ball census") {
    val got = run(base, minPts = 4)
    assert(got(0L)._2 === 4L) // {1,2,3} + bridge 12
    assert(got(1L)._2 === 3L)
    assert(got(45L)._2 === 1L) // only the bridge
  }

  test("a DENSE bridge (core) legitimately merges the clusters") {
    // 384 = 0b110000000 is within 2 of 0 and of {448,449,450}: 4
    // neighbors ⇒ core ⇒ the two clusters become one component, 0.
    val got = run(base :+ 384L, minPts = 4)
    assert(got(384L)._3 === "core" && got(384L)._4 === Some(0L))
    for (d <- Seq(448L, 449L, 450L, 451L))
      assert(got(d)._4 === Some(0L), got(d))
  }

  test("isolated core cannot exist below minPts; lone pairs are noise") {
    // two mutual neighbors, nobody core at minPts=4 -> both noise
    val got = run(Seq(0L, 1L), minPts = 4)
    assert(got(0L)._3 === "noise" && got(1L)._3 === "noise")
    // at minPts=2 (core needs 1 neighbor) they form a cluster
    val got2 = run(Seq(0L, 1L), minPts = 2)
    assert(got2(0L) === ((0L, 1L, "core", Some(0L))))
    assert(got2(1L) === ((1L, 1L, "core", Some(0L))))
  }
}
