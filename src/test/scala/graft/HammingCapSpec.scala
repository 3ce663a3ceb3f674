package graft

import graft.llm.TextOps
import org.apache.spark.sql.functions._

/** r13 hotBucketCap on the pigeonhole Hamming join (the hotBandCap
  * contract, third application after LSH bands and grid cells): an
  * oversize (chunk, value) bucket thins to star candidates around its
  * representative, detection membership survives, cold buckets and
  * the unbounded default stay classical.
  */
class HammingCapSpec extends SparkSpec {

  import spark.implicits._

  // 64-bit hashes, 8 chunks of 8 bits, maxHamming 6 — the
  // llm_multimodal_near_dup configuration
  private def pairs(rows: Seq[(Long, Long)], cap: Int) =
    TextOps.hammingNearDupPairs(
      rows.toDF("doc_id", "h"), "doc_id", "h",
      maxHamming = 6, chunks = 8, bits = 64, hotBucketCap = cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  // one hot cluster: 20 identical hashes; one cold near-dup pair
  // (1-bit apart); one unrelated hash sharing no byte with anything
  private val hot = (1L to 20L).map(i => (i, 0x1234567890abcdefL))
  private val cold = Seq((31L, 0x0f0f0f0f0f0f0f0fL),
    (32L, 0x0f0f0f0f0f0f0f0eL))
  private val lone = Seq((40L, 0x5050505050505050L))
  private val corpus = hot ++ cold ++ lone

  test("hot bucket thins to the star; every member stays detected") {
    val capped = pairs(corpus, cap = 8)
    assert(capped.filter(_._1 <= 20L) ===
      (2L to 20L).map(b => (1L, b)).toSet)
    assert(capped.flatMap(p => Seq(p._1, p._2)).count(_ <= 20L) === 20)
  }

  test("cold buckets are untouched by the cap") {
    val capped = pairs(corpus, cap = 8)
    assert(capped.contains((31L, 32L)))
    assert(!capped.exists(p => p._1 == 40L || p._2 == 40L))
  }

  test("unbounded cap = classical semantics, full clique") {
    val full = pairs(corpus, cap = Int.MaxValue)
    assert(full.count(_._1 <= 20L) === 190) // C(20,2)
    assert(full.contains((31L, 32L)))
    assert(pairs(corpus, cap = 1000) === full) // cap above bucket: no-op
  }

  test("a hot member within maxHamming of the rep survives the verify") {
    // one near-copy of the hot hash (1 bit flipped) lands in 7 of the
    // 8 hot chunks; under the cap it pairs with the representative and
    // passes the Hamming verify
    val withNear = corpus ++ Seq((25L, 0x1234567890abcdeeL))
    val capped = pairs(withNear, cap = 8)
    assert(capped.contains((1L, 25L)))
  }
}
