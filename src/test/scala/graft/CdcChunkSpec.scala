package graft

import graft.llm.TextOps
import org.apache.spark.sql.functions._

/** Content-defined chunking: shift-robustness (the property fixed
  * shingling lacks) and report arithmetic.
  */
class CdcChunkSpec extends SparkSpec {

  private val shared =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
    "nu xi omicron pi rho sigma tau upsilon"

  test("shared block at different offsets deduplicates interior chunks") {
    val s = spark
    import s.implicits._
    // same 20-word block, shifted by different prefixes/suffixes
    val docs = Seq(
      (1L, "s", s"one two $shared"),
      (2L, "s", s"$shared trailing words here"),
      (3L, "s", s"a b c d e f g $shared x y z")).toDF("doc_id", "src", "text")
    val out = TextOps.cdcChunkStats(docs, "doc_id", "text", "src", avgChunk = 4)
      .filter(col("source") === "__ALL__").collect().head
    val (nChunks, nDistinct) = (out.getLong(1), out.getLong(2))
    // the shared block must produce at least one interior chunk that
    // dedups across all three placements
    assert(nDistinct < nChunks,
      s"expected cross-doc chunk sharing, got $nDistinct distinct of $nChunks")
    assert(out.getLong(4) < out.getLong(3)) // distinct_words < total_words
  }

  test("no sharing → zero savings; word totals are conserved") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a", "completely unrelated words without any repetition"),
      (2L, "b", "different content again nothing shared whatsoever")
    ).toDF("doc_id", "src", "text")
    val rows = TextOps.cdcChunkStats(docs, "doc_id", "text", "src", avgChunk = 4)
      .collect()
    val all = rows.filter(_.getString(0) == "__ALL__").head
    assert(all.getLong(1) === all.getLong(2)) // n_chunks == n_distinct
    assert(all.getDouble(5) === 0.0)          // savings_ratio
    assert(all.getLong(3) === 6L + 6L)        // every word lands in a chunk
    // per-source totals sum to the global row
    val perSrc = rows.filter(_.getString(0) != "__ALL__")
    assert(perSrc.map(_.getLong(3)).sum === all.getLong(3))
    assert(perSrc.map(_.getLong(1)).sum === all.getLong(1))
  }
}
