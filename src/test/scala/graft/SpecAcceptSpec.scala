package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** X329 speculative-acceptance proxy: hand-computed bigram-draft
  * acceptance per source, the lexicographic argmax tie-break, and
  * doc-initial tokens excluded — via the same expressions the query
  * registers.
  */
class SpecAcceptSpec extends SparkSpec {

  import spark.implicits._

  private def accept(docs: Seq[(Long, String, String)]) = {
    val toks = docs.toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        posexplode(TextOps.words(col("text"))).as(Seq("pos", "w")))
    val bigrams = toks
      .withColumn("prev",
        lag("w", 1).over(Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("prev").isNotNull)
    val draft = bigrams.groupBy("prev", "w").agg(count(lit(1)).as("c"))
      .groupBy("prev")
      .agg(min(struct((-col("c")).as("nc"), col("w").as("g"))).as("b"))
      .select(col("prev"), col("b.g").as("guess"))
    bigrams.join(draft, "prev")
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("w") === col("guess"), 1L).otherwise(0L)).as("a"))
      .withColumn("m", expr("(a * 1000000) div n"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
  }

  test("hand-computed acceptance per source; draft trained corpus-wide") {
    val out = accept(Seq(
      (1L, "s1", "a b a b a c"), // draft a->b (3 vs 1), b->a (2 vs 1)
      (2L, "s2", "a b x")))
    assert(out("s1") === (("s1", 5L, 4L, 800000L)))
    assert(out("s2") === (("s2", 2L, 1L, 500000L)))
  }

  test("argmax tie breaks to the lexicographically smaller successor") {
    // z->q and z->r both count 1: guess q; sequence z q z r accepts
    // (z,q) and (q,z), rejects (z,r)
    val out = accept(Seq((1L, "s", "z q z r")))
    assert(out("s") === (("s", 3L, 2L, 666666L)))
  }
}
