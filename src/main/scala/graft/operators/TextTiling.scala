package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** TextTiling topic segmentation (Hearst, CL '97 — simplified to the
  * deterministic core): chunk each document into fixed word blocks,
  * score every adjacent-block gap by lexical cohesion, and flag the
  * gaps where cohesion dips — the intra-document structure signal a
  * chunking pipeline (X31's fixed windows) ignores: RAG chunkers that
  * cut at topic boundaries instead of byte counts retrieve better.
  *
  * Deterministic spelling: cohesion = distinct-word Jaccard of the
  * two blocks in exact integer micro (⌊inter·10⁶ / union⌋ — Hearst's
  * cosine needs a sqrt; Jaccard ranks dips the same way and stays
  * engine-exact), depth = the sum of rises toward both immediate
  * neighbors (missing neighbor contributes 0 via coalesce-to-self,
  * never a NULL-semantics branch), boundary = strict local minimum
  * with depth ≥ the threshold.
  *
  * Scale: one tokenize pass to (doc, block, word) distincts; the gap
  * inter/union counts are an equi-join of the block-word table with
  * itself shifted one block (doc+block+word keys, no doc-level
  * fan-out); the neighbor windows partition per document over its
  * ≤ |blocks| gap rows. Output: every gap of every multi-block doc —
  * (doc, gap, jac_micro, depth_micro, boundary), the full profile so
  * thresholds can be re-audited downstream.
  */
object TextTiling {

  def gapProfile(df: DataFrame, idCol: String, textCol: String,
      blockWords: Int = 10, depthThresholdMicro: Long = 100000L)
      : DataFrame = {
    require(blockWords >= 1, s"blockWords ($blockWords) must be >= 1")
    val bw = df
      .select(col(idCol).as("_id"),
        posexplode(TextOps.words(col(textCol))).as(Seq("pos", "w")))
      .select(col("_id"), expr(s"pos div $blockWords").as("b"), col("w"))
      .distinct()
      .localCheckpoint(eager = true) // counts + the shifted self-join
    val nb = bw.groupBy("_id", "b").agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = true) // both sides of the gap join
    val inter = bw
      .join(bw.select(col("_id"), (col("b") - 1).as("b"), col("w")),
        Seq("_id", "b", "w"))
      .groupBy("_id", "b").agg(count(lit(1)).as("_i"))
    val gaps = nb.select(col("_id"), col("b").as("gap"), col("n").as("na"))
      .join(nb.select(col("_id"), (col("b") - 1).as("gap"),
        col("n").as("nbn")), Seq("_id", "gap"))
      .join(inter.select(col("_id"), col("b").as("gap"), col("_i")),
        Seq("_id", "gap"), "left")
      .select(col("_id"), col("gap"), coalesce(col("_i"), lit(0L))
        .as("inter"), col("na"), col("nbn"))
      .select(col("_id"), col("gap"),
        expr("(inter * 1000000) div (na + nbn - inter)").as("jac"))
    val w = Window.partitionBy("_id").orderBy("gap")
    gaps
      .select(col("_id"), col("gap"), col("jac"),
        lag("jac", 1).over(w).as("jl"), lead("jac", 1).over(w).as("jr"))
      .select(col("_id").as(idCol), col("gap"),
        col("jac").as("jac_micro"),
        (greatest(coalesce(col("jl"), col("jac")) - col("jac"), lit(0L))
          + greatest(coalesce(col("jr"), col("jac")) - col("jac"),
            lit(0L))).as("depth_micro"),
        ((col("jl").isNull || col("jac") < col("jl")) &&
          (col("jr").isNull || col("jac") < col("jr"))).as("_lm"))
      .select(col(idCol), col("gap"), col("jac_micro"), col("depth_micro"),
        (col("_lm") && col("depth_micro") >= depthThresholdMicro)
          .as("boundary"))
  }
}
