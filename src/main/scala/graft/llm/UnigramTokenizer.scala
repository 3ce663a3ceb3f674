package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (X295; Kudo ACL'18 — the
  * SentencePiece unigram model, the OTHER trained tokenizer family
  * next to [[TextOps.bpeTrain]]'s merge loop): seed a substring
  * vocabulary, then alternate Viterbi segmentation of the corpus under
  * current piece costs with piece re-estimation from the segmentation
  * counts — hard (Viterbi) EM, the deterministic variant, which makes
  * the whole fit exactly replayable (soft-EM expected counts are sums
  * of float products with no stable quantization; the hard-EM argmax
  * is integer comparisons all the way down).
  *
  * Determinism:
  *  - piece costs are −ln p in integer micro-nats, each cost an ln
  *    PAIR on integer-valued doubles (⌊ln(den)·10⁶+0.5⌋ −
  *    ⌊ln(num)·10⁶+0.5⌋ — the X276 discipline), so Viterbi totals are
  *    exact integer sums;
  *  - the per-position argmin tie-breaks by (total cost, piece) — a
  *    total order (for a fixed end position, equal piece strings
  *    imply the same span);
  *  - seeding: all substrings up to `maxPieceLen` with weighted
  *    occurrence frequency ≥ `minFreq`, UNION all single characters
  *    (the coverage floor that keeps every position reachable);
  *    re-estimation keeps pieces with ≥ 1 Viterbi use OR length 1
  *    (SentencePiece's prune, with the same coverage floor) and
  *    applies add-one smoothing.
  *
  * Scale: everything is keyed by the DISTINCT-WORD table (vocabulary-
  * bounded — the corpus is touched once for word counts); spans are
  * vocab × wordLen × maxPieceLen rows; each Viterbi position step and
  * each backward cursor step is one equi-join + one per-word argmin
  * window on that vocab-bounded table, checkpointed (tiny frames, and
  * the accumulated dp is referenced by every later step). Words
  * longer than `maxWordLen` are excluded from training (the sentence-
  * length cap every tokenizer trainer applies; the corpus max here is
  * 8, so nothing is actually dropped — documented, not silent).
  *
  * Output: (rank, piece, n_uses, cost_micro, total_tokens) — the
  * top-`topK` pieces of the final vocabulary by segmentation use,
  * with the corpus token count under the final segmentation (the
  * compression readout; lower = better tokenizer).
  */
object UnigramTokenizer {

  private def lnMicro(x: Column): Column =
    floor(log(x.cast("double")) * 1000000.0 + 0.5).cast("long")

  def train(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
      maxWordLen: Int = 8, minFreq: Long = 20L, rounds: Int = 2,
      topK: Int = 30,
      materialize: DataFrame => DataFrame = _.localCheckpoint(eager = true))
      : DataFrame = {
    require(rounds >= 1 && maxPieceLen >= 1 && maxWordLen >= 1 && topK >= 1,
      "bad unigram trainer parameters")
    val wc = materialize(df
      .select(explode(TextOps.words(col(textCol))).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("c")))
    // all (start, len) spans of every distinct word
    val spans = materialize(wc
      .select(col("w"), col("c"), explode(sequence(lit(1), length(col("w"))))
        .as("i"))
      .select(col("w"), col("c"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("w")) - col("i") + 1)))
          .as("l"))
      .select(col("w"), col("c"), col("i"), (col("i") + col("l") - 1).as("j"),
        expr("substring(w, i, l)").as("piece"), col("l")))
    // seed: frequent substrings + the single-char coverage floor
    val freq = spans.groupBy("piece").agg(sum("c").as("f"))
    val seed = freq
      .filter(col("f") >= minFreq || length(col("piece")) === 1)
    var pieces = materialize {
      val tot = seed.agg(sum("f").as("_tf"))
      seed.crossJoin(broadcast(tot))
        .select(col("piece"),
          (lnMicro(col("_tf")) - lnMicro(col("f"))).as("cost"))
    }
    var uses: DataFrame = null
    (1 to rounds).foreach { _ =>
      val scored = materialize(spans
        .join(pieces, "piece")
        .select(col("w"), col("c"), col("i"), col("j"), col("piece"),
          col("l"), col("cost")))
      // Viterbi forward: dp(w, pos) with argmin piece, pos = 0..maxWordLen;
      // dp accumulates as a RUNNING union of checkpointed levels (a
      // per-position re-union of all levels would grow the plan
      // quadratically in maxWordLen for no reason)
      var dp = materialize(
        wc.select(col("w"), lit(0).as("pos"), lit(0L).as("dp"),
          lit("").as("piece"), lit(0).as("l")))
      (1 to maxWordLen).foreach { pos =>
        val step = scored.filter(col("j") === pos)
          .join(dp.select(col("w"), (col("pos") + 1).as("i"),
            col("dp").as("_prev")), Seq("w", "i"))
          .withColumn("_tot", col("_prev") + col("cost"))
          .withColumn("_rn", row_number().over(Window.partitionBy("w")
            .orderBy(col("_tot"), col("piece"))))
          .filter(col("_rn") === 1)
          .select(col("w"), lit(pos).as("pos"), col("_tot").as("dp"),
            col("piece"), col("l"))
        dp = dp.unionByName(materialize(step))
      }
      // backward: walk argmin pieces from len(w) to 0
      var cursor = materialize(wc.select(col("w"), col("c"),
        length(col("w")).as("pos")))
      val emitted = Seq.newBuilder[DataFrame]
      (1 to maxWordLen).foreach { _ =>
        val stepRows = materialize(cursor.filter(col("pos") > 0)
          .join(dp.select(col("w"), col("pos"), col("piece"), col("l")),
            Seq("w", "pos")))
        emitted += stepRows.select(col("w"), col("c"), col("piece"))
        cursor = materialize(stepRows
          .select(col("w"), col("c"), (col("pos") - col("l")).as("pos")))
      }
      uses = materialize(emitted.result().reduce(_ unionByName _)
        .groupBy("piece").agg(sum("c").as("n_uses")))
      // prune + add-one re-estimate
      val kept = pieces.select("piece")
        .join(uses, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("n_uses"), lit(0L)).as("n_uses"))
        .filter(col("n_uses") >= 1 || length(col("piece")) === 1)
      val tot = kept.agg(sum("n_uses").as("_tu"), count(lit(1)).as("_np"))
      pieces = materialize(kept.crossJoin(broadcast(tot))
        .select(col("piece"),
          (lnMicro(col("_tu") + col("_np"))
            - lnMicro(col("n_uses") + 1)).as("cost")))
    }
    val totalTokens = uses.agg(sum("n_uses").as("total_tokens"))
    uses.join(pieces, "piece")
      .crossJoin(broadcast(totalTokens))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_uses").desc, col("piece"))))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("piece"), col("n_uses"),
        col("cost").as("cost_micro"), col("total_tokens"))
      .orderBy("rank")
  }
}
