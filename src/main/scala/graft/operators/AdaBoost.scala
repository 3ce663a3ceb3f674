package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AdaBoost over decision stumps with HISTOGRAM split search (Freund &
  * Schapire '97; the histogram method is the distributed-GBDT split
  * trick of LightGBM/XGBoost-hist) — the trained weak-labeler ensemble
  * next to X198's logistic GD: where the linear classifier fits one
  * hyperplane by gradient steps, boosting COMPOSES axis-aligned
  * threshold rules, reweighting the corpus toward what the ensemble
  * still gets wrong — the shape a curation team actually ships when a
  * single stopword-style gate stops being enough.
  *
  * Why stumps scale: a round's ENTIRE split search is one combine
  * aggregation — explode each row to its (feature, bucket) pairs, sum
  * weights by class per cell — and every candidate threshold of every
  * feature is then scored from prefix sums over that
  * |features|×|buckets| table (metadata-sized; the corpus is never
  * re-read per candidate). err(θ, ≤→pos) = cumW₋(θ) + (W₊ −
  * cumW₊(θ)); the opposite direction is its complement. The argmin is
  * a single `min(struct(err, fi, θ, dir))` combine — total order, so
  * ties are deterministic and the DuckDB replay lands on the same
  * stump.
  *
  * Exact arithmetic: weights stay EXACT INTEGERS (decimal(38,0)) by
  * the cross-multiplication trick — misclassified rows scale by the
  * correct side's total W_c, correct rows by the error side's W_e
  * (both sides then hold equal mass W_e·W_c, the textbook ½/ε
  * normalization without a division; magnitudes are bounded by
  * Π W_t ≤ n^(2·rounds), inside decimal(38,0)/HUGEINT for the 3-round
  * configuration at any test sf). The vote weight ships as
  * alpha2_micro = lmu(W_c) − lmu(W_e) — TWICE the classic
  * ½ln((1−ε)/ε) in micro-nats, sign-equivalent for voting and free of
  * the ½ division — with each ln taken on an integer-valued double
  * and micro-floored (the X276 ln-pair discipline). A perfect stump
  * (W_e = 0) clamps both logs' arguments to ≥1; training would stop
  * there in production, the clamp keeps the fixed-round replay total.
  *
  * Per round: one corpus-pass histogram agg, metadata-sized prefix
  * windows (partitioned by feature), one broadcast join of the 1-row
  * winner back onto the corpus for the weight/score update, and one
  * ensemble-error agg — the round count is FIXED and tiny, so plain
  * `localCheckpoint` barriers suffice (no stats compounding risk; see
  * [[Iterate]]).
  *
  * Output, one row per round: (round, feature, threshold, dir, eps,
  * alpha2_micro, ens_err) — eps the weighted error fraction
  * (round6-rendered single exact division), ens_err the count of
  * corpus rows the alpha2-weighted ensemble-so-far misclassifies
  * (score 0 predicts negative, deterministically).
  */
object AdaBoost {

  private val dec0 = lit(0).cast("decimal(38,0)")
  private def lmu(x: Column): Column =
    floor(log(x.cast("double")) * 1000000.0).cast("long")

  /** `base` columns: the long bucket columns `featCols` (non-negative)
    * and a boolean label. Returns one row per boosting round.
    */
  def trainStumps(base: DataFrame, featCols: Seq[String], label: Column,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 6,
      s"rounds ($rounds) must be in [1, 6] — exact-integer weights are " +
        "bounded by n^(2*rounds), which must stay inside decimal(38,0)")
    val farr = array(featCols.map(col): _*)
    var state = base
      .select(label.as("_y"), farr.as("_f"),
        lit(1).cast("decimal(38,0)").as("_w"), lit(0L).as("_s"))
      .localCheckpoint(true)

    val parts = ArrayBuffer.empty[DataFrame]
    for (t <- 1 to rounds) {
      val hist = state
        .select(col("_y"), col("_w"),
          posexplode(col("_f")).as(Seq("fi", "b")))
        .groupBy("fi", "b")
        .agg(sum(when(col("_y"), col("_w")).otherwise(dec0)).as("wp"),
          sum(when(!col("_y"), col("_w")).otherwise(dec0)).as("wn"))
      // every fi partition sums the whole corpus once: fi=0 is the total
      val tot = hist.filter(col("fi") === 0)
        .agg(sum("wp").as("tp"), sum("wn").as("tn"))
      val w = Window.partitionBy("fi").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .select(col("fi"), col("b"),
          sum("wp").over(w).as("cp"), sum("wn").over(w).as("cn"))
        .crossJoin(broadcast(tot))
      val cand = cum.select(col("fi"), col("b"), lit(0).as("dir"),
          (col("cn") + col("tp") - col("cp")).as("err"))
        .unionByName(cum.select(col("fi"), col("b"), lit(1).as("dir"),
          (col("cp") + col("tn") - col("cn")).as("err")))
      val winner = cand
        .agg(min(struct(col("err"), col("fi"), col("b"), col("dir")))
          .as("m"))
        .crossJoin(broadcast(tot))
        .select(col("m.err").as("we"), col("m.fi").as("fi"),
          col("m.b").as("th"), col("m.dir").as("dir"),
          greatest(col("m.err"), lit(1).cast("decimal(38,0)")).as("weG"),
          greatest(col("tp") + col("tn") - col("m.err"),
            lit(1).cast("decimal(38,0)")).as("wcG"),
          (col("tp") + col("tn")).as("wt"))
        .localCheckpoint(true) // 1 row, two consumers (update + report)

      val fv = element_at(col("_f"), col("fi") + 1)
      val h = when(col("dir") === 0, fv <= col("th"))
        .otherwise(fv > col("th"))
      val alpha2 = (lmu(col("wcG")) - lmu(col("weG"))).as("a2")
      val stepped = state.crossJoin(broadcast(winner))
        .select(col("_y"), col("_f"),
          (col("_w") * when(h =!= col("_y"), col("wcG"))
            .otherwise(col("weG"))).cast("decimal(38,0)").as("_w"),
          (col("_s") + when(h, alpha2).otherwise(-alpha2)).as("_s"))
        .localCheckpoint(true)
      val ensErr = stepped
        .agg(sum(when((col("_s") > 0) =!= col("_y"), 1L).otherwise(0L))
          .as("ens_err"))
      parts += winner.crossJoin(broadcast(ensErr)).select(
        lit(t).as("round"),
        element_at(array(featCols.map(lit): _*), col("fi") + 1)
          .as("feature"),
        col("th").as("threshold"),
        when(col("dir") === 0, "le_pos").otherwise("gt_pos").as("dir"),
        graft.llm.TextOps.round6(
          col("we").cast("double") / col("wt").cast("double")).as("eps"),
        alpha2.as("alpha2_micro"),
        col("ens_err"))
      state = stepped
    }
    parts.reduce(_ unionByName _).orderBy("round")
  }
}
