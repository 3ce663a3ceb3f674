package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Matrix-profile motif discovery, exact fixed-scale form (the
  * concept of Yeh et al. ICDM 2016: for every length-w window of a
  * series, the distance to its nearest OTHER window — dips mark
  * motifs/repeated regimes, peaks mark discords/anomalies) — the
  * repeated-pattern lens the time-series family lacked: changepoint
  * finds one break, CUSUM drift, seasonality fixed periods; the
  * profile finds structure you did not name in advance.
  *
  * Exactness: the MASS/FFT acceleration and z-normalization are float
  * paths; this is the EXACT squared-Euclidean profile on integer cent
  * series — deterministic, engine-replayable, and the right default
  * when amplitude matters (a doubled-revenue week should NOT match a
  * normal week, which z-normalization would equate). Trivial matches
  * are excluded by the standard zone |i − j| >= w; nearest ties break
  * to the smaller j. Windows must be complete (all w points), so a
  * series shorter than 2w emits nothing.
  *
  * Scale shape: offsets explode each point into its w member windows
  * (pre-combine), pairing is an equi-join on (key, offset) — per-key
  * cost is w·n_windows², bounded by the calendar per key, and keys
  * (series) parallelize freely; nothing is corpus². The HAVING-style
  * count(*) = w filter keeps exactly the complete×complete pairs.
  */
object MatrixProfile {

  /** series(keyCol, idxCol contiguous Long per key, valCol Long) ->
    * (key, pos, nn_pos, nn_dist2) for every complete window with at
    * least one non-excluded partner. */
  def profile(series: DataFrame, keyCol: String, idxCol: String,
      valCol: String, w: Int): DataFrame = {
    require(w >= 2, s"window ($w) must be >= 2")
    val off = series
      .select(col(keyCol).as("key"), col(idxCol).as("idx"),
        col(valCol).as("x"))
      .select(col("key"), explode(expr(s"sequence(0, ${w - 1})")).as("k"),
        col("idx"), col("x"))
      .select(col("key"), (col("idx") - col("k")).as("i"), col("k"),
        col("x"))
      .localCheckpoint(true) // both sides of the pair join
    off
      .join(off.select(col("key"), col("i").as("j"), col("k"),
        col("x").as("y")), Seq("key", "k"))
      .filter(abs(col("i") - col("j")) >= w)
      .groupBy("key", "i", "j")
      .agg(sum((col("x") - col("y")) * (col("x") - col("y"))).as("d2"),
        count(lit(1)).as("_n"))
      .filter(col("_n") === w) // both windows complete
      .groupBy("key", "i")
      .agg(min(struct(col("d2"), col("j"))).as("b"))
      .select(col("key"), col("i").as("pos"), col("b.j").as("nn_pos"),
        col("b.d2").as("nn_dist2"))
  }
}
