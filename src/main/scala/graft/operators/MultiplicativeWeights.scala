package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiplicative-weights / Hedge schedule over a static group-loss
  * vector (Arora, Hazan & Kale's MW survey, ToC 2012; the update
  * inside DoReMi's group-DRO mixture reweighting, Xie et al. 2023) —
  * the data-mixture question X70's temperature scaling cannot answer:
  * not "what share does each domain get" but "how should the shares
  * MOVE as the optimizer keeps paying excess loss on hard domains".
  * Each round multiplies a group's weight by (1 + η·loss) and
  * renormalizes, so shares concentrate exponentially on high-loss
  * groups while never zeroing the easy ones — the worst-case-aware
  * schedule a curriculum/mixture planner consumes.
  *
  * Exactness: the textbook update is w·exp(η·loss), but exp is not
  * correctly rounded and diverges across engines in the last ulp; the
  * (1 + η·loss) form is the standard MW variant with the same regret
  * bound up to constants and is EXACT on the micro grid — one floored
  * division per round for the update, one for the emitted share, both
  * nonnegative, so DuckDB's `//` replays Spark's `div` bit-for-bit.
  *
  * Scale shape: callers reduce the corpus to the |groups|-row loss
  * table (one combine agg); everything here touches only that table —
  * per round one projection plus a 1-row total broadcast onto the
  * groups. Rounds are unrolled, no driver-side collection.
  */
object MultiplicativeWeights {

  private val M = 1000000L

  /** losses(group, loss_micro >= 0, a FRACTIONAL excess loss on the
    * micro grid — clamped to [0, 1e6] so five compounding rounds stay
    * far inside Long) -> (round 0..rounds, group, share_micro): the
    * normalized mixture share after each update. */
  def schedule(losses0: DataFrame, rounds: Int, etaPermille: Long)
    : DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    require(etaPermille > 0, s"etaPermille ($etaPermille) must be > 0")
    // The loss table seeds every round; price its corpus agg once.
    val mult = losses0
      .select(col("group"),
        (lit(M) + expr(s"($etaPermille * least(loss_micro, $M)) div 1000"))
          .as("mult"))
      .localCheckpoint(true)
    def share(r: Int, cur: DataFrame): DataFrame = {
      val tot = cur.agg(sum("w").as("tw"))
      cur.crossJoin(broadcast(tot))
        .select(lit(r.toLong).as("round"), col("group"),
          expr(s"(w * $M) div tw").as("share_micro"))
    }
    var w = mult.select(col("group"), col("mult"), lit(M).as("w"))
    val snaps = ArrayBuffer(share(0, w))
    for (r <- 1 to rounds) {
      w = w.select(col("group"), col("mult"),
        expr(s"(w * mult) div $M").as("w"))
      snaps += share(r, w)
    }
    snaps.reduce(_ unionByName _)
  }
}
