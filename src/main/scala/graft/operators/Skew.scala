package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (the
  * 100 TB failure mode: one hot key → one straggler task holding the
  * whole stage).
  *
  * [[saltedJoin]] is the classic manual fix: widen the hot side's key
  * space by a deterministic salt in [0, R), replicate the small side R×
  * (an explode, not a broadcast — both sides still shuffle), and join on
  * (key, salt). Each hot key now lands on R partitions instead of one.
  * Prefer AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) when
  * it applies — salting is for the cases it can't see (e.g. skew created
  * mid-query) or engines pinned to static plans.
  */
object Skew {

  /** Join `big` (skewed) with `small` on `keys`, spreading each big-side
    * key over `r` salt buckets. `saltSource` must be a big-side column
    * (any roughly-uniform one, e.g. a row id) — the salt is derived by
    * hash, so the join stays deterministic.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      r: Int = 16,
      joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(saltSource), lit(r)))
    val replicated = small.withColumn("_salt", explode(lit((0 until r).toArray)))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
