package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization barrier for iterative DataFrame loops — the X51
  * `localCheckpoint` rule PLUS a statistics reset.
  *
  * `Dataset.localCheckpoint` truncates the RDD lineage but COPIES the
  * origin plan's `Statistics` onto the resulting `LogicalRDD`
  * (`originStats` — see Spark's `LogicalRDD.fromDataset`). Catalyst's
  * size-only estimator multiplies `sizeInBytes` across a join, so in a
  * loop that checkpoints a self-join each round the carried estimate
  * SQUARES per iteration: the BigInt's bit count doubles every join
  * (measured: 20 → 2 431 bits in 8 iterations), planning time sinks
  * into million-bit BigInt arithmetic after ~20, and past ~27
  * cumulative joins `java.math.BigInteger` overflows its 2³¹-bit
  * magnitude cap and the query dies with "BigInteger would overflow
  * supported range" — at ANY data size (first seen: Borůvka rounds ×
  * pointer-jump iterations at a 2 000-row input).
  *
  * `cut` therefore rebuilds the checkpointed result as a fresh leaf via
  * `createDataFrame(rdd, schema)`, whose stats fall back to the
  * session default — constant-size, loop-safe. Costs: one extra
  * InternalRow⇄Row conversion per downstream consumption of the
  * barrier (linear, no recompute — the checkpointed RDD stays
  * materialized), and the loss of the checkpoint's preserved
  * `outputPartitioning`/size estimate (AQE re-derives join strategy
  * from RUNTIME shuffle sizes, so broadcast decisions survive).
  * Bounded-round operators (PageRank's 3 rounds, the LCP descent) can
  * keep plain `localCheckpoint` and its partitioning reuse; every
  * while-until-converged loop whose round count is data-dependent
  * should pass through `cut`.
  */
object Iterate {

  def cut(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(eager = true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
