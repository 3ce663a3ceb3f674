package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep per-key aggregate STATE as a
  * commutative monoid (count / sum / min / max), so tonight's delta
  * updates yesterday's rollup by merging state tables instead of
  * re-scanning the corpus. The derived metrics (averages, ratios) are
  * computed from the merged state at read time — they are NOT part of
  * the state because averages don't merge.
  *
  * Scale design: this is the difference between an O(|delta|) nightly
  * job and an O(|corpus|) one — at 100 TB the full recompute is a
  * multi-hour scan, while the state table is |keys| rows (sources,
  * shards, dates — metadata-scale) and the delta pass touches only new
  * files. `mergeStates` is a union + one partial-combine aggregation on
  * the key: every component is associative+commutative, so partition
  * count, merge order, and arrival batching cannot change the result —
  * state(base) ⊎ state(delta) ≡ state(base ∪ delta) by construction,
  * and the DuckDB oracle (which recomputes from the full corpus) proves
  * exactly that identity cross-engine.
  *
  * The same shape backs Structured Streaming's stateful aggregation
  * (partial aggregates merged into the state store per trigger); this
  * operator is the batch/snapshot spelling a warehouse rollup uses.
  */
object IncrementalAgg {

  /** Per-key monoid state over a corpus slice: (key, n_rows, sum_sz,
    * min_id, max_id). All four components merge associatively.
    */
  def state(df: DataFrame, keyCol: String, idCol: String,
      sizeCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(sizeCol).cast("long")).as("sum_sz"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Merge any number of state tables into one: union + one combine agg
    * on the key. Keys present in only some inputs pass through (a new
    * source appearing in tonight's delta needs no special case).
    */
  def mergeStates(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state table")
    states.reduce(_ unionByName _)
      .groupBy("key")
      .agg(sum("n_rows").cast("long").as("n_rows"),
        sum("sum_sz").cast("long").as("sum_sz"),
        min("min_id").as("min_id"),
        max("max_id").as("max_id"))
  }

  /** Read-time derived metrics over a state table: the non-mergeable
    * measures (mean size) computed FROM the monoid components.
    */
  def withDerived(state: DataFrame): DataFrame =
    state.withColumn("avg_sz",
      floor(col("sum_sz") / col("n_rows").cast("double") * 1000000.0 + 0.5)
        / 1000000.0)
}
