package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mondrian multidimensional k-anonymization (LeFevre, DeWitt,
  * Ramakrishnan, "Mondrian Multidimensional K-Anonymity", ICDE 2006) —
  * the GENERALIZATION step that the X212 audit (`p_kanonymity`)
  * assumes someone will run on the violating table: recursively
  * bisect the record set in quasi-identifier space until no cut can
  * keep both sides at >= k records, then publish each leaf region as
  * a generalized range.
  *
  * Departures from the paper, both for scale and cross-engine
  * determinism:
  *
  *  - **Cut dimension alternates by depth** (kd-tree style) instead of
  *    the paper's widest-normalized-range choice. The round-robin rule
  *    needs NO per-region statistics to pick the dimension, and on two
  *    quasi-attributes the partition quality is equivalent in practice;
  *    determinism is structural rather than dependent on float range
  *    comparisons.
  *  - **Cuts land on fixed-width bucket boundaries** (the weighted
  *    median over per-region bucket counts — smallest bucket b with
  *    2·cum(b) >= n). The paper's exact median needs a per-region
  *    rank/sort of the records each round; the bucketed median costs
  *    one map-side-combine `groupBy(region, bucket)` per round and a
  *    window over the REGION×BUCKET metadata table only, never a
  *    corpus sort. All arithmetic is integer (counts and bucket ids),
  *    so a SQL oracle replays the rounds bit-for-bit.
  *
  * Scale shape per round: one combine-aggregation over the corpus
  * (exchange carries region×bucket rows), a metadata-sized window for
  * the cut decisions, one broadcast join of the <= 2^round-row decision
  * table back onto the corpus, and one materialization of the slim
  * (a1, a2, region) projection. Unlike kMeans — whose corpus is static
  * and only the model table checkpoints — the region column IS the
  * iterated state, so the per-round corpus checkpoint is the honest
  * cost (the X182 suffix-array rank-table discipline): `depth` linear
  * passes total, which is what a log-depth recursive partitioning
  * costs.
  *
  * Region ids double every round (`2r` left / uncut, `2r+1` right), so
  * sibling leaves never collide with stopped branches; ids are
  * path-determined and reproducible.
  */
object Mondrian {

  /** Partition `rows` on integer quasi-attributes `a1Col`/`a2Col`.
    * Returns one row per input record: (a1, a2, region) with every
    * final region holding >= k records (the initial table must itself
    * have >= k rows).
    *
    * @param w1 bucket width for a1 (cut granularity on even rounds)
    * @param w2 bucket width for a2 (cut granularity on odd rounds)
    */
  def partition(rows: DataFrame, a1Col: String, a2Col: String,
      k: Int, depth: Int, w1: Long, w2: Long,
      materialize: DataFrame => DataFrame = _.localCheckpoint(eager = true))
      : DataFrame = {
    require(k >= 2, s"k ($k) must be >= 2")
    require(depth >= 1 && depth <= 30, s"depth ($depth) out of range")
    require(w1 >= 1 && w2 >= 1, "bucket widths must be positive")

    var cur = materialize(rows.select(
      col(a1Col).cast("long").as("a1"), col(a2Col).cast("long").as("a2"),
      lit(0L).as("region")))
    (0 until depth).foreach { r =>
      val width = if (r % 2 == 0) w1 else w2
      val attr = if (r % 2 == 0) "a1" else "a2"
      val withB = cur.withColumn("_b", expr(s"$attr DIV $width"))
      val byBucket = Window.partitionBy("region").orderBy("_b")
      // weighted median over bucket counts: first bucket where the
      // running count reaches half the region (integer compare — no
      // division), plus the stop rule on both sides' sizes
      val dec = withB.groupBy("region", "_b").agg(count(lit(1)).as("_n"))
        .withColumn("_cum", sum("_n").over(byBucket))
        .withColumn("_tot", sum("_n").over(Window.partitionBy("region")))
        .filter(col("_cum") * 2 >= col("_tot"))
        .withColumn("_rn", row_number().over(byBucket))
        .filter(col("_rn") === 1)
        .select(col("region"), col("_b").as("_bcut"),
          (col("_cum") >= k && col("_tot") - col("_cum") >= k).as("_docut"))
      val next = materialize(withB.join(broadcast(dec), "region")
        .withColumn("region",
          when(col("_docut") && col("_b") > col("_bcut"),
            col("region") * 2 + 1)
            .otherwise(col("region") * 2))
        .select("a1", "a2", "region"))
      // `next` is eagerly materialized, so nothing can recompute from
      // the previous round's blocks — release them (ADVICE r9: bounded
      // rounds still accumulate executor memory across invocations in
      // one JVM if never freed)
      SuffixArray.freeCheckpoint(cur)
      cur = next
    }
    cur
  }

  /** The published anonymized summary: one row per leaf region with
    * the generalized (tight) ranges and its size. Region ids are
    * structural (cut-path) artifacts, so they are dropped — the
    * output is the range table a release would actually ship.
    */
  def generalize(partitioned: DataFrame): DataFrame =
    partitioned.groupBy("region")
      .agg(min("a1").as("a1_lo"), max("a1").as("a1_hi"),
        min("a2").as("a2_lo"), max("a2").as("a2_hi"),
        count(lit(1)).as("n_rows"))
      .drop("region")
}
