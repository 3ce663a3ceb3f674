package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Wall-clock demonstration of
  * [[graft.operators.ConnectedComponents.incrementalLabels]]'s
  * contract-and-solve economics — the timing artifact behind
  * IncrementalCcSpec's equality proofs (timing assertions don't belong
  * in unit tests; this main prints one JSON line, recorded in
  * BASELINE.md).
  *
  * Setup: a 2M-node near-dup-shaped base graph (200k size-10
  * star+ring clusters — short diameter, the structure dup detection
  * produces) with a 1 000-edge nightly batch attaching new nodes to
  * existing clusters. Compared: FULL label propagation over base+batch
  * (what a naive nightly job re-runs) vs folding only the batch into
  * the precomputed label table (the persisted state a production
  * pipeline reads back — its build cost is amortized across every
  * night it serves, so it is measured separately, not hidden).
  *
  * Both paths must produce identical label tables — checked on every
  * rep, not assumed.
  */
object IncrCcBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-incr-cc-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val clusters = 200000L
    val n = clusters * 10
    val ids = spark.range(n)
    // hub edges (member -> its cluster hub) + member rings, the
    // triangle-fixture topology at 2M nodes
    val baseEdges = ids.filter(col("id") % 10 =!= 0)
      .select(col("id").as("src"), (col("id") - (col("id") % 10)).as("dst"))
      .union(ids.filter(col("id") % 10 >= 1 && col("id") % 10 <= 8)
        .select(col("id").as("src"), (col("id") + 1).as("dst")))
      .localCheckpoint(true)
    // nightly batch: 1000 new nodes, each attaching to an existing hub
    val batch = spark.range(1000)
      .select((col("id") + n).as("src"), (col("id") * 9970 % n - (col("id") * 9970 % n) % 10).as("dst"))
      .localCheckpoint(true)

    // the persisted state: labels of the base graph (built once,
    // amortized across nights)
    val t0 = System.nanoTime()
    val oldLabels = ConnectedComponents
      .labelPropagation(baseEdges, "src", "dst")
      .localCheckpoint(true)
    val stateSec = (System.nanoTime() - t0) / 1e9

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("node") * 31 + col("label"))).head()
      (r.getLong(0), r.getLong(1))
    }
    def time[T](f: => T): (Double, T) = {
      val s = System.nanoTime()
      val out = f
      ((System.nanoTime() - s) / 1e9, out)
    }
    // warm both shapes once
    checksum(ConnectedComponents.incrementalLabels(oldLabels, batch, "src", "dst"))
    checksum(ConnectedComponents.labelPropagation(baseEdges.union(batch), "src", "dst"))

    val reps = 3
    val full = (0 until reps).map(_ => time(checksum(
      ConnectedComponents.labelPropagation(baseEdges.union(batch), "src", "dst"))))
    val incr = (0 until reps).map(_ => time(checksum(
      ConnectedComponents.incrementalLabels(oldLabels, batch, "src", "dst"))))
    require((full.map(_._2) ++ incr.map(_._2)).distinct.size == 1,
      "incremental and full labels must agree across all reps")
    val f = Bench.median(full.map(_._1))
    val i = Bench.median(incr.map(_._1))
    println(f"""{"metric":"incremental_cc","full_sec":$f%.3f,"incremental_sec":$i%.3f,"speedup":${f / i}%.2f,"nodes":$n,"base_edges":${n / 10 * 17},"batch_edges":1000,"state_build_sec":$stateSec%.3f}""")
    spark.stop()
  }
}
