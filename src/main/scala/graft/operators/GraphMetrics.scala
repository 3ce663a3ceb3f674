package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** One-number graph-structure readouts over an undirected edge list. */
object GraphMetrics {

  /** Degree assortativity (Newman 2002): Pearson r over
    * (deg_src, deg_dst) with BOTH orientations of every edge — the
    * "do hubs link to hubs" coefficient (−1 hub-and-spoke, +1
    * core-periphery). Moments are exact decimal; doubles appear only
    * in the final r. Shape: one degree combine-agg, two equi-joins of
    * the directed edge list onto it, one 1-row reduce — never a
    * node-pair enumeration.
    */
  def degreeAssortativity(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val sym = edges.select(col(aCol).as("n"), col(bCol).as("m"))
      .unionAll(edges.select(col(bCol).as("n"), col(aCol).as("m")))
    val deg = sym.groupBy("n").agg(count(lit(1)).as("d"))
    val pairs = sym
      .join(deg.select(col("n"), col("d").as("da")), "n")
      .join(deg.select(col("n").as("m"), col("d").as("db")), "m")
    val mom = pairs.agg(count(lit(1)).cast("decimal(38,0)").as("me"),
      sum(dec(col("da"))).as("sa"), sum(dec(col("db"))).as("sb"),
      sum(dec(col("da")) * dec(col("da"))).as("saa"),
      sum(dec(col("db")) * dec(col("db"))).as("sbb"),
      sum(dec(col("da")) * dec(col("db"))).as("sab"))
    mom.crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
      .select(col("n_nodes"),
        expr("CAST(me AS BIGINT) DIV 2").as("n_edges"),
        TextOps.round6(
          (col("me") * col("sab") - col("sa") * col("sb")).cast("double")
            / (sqrt((col("me") * col("saa") - col("sa") * col("sa"))
                .cast("double"))
              * sqrt((col("me") * col("sbb") - col("sb") * col("sb"))
                .cast("double")))).as("r_assort"))
  }
}
