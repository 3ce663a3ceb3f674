package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort-key / RLE encoding advisor — the layout question every columnar
  * table owner answers before a rewrite (Redshift sort-key advisor,
  * ClickHouse ORDER BY tuning, parquet v2 RLE_DICTIONARY sizing): for
  * each candidate sort key K and each target column C, how many RLE
  * runs would C have if the table were rewritten sorted by (K, C)?
  * Fewer runs ⇒ better RLE compression and better min/max pruning for
  * predicates on C. The X110 z-order op picks a multi-column layout;
  * this one prices the single-key alternatives.
  *
  * Exact, no sampling, and NO global data sort: under a (K, C) sort the
  * run count decomposes as
  *   runs(C | K) = Σ_k ndv_C(k) − #{consecutive K groups with
  *                                  max_C(k) = min_C(k+1)}
  * so one groupBy-K pass (map-side combine) yields a |K|-row metadata
  * table, and the boundary correction is a lag window over THAT table
  * — the single-partition window touches |K| rows, never the corpus.
  * Candidate keys are therefore restricted to dimension-like (low-NDV)
  * columns, which is also the only regime where a sort key helps RLE.
  * The K = C diagonal doubles as a self-check: runs must equal ndv.
  *
  * Output: (sort_key, target_col, n, ndv, runs, run_ratio), run_ratio
  * = runs/n rounded to 6 dp.
  */
object EncodingAdvisor {

  def rleAdvisor(df: DataFrame, keys: Seq[(String, Column)],
      targets: Seq[(String, Column)]): DataFrame = {
    val globals = df.agg(
      count(lit(1)).as("_n"),
      targets.map { case (cn, c) => countDistinct(c).as(s"_ndv_$cn") }: _*)
    val perKey = keys.map { case (kn, k) =>
      val aggs = targets.flatMap { case (cn, c) =>
        Seq(countDistinct(c).as(s"_ndvk_$cn"), min(c).as(s"_mn_$cn"),
          max(c).as(s"_mx_$cn"))
      }
      val meta = df.groupBy(k.as("_k"))
        .agg(count(lit(1)).as("_cnt"), aggs: _*)
      val w = Window.orderBy("_k")
      val pairRows = targets.map { case (cn, _) =>
        val merged = when(
          lag(col(s"_mx_$cn"), 1).over(w) === col(s"_mn_$cn"), 1L)
          .otherwise(0L)
        meta.select(col(s"_ndvk_$cn").as("_ndvk"), merged.as("_m"))
          .agg((sum("_ndvk") - sum("_m")).as("runs"))
          .select(lit(kn).as("sort_key"), lit(cn).as("target_col"),
            col("runs"))
      }
      pairRows.reduce(_ unionByName _)
    }.reduce(_ unionByName _)
    val ndvCols = targets.map { case (cn, _) =>
      struct(lit(cn).as("tc"), col(s"_ndv_$cn").as("ndv"))
    }
    val ndvTable = globals
      .select(col("_n"), explode(array(ndvCols: _*)).as("g"))
      .select(col("_n"), col("g.tc").as("target_col"), col("g.ndv"))
    perKey.join(broadcast(ndvTable), "target_col")
      .select(col("sort_key"), col("target_col"), col("_n").as("n"),
        col("ndv"), col("runs"),
        graft.llm.TextOps.round6(
          col("runs").cast("double") / col("_n").cast("double"))
          .as("run_ratio"))
      .orderBy("sort_key", "target_col")
  }
}
