package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact two-sample Cramér–von Mises T from a paired value histogram
  * (Anderson 1962 two-sample form) — the INTEGRATED-gap companion to
  * KS's max-gap (operators/KsTest.scala, same input shape): KS reads
  * the single worst CDF separation, CvM the whole-curve L² one, so a
  * distribution that differs by many small persistent gaps (which KS
  * under-reads) moves T.
  *
  * Statistic, computed over the observation multiset:
  *   T = n·m/N² · Σ_obs (F_n(x) − G_m(x))²
  *     = Σ_v (c1+c2)_v · d_v² / (N²·n·m),   d_v = f1_v·m − f2_v·n
  * (f1, f2 the cumulative counts) — pure integers until ONE final
  * floored micro division; no ratio ever floats. The α = 0.05
  * decision is the shared-literal exact-rational compare against the
  * asymptotic 5% point 0.46136 of T's limiting ω² distribution:
  *   reject ⟺ Σ c·d²·10⁵ ≥ 46136·N²·n·m.
  *
  * Envelope: Σ c·d²·10⁶ ≤ N·(n·m)²·10⁶ must fit decimal(38,0), which
  * holds to N ≈ 3·10⁶ rows — enforced LOUDLY (raise_error), not
  * silently wrapped. Feed per-stratum histograms upstream to stay
  * inside.
  *
  * Scale shape: identical to ks2 — the input is the (value, c1, c2)
  * HISTOGRAM (value-domain sized, one combine agg per side upstream);
  * the cumulative window runs over distinct values only, and the
  * final reduction is a single agg.
  */
object CvmTest {

  /** counts(s, c1, c2): per distinct value, the two samples' counts.
    * One row: (n1, n2, t_micro, reject_05). An empty side yields
    * t_micro = 0 and no rejection; an empty input yields zero rows. */
  def cvm2(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val cum = counts
      .withColumn("f1", sum("c1").over(Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("f2", sum("c2").over(Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = counts.agg(coalesce(sum("c1"), lit(0L)).as("n1"),
      coalesce(sum("c2"), lit(0L)).as("n2"))
    val nChecked = when(col("n1") + col("n2") <= 3000000L, col("n1"))
      .otherwise(raise_error(concat(lit("CvmTest: N = "),
        col("n1") + col("n2"),
        lit(" exceeds the decimal(38,0) envelope (3e6); stratify the"
          + " histograms upstream"))))
    cum.crossJoin(broadcast(n))
      .select(col("n1"), col("n2"), dec(col("c1") + col("c2")).as("cv"),
        (dec(col("f1")) * dec(col("n2"))
          - dec(col("f2")) * dec(nChecked)).as("d"))
      .select(col("n1"), col("n2"),
        (col("cv") * col("d") * col("d")).as("cd2"))
      .groupBy("n1", "n2")
      .agg(sum("cd2").as("tnum"))
      .select(col("n1"), col("n2"),
        when(col("n1") > 0 && col("n2") > 0,
          graft.llm.TextOps.floorDivDec(col("tnum") * lit(1000000L),
            dec(col("n1") + col("n2")) * dec(col("n1") + col("n2"))
              * dec(col("n1")) * dec(col("n2"))).cast("long"))
          .otherwise(lit(0L)).as("t_micro"),
        (col("n1") > 0 && col("n2") > 0
          && col("tnum") * lit(100000L)
            >= dec(lit(46136L)) * dec(col("n1") + col("n2"))
              * dec(col("n1") + col("n2")) * dec(col("n1"))
              * dec(col("n2"))).as("reject_05"))
  }
}
