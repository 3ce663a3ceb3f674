package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Jonckheere–Terpstra ordered-alternative trend test (Jonckheere
  * 1954; Terpstra 1952) — the ORDERED k-sample question Kruskal–
  * Wallis cannot ask: not "do these groups differ" but "do values
  * RISE along the group order" (hour buckets, dose levels, cohort
  * ages). JT pools the pairwise Mann–Whitney counts of every ordered
  * group pair, so a monotone drift that leaves each adjacent pair
  * insignificant still accumulates.
  *
  * Exactness: J2 = Σ_{g<h} (2·#{x<y} + #{x=y}) (ties half-counted,
  * doubled to stay integer) accumulates from per-group CUMULATIVE
  * value histograms on the zero-filled global value spine:
  *   J2 = Σ_v Σ_{g<h} c_h(v)·(2·cum_g(v) − c_g(v)),
  * a value-key equi-join of the k×|V| grid with itself (k²/2 rows per
  * value — never rows²). Null moments in integers: E2 = 2·E[J] =
  * (n² − Σn_g²)/2 (always even → exact), and the z² decision
  * cross-multiplies against the χ²₁ literal with the classical
  * NO-TIE variance 72·Var = n²(2n+3) − Σ n_g²(2n_g+3):
  *   z² ≥ 3.841458 ⟺ (J2−E2)²·18·10⁶ ≥ 3841458·72Var.
  * The tie-aware variance correction is NOT applied — documented: on
  * micro-quantized continuous values ties are measure-zero and the
  * no-tie form is the classical tabled one; heavy-tie feeds should
  * pre-dither or accept a slightly anti-conservative z².
  *
  * Envelope: (J2−E2)²·18·10⁶ ≤ n⁴·4.5·10⁶ fits decimal(38,0) to
  * n ≈ 10⁷ rows — loudly enforced.
  *
  * Scale shape: histogram combine agg → per-group cumulative window
  * over the DISTINCT-value spine (k×|V| grid rows, zero-filled so
  * absent cells still carry their cumulative) → one value-key
  * equi-join → one reduction agg. Group count k is a small ordered
  * domain (buckets), not data-scale.
  */
object Jonckheere {

  /** df(groupCol, valueCol): Long-valued ORDERED group index and
    * value. One row: (n, k, jt2, e2, z2_micro, rising, reject_05). */
  def jt(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val hist = df.groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // spine, grid and group sizes all read it
    val spine = hist.select("v").distinct()
    val groups = hist.select("g").distinct()
    val grid = spine.crossJoin(broadcast(groups)) // |V| × k ordered buckets
      .join(hist, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum", sum("c").over(Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true) // both sides of the pair join read it
    val pairs = grid.select(col("g"), col("v"), col("c"), col("cum"))
      .join(grid.select(col("g").as("h"), col("v"),
        col("c").as("ch")), "v")
      .filter(col("g") < col("h"))
      .agg(coalesce(sum(dec(col("ch")) *
        (lit(2L) * dec(col("cum")) - dec(col("c")))), dec(lit(0L)))
        .as("jt2"))
    val sizes = hist.groupBy("g").agg(sum("c").as("ng"))
      .agg(sum(dec(col("ng"))).as("n"),
        count(lit(1)).as("k"),
        sum(dec(col("ng")) * dec(col("ng"))).as("sn2"),
        sum(dec(col("ng")) * dec(col("ng"))
          * (lit(2L) * dec(col("ng")) + lit(3L))).as("sn23"))
    val nChecked = when(col("n") <= 10000000L, col("n"))
      .otherwise(raise_error(concat(lit("Jonckheere: n = "), col("n"),
        lit(" rows exceeds the decimal(38,0) envelope (1e7)"))))
    pairs.crossJoin(broadcast(sizes)) // 1-row scalar join
      .select(col("jt2"), col("k"),
        dec(nChecked).as("n"),
        // n² − Σn_g² is always even (it is 2·Σ_{g<h} n_g·n_h), so the
        // floor is exact — floorDivDec only dodges Spark's half-up
        // decimal `/`
        graft.llm.TextOps.floorDivDec(
          col("n") * col("n") - col("sn2"), dec(lit(2L))).as("e2"),
        (col("n") * col("n") * (lit(2L) * col("n") + lit(3L))
          - col("sn23")).as("var72"))
      .select(col("n").cast("long").as("n"), col("k"),
        col("jt2").cast("long").as("jt2"),
        col("e2").cast("long").as("e2"),
        when(col("var72") > 0,
          graft.llm.TextOps.floorDivDec(
            (col("jt2") - col("e2")) * (col("jt2") - col("e2"))
              * lit(18L) * lit(1000000L),
            col("var72")).cast("long"))
          .otherwise(lit(0L)).as("z2_micro"),
        (col("jt2") > col("e2")).as("rising"),
        (col("var72") > 0
          && (col("jt2") - col("e2")) * (col("jt2") - col("e2"))
            * lit(18L) * lit(1000000L)
            >= dec(lit(3841458L)) * col("var72")).as("reject_05"))
  }
}
