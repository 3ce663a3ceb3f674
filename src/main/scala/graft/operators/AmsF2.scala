package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** AMS second-frequency-moment sketch (Alon–Matias–Szegedy 1996) —
  * the ±1-projection estimate of F₂ = Σ_v f_v², the self-join /
  * repeat-rate size that prices every equi-join and dedup pass before
  * it runs. Next to the repo's other mergeable sketches (KMV bottom-k
  * for distincts, CMS for point counts, HLL for cardinality): the AMS
  * state is k signed counters per group — each estimator S_j =
  * Σ_v s_j(v)·f_v is a plain SUM, so shard sketches merge by
  * addition and the map side combines — and E[S_j²] = F₂.
  *
  * k = 56 estimators folded as median-of-means: 8 groups of 7,
  * estimate = median₈(group sums)/7 with the median of an even panel
  * read as the mean of the two central order statistics — so the
  * reported value is ⌊(G₍₄₎+G₍₅₎)/14⌋, one floored division total.
  *
  * Exactness: signs come from the multiply-shift slot family the
  * MinHash sketch already uses (a_j·(h mod 2³⁰) + b_j, bit 25), on
  * the shared 60-bit md5 item hash — every product stays under 2⁶⁰,
  * both engines replay the identical bits, and even the ESTIMATE is
  * hash-comparable cross-engine. The exact-F₂ branch is the accuracy
  * AUDIT (err in basis points) and drops at scale.
  */
object AmsF2 {

  val K = 56
  val GROUPS = 8
  val PER_GROUP: Int = K / GROUPS

  /** df(gCol, itemCol, cntCol): one row per DISTINCT (group, item)
    * with its frequency. Returns one row per group:
    * (g, f2_exact, f2_est, err_bp). */
  def estimate(df: DataFrame, gCol: String, itemCol: String,
      cntCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(col(gCol).as("g"), col(itemCol).as("i"),
        col(cntCol).cast("long").as("c"))
      .withColumn("hb", expr(
        "cast(conv(substring(md5(concat('f2|', i)), 1, 15), 16, 10)"
          + " as bigint) % 1073741824"))
      .localCheckpoint(true) // feeds the sketch AND the exact audit
    val est = base
      .withColumn("j", explode(array((0 until K).map(lit): _*)))
      // the MinHash multiply-shift slot family: odd a_j < 2^30, b_j
      .withColumn("m",
        (((lit(2654435761L) * (col("j") + 1)) % 536870912L) * 2 + 1)
          * col("hb")
          + (lit(40503L) * (col("j") + 1)) % 1073741824L)
      .withColumn("sgn", lit(1L) - expr("(m div 33554432) % 2") * 2)
      .groupBy("g", "j").agg(sum(col("sgn") * col("c")).as("s"))
      .withColumn("grp", expr(s"j div $PER_GROUP"))
      .groupBy("g", "grp").agg(sum(dec(col("s")) * dec(col("s")))
        .as("gs"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy("gs", "grp")))
      .filter(col("rn") === GROUPS / 2 || col("rn") === GROUPS / 2 + 1)
      .groupBy("g")
      .agg(graft.llm.TextOps.floorDivDec(sum("gs"),
        lit(2L * PER_GROUP).cast("decimal(38,0)")).cast("long")
        .as("f2_est"))
    val exact = base.groupBy("g")
      .agg(sum(dec(col("c")) * dec(col("c"))).cast("long")
        .as("f2_exact"))
    exact.join(est, "g")
      .select(col("g"), col("f2_exact"), col("f2_est"),
        graft.llm.TextOps.floorDivDec(
          abs(col("f2_est") - col("f2_exact")).cast("decimal(38,0)")
            * lit(10000L),
          dec(col("f2_exact"))).cast("long").as("err_bp"))
  }
}
