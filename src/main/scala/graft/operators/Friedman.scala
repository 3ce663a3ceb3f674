package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tie-corrected Friedman test (Friedman 1937) — the REPEATED-MEASURES
  * rank test next to Kruskal–Wallis's independent-samples one: ranks
  * are taken WITHIN each block (day), so per-block level shifts
  * (weekday effects, traffic waves) cancel instead of drowning the
  * treatment signal.
  *
  * Exactness: within block b, the doubled tied rank of cell value v is
  * R2 = 2·|{less}| + |{equal}| + 1 — an integer, computed from the
  * block's own k cells via a block-keyed self-join (k² per block,
  * never rows²). With S2_j = Σ_b R2(b, j), Σ_j S2_j = n·k(k+1) exactly
  * and
  *   Q = 12/(nk(k+1))·Σ R_j² − 3n(k+1)
  *     = Σ_j 3·S2_j²/(n·k(k+1)) − 3n(k+1),
  * emitted on the DEFINED term-floored micro grid (the KruskalWallis
  * discipline; under-reads by < k micro, shared by both engines). Tie
  * correction multiplies by nk(k²−1)/(nk(k²−1) − ΣT) with
  * T = Σ_{b, tied groups} (t³ − t). The α = 0.05 decision compares to
  * the shared micro-floored χ²(df = k−1 ≤ 6) literal.
  *
  * Only COMPLETE blocks (all k treatments present) enter — the
  * classical design requirement; the dropped count is reported, not
  * hidden. Envelope: 3·S2_j²·10⁶ fits decimal(38,0) to n·k ≈ 3·10⁷
  * cells — loudly enforced.
  *
  * Scale shape: one combine agg to cells upstream (caller), a
  * block-keyed k² rank join, then block-count-bounded combine aggs.
  */
object Friedman {

  /** cells(blockCol, treatCol, valueCol): ONE row per (block,
    * treatment), Long-valued value. One row out: (n_blocks, k,
    * n_dropped, q_micro, q_adj_micro, reject_05). */
  def test(cells: DataFrame, blockCol: String, treatCol: String,
      valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = cells.select(col(blockCol).as("b"), col(treatCol).as("j"),
      col(valueCol).as("v")).localCheckpoint(true) // k-count + rank join
    val kAll = base.agg(countDistinct(col("j")).as("k"))
    val bcnt = base.groupBy("b").agg(count(lit(1)).as("bk"))
    val complete = base.join(bcnt, "b").crossJoin(broadcast(kAll))
      .filter(col("bk") === col("k"))
      .select("b", "j", "v")
      .localCheckpoint(true) // self-join both sides + tie agg
    val nDropped = bcnt.crossJoin(broadcast(kAll))
      .filter(col("bk") =!= col("k")).agg(count(lit(1)).as("n_dropped"))
    // doubled tied rank within the block, from the block's own cells
    val ranked = complete
      .join(complete.select(col("b"), col("v").as("v2")), "b")
      .groupBy("b", "j", "v")
      .agg((lit(2L) * sum(when(col("v2") < col("v"), 1L).otherwise(0L))
        + sum(when(col("v2") === col("v"), 1L).otherwise(0L)) + 1L)
        .as("r2"))
    val sj = ranked.groupBy("j").agg(sum(dec(col("r2"))).as("s2"))
    val nb = complete.select("b").distinct().agg(count(lit(1)).as("n"))
    val ties = complete.groupBy("b", "v").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(dec(col("t")) * dec(col("t")) * dec(col("t"))
        - dec(col("t"))), dec(lit(0L))).as("tt"))
    val scal = nb.crossJoin(broadcast(kAll)).crossJoin(broadcast(ties))
      .crossJoin(broadcast(nDropped)) // 1-row scalar joins
    val nChecked = when(col("n") * col("k") <= 30000000L, col("n"))
      .otherwise(raise_error(concat(lit("Friedman: n*k = "),
        col("n") * col("k"),
        lit(" cells exceeds the decimal(38,0) envelope (3e7)"))))
    val terms = sj.crossJoin(broadcast(scal))
      .select(col("n"), col("k"), col("tt"), col("n_dropped"),
        graft.llm.TextOps.floorDivDec(
          dec(lit(3L)) * col("s2") * col("s2") * lit(1000000L),
          dec(nChecked) * dec(col("k")) * dec(col("k") + 1)).as("term"))
      .groupBy("n", "k", "tt", "n_dropped")
      .agg(sum("term").as("qsum"))
    terms
      .select(col("n"), col("k"), col("n_dropped"), col("tt"),
        (col("qsum") - dec(lit(3L)) * dec(col("n")) * dec(col("k") + 1)
          * lit(1000000L)).as("q_dec"),
        (dec(col("n")) * dec(col("k"))
          * (dec(col("k")) * dec(col("k")) - 1)).as("nkk"))
      .select(col("n").as("n_blocks"), col("k"), col("n_dropped"),
        col("q_dec").cast("long").as("q_micro"),
        when(col("nkk") > col("tt"),
          graft.llm.TextOps.truncDivDec(col("q_dec") * col("nkk"),
            col("nkk") - col("tt")).cast("long"))
          .otherwise(lit(0L)).as("q_adj_micro"))
      .withColumn("reject_05",
        col("q_adj_micro") >= KruskalWallis.chi95micro.toSeq.sortBy(_._1)
          .foldLeft(raise_error(lit("Friedman: chi-square table covers"
            + " df 1..6 (k in 2..7)")).cast("long")) {
            case (acc, (d, q)) =>
              when(col("k") - 1 === d, lit(q)).otherwise(acc)
          })
      .select("n_blocks", "k", "n_dropped", "q_micro", "q_adj_micro",
        "reject_05")
  }
}
