package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
  * FIXED-SIZE companion to the KMV bottom-k sketch already in the
  * surface (llm_kmv_set_ops): m = 2^p registers per group, each
  * holding the max leading-zero rank seen in its hash sub-stream;
  * estimate = α_m·m² / Σ 2^(−M_j). At 100 TB this is THE cardinality
  * primitive: per-group state is 2^p bytes regardless of corpus size,
  * the register fold is a plain max-combine aggregation (map-side
  * partial, one exchange), and union across shards is register-wise
  * max — embarrassingly mergeable.
  *
  * Exactness discipline: the hash is the repo's shared 60-bit
  * md5-prefix integer (identical in Spark and DuckDB); the register
  * rank comes from STRING bit-length (`bin(w)` — exact in both
  * engines, no float log2); Σ 2^(−M_j) is kept as the exact integer
  * Σ 2^(WBITS+1−M_j) (empty registers contribute 2^(WBITS+1)); α_m is
  * the ONE folded constant, computed once in this JVM and interpolated
  * into the oracle as a literal (the SPRT folded-constant rule — no
  * runtime transcendental can disagree because neither engine
  * evaluates one). The raw estimator is reported together with the
  * empty-register count V so callers can apply the small-range
  * linear-counting correction upstream of this operator (ln(m/V) is
  * data-dependent and would break the no-transcendental contract).
  */
object Hll {

  /** Register index bits: m = 1024 registers, the 60-bit hash splits
    * into 10 index bits (mod) and a 50-bit rank field (div). */
  val P = 10
  val M: Long = 1L << P
  val WBITS: Int = 60 - P

  /** α_1024 · 10⁶ = ⌊0.7213/(1 + 1.079/m)·10⁶ + 0.5⌋ — folded once
    * here, shared verbatim by the Spark plan and the DuckDB oracle. */
  val ALPHA_MICRO: Long =
    math.floor(0.7213 / (1.0 + 1.079 / M.toDouble) * 1e6 + 0.5).toLong

  /** df(gCol, hCol): hCol is the shared 60-bit nonnegative hash long.
    * One row per group: (g, n_registers_hit, v_empty, est). */
  def estimate(df: DataFrame, gCol: String, hCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val regs = df
      .select(col(gCol).as("g"), col(hCol).as("h"))
      // integer div, NOT `/` — Spark's `/` on longs returns DOUBLE
      .select(col("g"), (col("h") % M).as("idx"),
        expr(s"h div $M").as("w"))
      .withColumn("rho",
        when(col("w") === 0L, lit(WBITS + 1))
          .otherwise(lit(WBITS + 1) - length(bin(col("w")))))
      .groupBy("g", "idx").agg(max("rho").as("mj"))
    regs.groupBy("g")
      .agg(count(lit(1)).as("hit"),
        // column-valued shift amount needs the SQL form — the Scala
        // shiftleft(e, numBits) helper only takes a literal Int
        sum(expr(s"cast(shiftleft(cast(1 as bigint), ${WBITS + 1} - mj)"
          + " as decimal(38,0))")).as("sHit"))
      .select(col("g"), col("hit").as("n_registers_hit"),
        (lit(M) - col("hit")).as("v_empty"),
        graft.llm.TextOps.floorDivDec(
          dec(lit(ALPHA_MICRO)) * dec(lit(M)) * dec(lit(M))
            * dec(lit(1L << (WBITS + 1))),
          (col("sHit") + dec(lit(M) - col("hit"))
            * dec(lit(1L << (WBITS + 1)))) * lit(1000000L))
          .cast("long").as("est"))
  }
}
