package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latent-factor recommendation by alternating least squares (X298;
  * Koren/Bell/Volinsky IEEE Computer 2009; the ALS schedule of Zhou et
  * al. AAIM'08) — the collaborative-filtering family the surface
  * lacked: [[graft.operators.BipartiteProjection]] relates items that
  * CO-OCCUR, link prediction scores graph proximity; matrix
  * factorization learns a shared low-rank taste space that
  * generalizes to (user, item) pairs never observed together.
  */
object AlsOps {

  private def dec(x: Column): Column = x.cast("decimal(38,0)")

  /** Rank-2 ALS on an integer ratings table, exactly replayable:
    *
    *  - factors live in MILLI units (10³ = 1.0); rank 2 keeps each
    *    half-step's normal equations a 2×2 system solved in CLOSED
    *    FORM by the adjugate — x = 10⁶·adj(A+λI)·b / det, one signed
    *    toward-zero division per component ([[TextOps.truncDivDec]] ≡
    *    DuckDB `//`; factors go negative, floor would diverge). λ > 0
    *    makes A + λI positive definite, so det > 0 always — no
    *    singular systems, no division guards needed;
    *  - A = Σ v·vᵀ and b = Σ r·v are ONE combine-agg per half-step
    *    over the ratings joined to the fixed side's factors — exact
    *    integer sums (products through decimal(38,0));
    *  - init: keyed-md5 factors 1000 + h%201 − 100 (1.0 ± 0.1 milli,
    *    deterministic, no RNG) on the item side; `rounds` full
    *    U-then-V alternations (X56/X192 replayable-loop discipline).
    *
    * Scale: each half-step is one equi-join of the ratings against a
    * |users|- or |items|-row factor table plus one combine agg back to
    * that table — the ratings matrix is touched once per half-step,
    * nothing quadratic exists anywhere (scoring is restricted to
    * OBSERVED candidate items per user, never the user×item product).
    * Factor tables are checkpointed per half-step (each feeds the next
    * solve and the readout).
    *
    * Output: the `topUsers` most active users (n_items desc, user) —
    * their learned factors, their top OBSERVED item under the model
    * (score = u·v in milli² units, ties by item id), and that score.
    */
  def alsFactors(ratings: DataFrame, userCol: String, itemCol: String,
      ratingCol: String, rounds: Int = 2, lambdaMilli2: Long = 100000L,
      topUsers: Int = 20,
      materialize: DataFrame => DataFrame = _.localCheckpoint(eager = true))
      : DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val r = materialize(ratings.select(col(userCol).as("u"),
      col(itemCol).as("i"), col(ratingCol).cast("long").as("r")))
    def h(prefix: String, c: Column, f: Int): Column =
      expr(s"cast(conv(substring(md5(concat('$prefix', " +
        s"cast(${c.toString} as string), '|$f')), 1, 15), 16, 10) " +
        "as bigint)") % 201
    var v = materialize(r.select("i").distinct()
      .select(col("i"), (lit(900L) + h("als|", col("i"), 1)).as("f1"),
        (lit(900L) + h("als|", col("i"), 2)).as("f2")))
    var u: DataFrame = null
    def solve(keyed: DataFrame, key: String): DataFrame = {
      // keyed: (key, r, g1, g2) — the fixed side's factors per rating
      val lam = lit(lambdaMilli2)
      keyed.groupBy(key)
        .agg(sum(dec(col("g1")) * dec(col("g1"))).as("a11"),
          sum(dec(col("g1")) * dec(col("g2"))).as("a12"),
          sum(dec(col("g2")) * dec(col("g2"))).as("a22"),
          sum(dec(col("r")) * dec(col("g1"))).as("b1"),
          sum(dec(col("r")) * dec(col("g2"))).as("b2"))
        .withColumn("_det", (col("a11") + lam) * (col("a22") + lam)
          - col("a12") * col("a12"))
        .select(col(key),
          TextOps.truncDivDec(lit(1000000L)
            * ((col("a22") + lam) * col("b1") - col("a12") * col("b2")),
            col("_det")).cast("long").as("f1"),
          TextOps.truncDivDec(lit(1000000L)
            * ((col("a11") + lam) * col("b2") - col("a12") * col("b1")),
            col("_det")).cast("long").as("f2"))
    }
    (1 to rounds).foreach { _ =>
      u = materialize(solve(r.join(v.select(col("i"), col("f1").as("g1"),
        col("f2").as("g2")), "i"), "u"))
      v = materialize(solve(r.join(u.select(col("u"), col("f1").as("g1"),
        col("f2").as("g2")), "u"), "i"))
    }
    val act = r.groupBy("u").agg(count(lit(1)).as("n_items"))
    val scored = r.join(v, "i").join(u.select(col("u"),
        col("f1").as("u1"), col("f2").as("u2")), "u")
      .select(col("u"), col("i"),
        (dec(col("u1")) * dec(col("f1"))
          + dec(col("u2")) * dec(col("f2"))).cast("long").as("score"))
      .withColumn("_rn", row_number().over(Window.partitionBy("u")
        .orderBy(col("score").desc, col("i"))))
      .filter(col("_rn") === 1)
    act.join(u, "u").join(scored, "u")
      .withColumn("_ur", row_number().over(
        Window.orderBy(col("n_items").desc, col("u"))))
      .filter(col("_ur") <= topUsers)
      .select(col("u").as(userCol), col("n_items"),
        col("f1").as("f1_milli"), col("f2").as("f2_milli"),
        col("i").as("top_item"), col("score").as("top_score_milli2"))
      .orderBy(userCol)
  }
}
