package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Pairwise association-rule mining (Agrawal & Srikant VLDB'94 family,
  * restricted to 2-itemsets — the rule size that survives at scale) —
  * the retail-analytics classic over (basket, item) data: for each
  * co-occurring pair, the directional rules A→B and B→A with exact
  * support, confidence, and lift. No reference counterpart (SURVEY
  * §2.6); north-star extension surface (X259).
  *
  * All three statistics are defined on the SAME capped relation (the
  * X148 deterministic per-basket cap, via
  * [[BipartiteProjection.capBaskets]]): item support = baskets whose
  * capped prefix contains the item, pair support = baskets whose
  * prefix contains both. Mixing capped pair counts with uncapped item
  * counts would break the set identities (confidence could exceed 1);
  * on one relation they hold exactly — s(AB) ≤ min s(A), s(B),
  * conf(A→B) = s(AB)/s(A) ∈ [0,1], lift = N·s(AB)/(s(A)·s(B)),
  * symmetric in A,B. Capping bias is the documented whale-basket
  * trade.
  *
  * Determinism: confidence and lift are integer PPM via exact decimal
  * floor-division ([[TextOps.floorDivDec]] — N·s(AB)·10⁶ overflows
  * int64 past ~3·10⁶ baskets, so the products live in decimal(38,0));
  * the top-k order (lift_ppm DESC, conf_ppm DESC, antecedent,
  * consequent) is total. The round6 display ratios derive from the
  * same integers.
  *
  * Scale: one distinct + one window for the cap (the projection's
  * cost), pair supports from the ≤C(cap,2)-fan-out self-join, item
  * supports one combine agg, N one scalar agg broadcast; rule
  * assembly runs entirely on the (pairs × 2) candidate table —
  * min-support pruning happens BEFORE the item-support joins.
  */
object AssociationRules {

  def rules(rel: DataFrame, basketCol: String, itemCol: String,
      cap: Int, minSupport: Long, topK: Int): DataFrame = {
    require(minSupport >= 1, s"minSupport ($minSupport) must be >= 1")
    require(topK >= 1, s"topK ($topK) must be >= 1")
    val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
    val capped = BipartiteProjection.capBaskets(rel, basketCol, itemCol, cap)
      .localCheckpoint(eager = true) // 3 consumers: pairs, supports, N
    val itemSup = capped.groupBy(col("_i").as("item"))
      .agg(count(lit(1)).as("sup"))
    val nB = capped.agg(count_distinct(col("_b")).as("n_baskets"))
    val pairs = capped.as("x").join(capped.as("y"), Seq("_b"))
      .filter(col("x._i") < col("y._i"))
      .groupBy(col("x._i").as("a"), col("y._i").as("b"))
      .agg(count(lit(1)).as("s_pair"))
      .filter(col("s_pair") >= minSupport)
    val directed = pairs
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("s_pair"))
      .unionAll(pairs.select(col("b").as("antecedent"),
        col("a").as("consequent"), col("s_pair")))
    directed
      .join(itemSup.select(col("item").as("antecedent"),
        col("sup").as("s_ante")), "antecedent")
      .join(itemSup.select(col("item").as("consequent"),
        col("sup").as("s_cons")), "consequent")
      .crossJoin(broadcast(nB))
      .select(col("antecedent"), col("consequent"), col("s_pair"),
        col("s_ante"), col("s_cons"), col("n_baskets"),
        TextOps.floorDivDec(dec(col("s_pair")) * lit(1000000),
          dec(col("s_ante"))).cast("long").as("conf_ppm"),
        TextOps.floorDivDec(
          dec(col("s_pair")) * dec(col("n_baskets")) * lit(1000000),
          dec(col("s_ante")) * dec(col("s_cons"))).cast("long")
          .as("lift_ppm"))
      .withColumn("confidence", TextOps.round6(col("conf_ppm") / 1e6))
      .withColumn("lift", TextOps.round6(col("lift_ppm") / 1e6))
      .orderBy(col("lift_ppm").desc, col("conf_ppm").desc,
        col("antecedent"), col("consequent"))
      .limit(topK)
  }
}
