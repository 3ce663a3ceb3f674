package graft

import graft.operators.AssociationRules

/** Hand-checked semantics for X259 association rules — exact ppm
  * confidence/lift on the shared capped relation, both rule
  * directions, min-support pruning, and the whale cap.
  */
class AssociationRulesSpec extends SparkSpec {

  import spark.implicits._

  private def run(rel: Seq[(Long, String)], cap: Int = 5,
      minSupport: Long = 2, topK: Int = 50) =
    AssociationRules.rules(rel.toDF("basket", "item"), "basket", "item",
        cap, minSupport, topK)
      .select("antecedent", "consequent", "s_pair", "s_ante", "s_cons",
        "n_baskets", "conf_ppm", "lift_ppm")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()

  test("textbook 4-basket case: exact ppm confidence and lift") {
    // baskets: {a,b}, {a,b}, {a,c}, {b} — s(a)=3, s(b)=3, s(ab)=2, N=4
    val rel = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b",
      3L -> "a", 3L -> "c", 4L -> "b")
    val got = run(rel).map(r => (r._1, r._2) -> r).toMap
    // (a,c) has pair support 1 < 2 — pruned; only a<->b survives
    assert(got.keySet === Set("a" -> "b", "b" -> "a"))
    val ab = got("a" -> "b")
    assert(ab._3 === 2L && ab._4 === 3L && ab._5 === 3L && ab._6 === 4L)
    assert(ab._7 === 666666L)             // 2e6 div 3
    assert(ab._8 === 888888L)             // 2·4·1e6 div 9
    // lift is symmetric; confidence here too (equal supports)
    assert(got("b" -> "a")._8 === 888888L)
  }

  test("asymmetric supports: confidence differs by direction, lift not") {
    // s(x)=4, s(y)=2, s(xy)=2, N=5
    val rel = Seq(1L -> "x", 1L -> "y", 2L -> "x", 2L -> "y",
      3L -> "x", 4L -> "x", 5L -> "z")
    val got = run(rel).map(r => (r._1, r._2) -> r).toMap
    assert(got("x" -> "y")._7 === 500000L)   // 2/4
    assert(got("y" -> "x")._7 === 1000000L)  // 2/2
    assert(got("x" -> "y")._8 === got("y" -> "x")._8)
    assert(got("x" -> "y")._8 === 1250000L)  // 2·5/(4·2)
  }

  test("independent items land at lift exactly 1") {
    // a and b in every basket: s(a)=s(b)=s(ab)=N=3
    val rel = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b",
      3L -> "a", 3L -> "b")
    val got = run(rel)
    assert(got.forall(_._8 === 1000000L))
    assert(got.forall(_._7 === 1000000L))
  }

  test("cap prunes whale baskets before every support count") {
    // basket 1 holds a..f; cap 2 keeps {a,b} only, so s(c)=0 and the
    // (a,b) pair from the whale basket plus basket 2 reaches support 2
    val rel = Seq("a", "b", "c", "d", "e", "f").map(1L -> _) ++
      Seq(2L -> "a", 2L -> "b")
    val got = run(rel, cap = 2).map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet === Set("a" -> "b", "b" -> "a"))
    val ab = got("a" -> "b")
    // item supports count capped membership only: s(a)=s(b)=2, N=2
    assert(ab._3 === 2L && ab._4 === 2L && ab._5 === 2L && ab._6 === 2L)
    // conf = 2/2, lift = 2·2/(2·2) = 1 exactly
    assert(ab._7 === 1000000L && ab._8 === 1000000L)
  }
}
