package graft

import graft.llm.EvalOps

/** Hand-checked semantics for X280 Bradley-Terry MM — the exact
  * 2-player fixed point, rank ordering on a cycle, and the winless
  * clamp.
  */
class BradleyTerrySpec extends SparkSpec {

  import spark.implicits._

  private def run(games: Seq[(String, String)], rounds: Int = 15) =
    EvalOps.bradleyTerry(games.toDF("winner", "loser"), "winner", "loser",
        rounds)
      .select("player", "n_wins", "n_games", "strength_micro")
      .as[(String, Long, Long, Long)].collect()

  test("two players at 3:1 hit the exact s_a/s_b = 3 fixed point") {
    // MM from equal start: denom = floor(4e12/2e6) = 2e6 for both;
    // s_a = floor(3e12/2e6) = 1.5e6, s_b = 0.5e6; sum = 2e6 so the
    // mean-1 renormalization is the identity, and every later round
    // reproduces it (s_a+s_b invariant). Exact integers, no drift.
    val got = run(Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "a")))
      .map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 3L, 4L, 1500000L)))
    assert(got("b") === (("b", 1L, 4L, 500000L)))
  }

  test("dominance chain ranks transitively with exact game counts") {
    val got = run(Seq(("a", "b"), ("a", "b"), ("b", "c"), ("b", "c"),
      ("a", "c"), ("c", "a")))
    assert(got.map(_._1).toSeq === Seq("a", "b", "c"))
    val byP = got.map(r => r._1 -> r).toMap
    assert(byP("a")._2 === 3L && byP("a")._3 === 4L)
    assert(byP("b")._2 === 2L && byP("b")._3 === 4L)
    assert(byP("c")._2 === 1L && byP("c")._3 === 4L)
  }

  test("a winless player clamps to >= 1, never zeroing a denominator") {
    val got = run(Seq(("a", "b"), ("a", "b"), ("b", "c"), ("a", "c")))
    val byP = got.map(r => r._1 -> r).toMap
    assert(byP("c")._2 === 0L && byP("c")._4 >= 1L)
    assert(got.map(_._1).head === "a")
  }

  test("strengths renormalize to mean ~1e6 (within per-player floor)") {
    val got = run(Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "b")))
    val tot = got.map(_._4).sum
    assert(tot <= 3L * 1000000L && tot > 3L * 1000000L - 3L)
  }
}
