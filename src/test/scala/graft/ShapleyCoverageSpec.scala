package graft

import graft.llm.EvalOps

/** Hand-checked semantics for X279 Shapley coverage attribution — the
  * closed form against a brute-force 2^n Shapley computation, plus the
  * efficiency axiom as an exact-integer invariant.
  */
class ShapleyCoverageSpec extends SparkSpec {

  import spark.implicits._

  private val lcm20 = 232792560L

  private def run(docs: Seq[(String, String)]) =
    EvalOps.shapleyCoverage(docs.toDF("source", "text"), "source", "text")
      .select("source", "n_words", "n_unique", "shapley_scaled")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  /** Brute-force Shapley over all n! orderings of the coverage game. */
  private def brute(words: Map[String, Set[String]]): Map[String, Double] = {
    val players = words.keys.toSeq.sorted
    val perms = players.permutations.toSeq
    players.map { p =>
      p -> perms.map { perm =>
        val before = perm.takeWhile(_ != p).flatMap(words).toSet
        (words(p) -- before).size.toDouble
      }.sum / perms.size
    }.toMap
  }

  test("closed form matches brute-force Shapley on a 3-source corpus") {
    val corpus = Map(
      "s1" -> Set("a", "b", "c"),
      "s2" -> Set("b", "c", "d"),
      "s3" -> Set("c", "e"))
    val got = run(corpus.toSeq.map { case (s, ws) => (s, ws.mkString(" ")) })
    val want = brute(corpus)
    for ((s, phi) <- want)
      assert(math.abs(got(s)._4.toDouble / lcm20 - phi) < 1e-9,
        s"$s: ${got(s)._4.toDouble / lcm20} vs $phi")
  }

  test("efficiency: scaled values sum exactly to vocab * lcm") {
    val got = run(Seq(("s1", "a b c"), ("s2", "b c d"), ("s3", "c e")))
    assert(got.values.map(_._4).sum === 5L * lcm20)
  }

  test("a fully-unique source keeps its whole vocabulary") {
    val got = run(Seq(("s1", "a b"), ("s2", "x y z")))
    assert(got("s2") === (("s2", 3L, 3L, 3L * lcm20)))
  }

  test("a duplicated word is split evenly; repeats within a doc ignored") {
    val got = run(Seq(("s1", "a a shared"), ("s2", "shared")))
    assert(got("s1")._4 === lcm20 + lcm20 / 2)
    assert(got("s2")._4 === lcm20 / 2)
  }

  test("a word shared by > 20 sources raises instead of silently flooring") {
    // 21 sources all containing "shared": lcm(1..20)/21 is not an
    // integer, the efficiency axiom would silently break — ENFORCED
    val docs = (1 to 21).map(i => (f"s$i%02d", "shared"))
    val ex = intercept[Exception] { run(docs) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("shapleyCoverage")), ex.toString)
    // exactly 20 sources stays fine and exact
    val ok = run((1 to 20).map(i => (f"s$i%02d", "shared")))
    assert(ok.values.map(_._4).sum === lcm20)
  }
}
