package graft

import graft.operators.AhoCorasick

/** Aho–Corasick automaton correctness: every occurrence at every end
  * position, pinned against an independent brute-force position scan.
  */
class AhoCorasickSpec extends SparkSpec {

  /** Independent oracle: substr comparison at every position. */
  private def brute(text: String, patterns: Seq[String]): Array[Long] =
    patterns.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }.toArray

  test("overlapping, nested and absent patterns match brute force") {
    val pats = Seq("a a", "ar", "spark", "able", "zzz", "a")
    val texts = Seq(
      "a a a a",                 // "a a" occurs 3× (overlapping)
      "spark part table sparkle",
      "",
      "aaaa",
      "zz z zzz zzzz")           // "zzz" 1 + 2 (overlap in zzzz)
    val ac = AhoCorasick.build(pats)
    texts.foreach { t =>
      assert(ac.countAll(t, pats.length).toSeq === brute(t, pats).toSeq,
        s"mismatch on '$t'")
    }
    // pin the overlap semantics explicitly
    assert(ac.countAll("a a a a", pats.length)(0) === 3L)
    assert(ac.countAll("zz z zzz zzzz", pats.length)(4) === 3L)
    // nested: "ar" fires inside both words of "spark part"
    assert(ac.countAll("spark part", pats.length)(1) === 2L)
  }

  test("randomized texts agree with brute force") {
    val pats = Seq("ab", "aba", "ba", "b", "abab")
    val ac = AhoCorasick.build(pats)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val t = (1 to rnd.nextInt(30)).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
      assert(ac.countAll(t, pats.length).toSeq === brute(t, pats).toSeq,
        s"mismatch on '$t'")
    }
  }

  test("scanCounts aggregates per (pattern, group) over a DataFrame") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "g1", "spark spark ar"),
      (2L, "g1", "no hits here"),
      (3L, "g2", "a a a")).toDF("doc_id", "source", "text")
    val out = AhoCorasick
      .scanCounts(docs, "doc_id", "text", "source", Seq("spark", "ar", "a a"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // "ar" fires inside each "spark" too: doc1 has 3 ("spARk"×2 + bare "ar")
    assert(out.toSet === Set(
      ("a a", "g2", 1L, 2L),
      ("ar", "g1", 1L, 3L),
      ("spark", "g1", 1L, 2L)))
  }
}
