package graft

import graft.llm.TopicOps

/** X293 pLSA: a two-vocabulary planted corpus must separate (each
  * fitted topic's head is pure one side, both sides covered), output
  * shape/rank invariants hold, and the fit is deterministic.
  */
class TopicModelSpec extends SparkSpec {

  import spark.implicits._

  private val vocabA = Seq("apple", "banana", "cherry", "date", "elder")
  private val vocabB = Seq("quark", "lepton", "boson", "gluon", "photon")

  private def corpus() = {
    val docs =
      (0 until 10).map(i => (i.toLong,
        (0 until 12).map(j => vocabA((i + j) % 5)).mkString(" "))) ++
      (10 until 20).map(i => (i.toLong,
        (0 until 12).map(j => vocabB((i + j) % 5)).mkString(" ")))
    docs.toDF("doc_id", "text")
  }

  test("planted two-vocabulary corpus separates; both sides covered") {
    val got = TopicOps.plsaTopics(corpus(), "doc_id", "text",
        k = 2, rounds = 4, topWords = 5)
      .select("topic", "rank", "word", "p_nano")
      .as[(Int, Int, String, Long)].collect()
    val byTopic = got.groupBy(_._1)
    assert(byTopic.keySet === Set(0, 1))
    // each topic's top-3 words all come from ONE planted vocabulary
    val sides = byTopic.map { case (t, rows) =>
      val top3 = rows.sortBy(_._2).take(3).map(_._3)
      val aSide = top3.count(vocabA.contains)
      assert(aSide == 3 || aSide == 0,
        s"topic $t head is mixed: ${top3.mkString(",")}")
      t -> (aSide == 3)
    }
    assert(sides.values.toSet === Set(true, false),
      s"both topics landed on the same side: $sides")
  }

  test("rank is dense per topic and ordered by (p desc, word)") {
    val got = TopicOps.plsaTopics(corpus(), "doc_id", "text",
        k = 2, rounds = 2, topWords = 5)
      .select("topic", "rank", "word", "p_nano")
      .as[(Int, Int, String, Long)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
      case _ => ()
      }
    }
  }

  test("deterministic: two fits are identical") {
    def fit() = TopicOps.plsaTopics(corpus(), "doc_id", "text",
        k = 2, rounds = 3, topWords = 5)
      .select("topic", "rank", "word", "p_nano", "weight")
      .as[(Int, Int, String, Long, Long)].collect().toSeq
    assert(fit() === fit())
  }

  test("fold-in: batch docs land on the trained topic of their vocabulary") {
    // base = the two-block corpus; batch: one pure-A doc, one pure-B
    // doc, one all-OOV doc (keeps its init mixture, still sums ~1)
    val batch = Seq(
      (100L, (0 until 8).map(j => vocabA(j % 5)).mkString(" ")),
      (101L, (0 until 8).map(j => vocabB(j % 5)).mkString(" ")),
      (102L, "zzz qqq www")).toDF("doc_id", "text")
    val mix = TopicOps.plsaFoldIn(corpus(), batch, "doc_id", "text",
        k = 2, trainRounds = 4, foldRounds = 2)
      .select("doc_id", "topic", "p_micro")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    // find which trained topic owns vocab A (from the base fit)
    val aTopic = TopicOps.plsaTopics(corpus(), "doc_id", "text",
        k = 2, rounds = 4, topWords = 1)
      .select("topic", "word").as[(Int, String)].collect()
      .find(r => vocabA.contains(r._2)).get._1
    val bTopic = 1 - aTopic
    assert(mix(100L)(aTopic) > mix(100L)(bTopic),
      s"pure-A batch doc not assigned to the A topic: ${mix(100L)}")
    assert(mix(101L)(bTopic) > mix(101L)(aTopic),
      s"pure-B batch doc not assigned to the B topic: ${mix(101L)}")
    mix.values.foreach { m =>
      val tot = m.values.sum
      assert(math.abs(tot - 1000000L) <= 2L, s"mixture sum $tot")
    }
    // the OOV doc keeps a valid (init) mixture rather than vanishing
    assert(mix.contains(102L))
  }
}
