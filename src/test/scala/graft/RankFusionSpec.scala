package graft

/** RRF fusion invariants over the real sf0.001 corpus. */
class RankFusionSpec extends SparkSpec {

  test("rrf_micro is exactly the integer RRF of the two ranks; top-5 per query") {
    val rows = graft.queries.LlmSurface.queries("llm_rank_fusion")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    def contrib(r: Any): Long = r match {
      case null => 0L
      case k: Long => 1000000L / (60L + k)
    }
    rows.foreach { r =>
      val (lex, emb) = (r.get(2), r.get(3))
      assert(r.getLong(4) === contrib(lex) + contrib(emb),
        s"fusion arithmetic broken on $r")
      // a fused row must come from at least one retriever
      assert(lex != null || emb != null)
      lex match { case k: Long => assert(k >= 1L && k <= 20L); case _ => }
      emb match { case k: Long => assert(k >= 1L && k <= 20L); case _ => }
    }
    rows.groupBy(_.getLong(0)).foreach { case (q, g) =>
      assert(g.length <= 5, s"query $q returned ${g.length} rows")
      // docs ranked by BOTH retrievers fuse ahead of single-list docs
      // with comparable ranks: minimum sanity — the top fused score per
      // query is at least any single-retriever-only score in its list
      val best = g.map(_.getLong(4)).max
      val singleOnly = g.filter(r => r.get(2) == null || r.get(3) == null)
        .map(_.getLong(4))
      singleOnly.foreach(sc => assert(best >= sc))
    }
  }
}
