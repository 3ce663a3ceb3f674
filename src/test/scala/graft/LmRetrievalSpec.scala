package graft

/** X351 Dirichlet query-likelihood retrieval: the registered query
  * against an INDEPENDENT brute-force scorer (plain Scala over the
  * same micro-ln grid), inverted-index candidate semantics (a doc
  * sharing no query term is absent), and deterministic tie order.
  */
class LmRetrievalSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (0L, "a b a"), (1L, "a b c"), (2L, "b b b"), (3L, "c c c c"))

  private lazy val dir = {
    val d = "/tmp/graft_lmretrieval_fixture"
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("scores match an independent brute-force QL on the micro-ln grid") {
    val mu = 2000L
    def lmu(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val c = toks.values.map(_.size).sum.toLong
    val cf = toks.values.flatten.groupBy(identity).map { case (w, xs) =>
      w -> xs.size.toLong }
    val q = toks(0L).groupBy(identity).map { case (w, xs) =>
      w -> xs.size.toLong }
    val nq = toks(0L).size.toLong
    def score(d: Long): Option[Long] = {
      val tf = toks(d).groupBy(identity).map { case (w, xs) =>
        w -> xs.size.toLong }
      if (!q.keys.exists(tf.contains)) None
      else {
        val qconst = q.map { case (w, qtf) =>
          qtf * (lmu(mu * cf(w)) - lmu(c)) }.sum
        val msum = q.collect { case (w, qtf) if tf.contains(w) =>
          qtf * (lmu(tf(w) * c + mu * cf(w)) - lmu(mu * cf(w))) }.sum
        Some(qconst + msum - nq * lmu(toks(d).size + mu))
      }
    }
    val expect = Seq(1L, 2L, 3L).flatMap(d => score(d).map(d -> _))
      .sortBy { case (d, s) => (-s, d) }
      .zipWithIndex.map { case ((d, s), i) => (0L, i + 1L, d, s) }
    val got = graft.queries.LlmSurface.queries("llm_lm_retrieval")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // doc 3 shares no query term — inverted-index semantics drop it
    assert(!got.exists(_._3 == 3L))
    // doc 1 matches both query terms, doc 2 only 'b': 1 must outrank 2
    assert(got.head._3 === 1L)
  }

  test("X370 eval: same-source relevance drives MRR and success@5") {
    // same corpus, sources split: the query (doc 0) is srcA; doc 1
    // (the top hit) is srcB, doc 2 (second) is srcA, doc 3 absent →
    // first relevant rank = 2 → MRR = ⌊10⁶/2⌋, success@5 = 1
    val d2 = "/tmp/graft_lmretrieval_eval_fixture"
    docs.map { case (id, t) =>
      val src = if (id == 0L || id == 2L) "srcA" else "srcB"
      (id, t, "en", src, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d2/documents.parquet")
    val r = graft.queries.LlmSurface
      .queries("llm_lm_retrieval_eval")(spark, d2)
      .as[(Long, Long, Long)].collect().head
    assert(r === ((1L, 500000L, 1000000L)))
  }
}
