package graft

import org.apache.spark.sql.functions._

/** X349/X350 readability + Gopher rules: hand-computed grades (both
  * signs, the punctuated multi-sentence path) and the per-rule gate
  * tallies, driven through the REGISTERED queries over a planted
  * documents.parquet.
  */
class TextQualitySpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir = {
    val d = "/tmp/graft_textquality_fixture"
    Seq(
      // srcA: 3 words incl. 2 stopwords; short + short-word failures
      (0L, "the of ab", "en", "srcA", 9L),
      // srcB: 60 repeated 4-char words; passes everything but stopwords
      (1L, Seq.fill(60)("word").mkString(" "), "en", "srcB", 299L),
      // srcC: punctuation exercises the real sentence count (3 runs)
      (2L, "it is. he has! so?", "en", "srcC", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("readability: hand-computed FK/FRE per doc, sentence runs counted") {
    val r = graft.queries.LlmSurface.queries("llm_readability")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // srcA: W=3, S=1, Y=3 → FK = (390000·9 + 11800000·3 − 15590000·3)/3
    //  = −2620000 (negative grades are real at tiny W);
    //  FRE = (206835000·3 − 1015000·9 − 84600000·3)/3 = 119190000
    // srcB: W=60, S=1, Y=60 → FK = 19610000 (0.39·60 + 11.8 − 15.59),
    //  FRE = (206835000·60 − 1015000·3600 − 84600000·60)/(60)
    assert(r.find(_._1 == "srcA").get ===
      (("srcA", 1L, 3L, -2620000L, 119190000L, 0L)))
    assert(r.find(_._1 == "srcB").get._4 === 19610000L)
    // srcC: words = 5, sct = 3 ([.!?]+ runs), vowel groups: i,i,e,a,o
    //  → y = max(5,5) = 5
    val c = r.find(_._1 == "srcC").get
    assert(c._3 === 5L)
    // FK = (390000·25 + 11800000·5·3 − 15590000·3·5) div 15
    //    = (9750000 + 177000000 − 233850000) div 15 = −3140000
    assert(c._4 === -3140000L)
  }

  test("gopher rules: per-rule gates and the no-stopword composite") {
    val r = graft.queries.LlmSurface.queries("llm_gopher_rules")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // srcA: w=3 fails word count; mean word len 7/3 < 3 fails; has
    // 2 stopwords so r_stop passes → fail_stopwords 0
    assert(r.find(_._1 == "srcA").get ===
      (("srcA", 1L, 0L, 0L, 1L, 1L, 0L)))
    // srcB: passes wc/mwl/alpha/sym but has no stopwords → n_pass 0,
    // n_pass_nostop 1, fail_stopwords 1
    assert(r.find(_._1 == "srcB").get ===
      (("srcB", 1L, 0L, 1L, 0L, 0L, 1L)))
  }
}
