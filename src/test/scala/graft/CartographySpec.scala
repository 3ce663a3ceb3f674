package graft

import graft.llm.TextOps
import org.apache.spark.sql.functions._

/** X396 dataset cartography: integer-moment invariants, band/threshold
  * consistency, and bit-determinism across runs on a small labeled
  * corpus (the loop itself is the llm_classifier_train contract,
  * pinned cross-engine by the shared oracle CTE generator).
  */
class CartographySpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "the a of to and the a of to and"),
    (2L, "the a of to and the cat sat"),
    (3L, "cat dog bird fish mouse"),
    (4L, "red green blue the a"),
    (5L, "the the the the a a a a"),
    (6L, "zebra lion tiger bear wolf fox")).toDF("doc_id", "text")

  private def run() = {
    val ws = TextOps.words(col("text"))
    val stop = size(filter(ws, w => w.isin("the", "a", "of", "to", "and")))
    TextOps.trainingCartography(corpus, "doc_id", "text",
      stop * 1000 >= lit(61) * size(ws), numBuckets = 64, salt = "clf",
      rounds = 10, lrDiv = 200L, clipMilli = 300L)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
  }

  test("moment ranges, band thresholds, and all docs present") {
    val got = run()
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    for ((doc, y, conf, v, nOk, band) <- got) {
      assert(y == 0L || y == 1L, s"doc $doc")
      assert(conf >= 0L && conf <= 1000000L, s"doc $doc conf $conf")
      assert(v >= 0L, s"doc $doc variance $v")
      assert(nOk >= 0L && nOk <= 10L, s"doc $doc n_correct $nOk")
      val expected =
        if (v >= 40000000000L) "ambiguous"
        else if (conf >= 500000L) "easy"
        else "hard"
      assert(band === expected, s"doc $doc band $band (conf $conf var $v)")
    }
    // the identity R·Σe² ≥ (Σe)² (Cauchy–Schwarz) held above as v ≥ 0;
    // both labels must actually occur in this fixture for the
    // class-balanced trainer to be exercised
    assert(got.map(_._2).toSet === Set(0L, 1L))
  }

  test("bit-deterministic across runs") {
    assert(run() === run())
  }
}
