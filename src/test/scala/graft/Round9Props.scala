package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.SuffixArray

/** Property-based checks for the round-9 operators. Few iterations —
  * each case runs Spark jobs.
  */
object Round9Props extends Properties("Round9Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4)

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- bottomk_distinct_long ≡ brute-force k smallest distinct ----------
  // The KMV sketch state must be a pure function of the VALUE SET, no
  // matter how the rows are partitioned or duplicated — that is the
  // property both its mergeability and its cross-engine oracle rest on.

  private val valuesGen: Gen[List[Long]] = for {
    n <- Gen.choose(0, 400)
    vs <- Gen.listOfN(n, Gen.choose(-50L, 120L)) // dense range → many dups
  } yield vs

  property("bottomkDistinct = sorted distinct take k, any partitioning") =
    forAll(valuesGen, Gen.choose(1, 12), Gen.choose(1, 16)) { (vs, k, parts) =>
      val got = vs.toDF("v").repartition(parts)
        .agg(expr(s"bottomk_distinct_long(v, $k)"))
        .head().getSeq[Long](0).toList
      got == vs.distinct.sorted.take(k)
    }

  property("bottomkDistinct skips nulls, empty input → empty array") =
    forAll(valuesGen, Gen.choose(1, 8)) { (vs, k) =>
      val withNulls = vs.map(Option(_)) ++ List.fill(5)(Option.empty[Long])
      val got = withNulls.toDF("v")
        .agg(expr(s"bottomk_distinct_long(v, $k)"))
        .head().getSeq[Long](0).toList
      got == vs.distinct.sorted.take(k)
    }

  // ---- suffix-array longest repeats ≡ brute-force over random corpora ---
  // Random small corpora over a tiny vocabulary breed repeats and
  // equal suffixes — the adversarial case for rank convergence and the
  // LCP descent. The brute force sorts all suffixes in memory and
  // replays the exact pair/filter/top-k contract.

  private val corpusGen: Gen[List[String]] = for {
    nDocs <- Gen.choose(2, 6)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(1, 12)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" "))
  } yield docs

  private def bruteRepeats(docs: List[(Long, String)], topK: Int,
      minTokens: Int): List[(Long, Int, Long, Int, Long)] = {
    val sufs = docs.flatMap { case (d, t) =>
      val ws = t.split(" ", -1)
      ws.indices.map(i => (d, i + 1, ws.drop(i).toList,
        if (i > 0) Some(ws(i - 1)) else None))
    }
    implicit val ord: Ordering[List[String]] = Ordering.Implicits.seqOrdering
    val sa = sufs.sortBy { case (d, p, s, _) => (s, d, p.toLong) }
    sa.zip(sa.drop(1)).map { case ((da, pa, sA, wa), (db, pb, sB, wb)) =>
      val lcp = sA.zip(sB).takeWhile { case (x, y) => x == y }.size
      (da, pa, db, pb, lcp.toLong, wa, wb)
    }
      .filter { case (_, _, _, _, _, wa, wb) => wa != wb || wa.isEmpty }
      .filter(_._5 >= minTokens)
      .map { case (da, pa, db, pb, l, _, _) => (da, pa, db, pb, l) }
      .sortBy { case (da, pa, db, pb, l) => (-l, da, pa.toLong, db, pb.toLong) }
      .take(topK)
  }

  property("longestRepeats ≡ in-memory suffix sort + LCP + left-max + top-k") =
    forAll(corpusGen, Gen.choose(1, 4)) { (texts, minTokens) =>
      val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val got = SuffixArray.longestRepeats(docs.toDF("doc_id", "text"),
          "doc_id", "text", topK = 50, minTokens = minTokens)
        .as[(Long, Int, Long, Int, Long)].collect().toList
      got == bruteRepeats(docs, 50, minTokens)
    }
}
