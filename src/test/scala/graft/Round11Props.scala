package graft

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.llm.EventOps
import graft.operators.RecordLinkage

/** Property-based checks for the round-11 operators. Few iterations —
  * each case runs Spark jobs.
  */
object Round11Props extends Properties("Round11Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4)

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- tabular CUSUM closed form ≡ textbook recursion, any series -------
  // The pair-max unrolling must equal the sequential fold on ARBITRARY
  // day values, not just the hand-planted drifts of the unit spec.

  private val seriesGen: Gen[List[Double]] = for {
    n <- Gen.choose(8, 16)
    vs <- Gen.listOfN(n, Gen.choose(0, 3000).map(_ / 100.0))
  } yield vs

  property("cusumTabular = the sequential fold on random series") =
    forAll(seriesGen) { vs =>
      val ev = vs.zipWithIndex.map { case (v, i) =>
        (Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), "a", v)
      }.toDF("ts", "event_type", "value")
      val got = EventOps.cusumTabular(ev, "ts", "event_type", "value",
          baseDays = 7, kPermille = 50, hPermille = 250)
        .select("day", "cusum_high_micro", "cusum_low_micro")
        .as[(String, Long, Long)].collect().sortBy(_._1).map(r => (r._2, r._3))
      val cents = vs.map(v => math.floor(v * 100 + 0.5).toLong)
      val mu0 = cents.take(7).sum * 1000000L / 7
      val k = mu0 * 50 / 1000
      var hi = 0L; var lo = 0L
      val want = cents.map { c =>
        hi = math.max(0L, hi + c * 1000000L - (mu0 + k))
        lo = math.max(0L, lo + (mu0 - k) - c * 1000000L)
        (hi, lo)
      }
      got.toSeq == want
    }

  // ---- sorted-neighborhood pairs ≡ brute force over the sorted order ----
  // Any key multiset, any window: the pairs must be EXACTLY the rank
  // pairs within distance < w of the (key, id) total order.

  private val recsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 30)
    ks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "aa", "ab"))
  } yield ks.zipWithIndex.map { case (k, i) => (i.toLong, k) }

  property("sortedNeighborhoodPairs = brute-force window pairs") =
    forAll(recsGen, Gen.choose(2, 5)) { (recs, w) =>
      val got = RecordLinkage.sortedNeighborhoodPairs(
          recs.toDF("id", "k"), "id", Seq(col("k")), w)
        .as[(Long, Long)].collect().toSet
      val order = recs.sortBy { case (id, k) => (k, id) }.map(_._1)
      val want = (for {
        i <- order.indices; j <- (i + 1) until math.min(i + w, order.size)
      } yield (order(i), order(j))).toSet
      got == want
    }

  // ---- UCB bonus: monotone in both arguments ----------------------------
  property("ucbBonusMicro decreases in n, increases in p") =
    forAll(Gen.choose(2, 38), Gen.choose(1, 29)) { (p, n) =>
      EventOps.ucbBonusMicro(p, n) >= EventOps.ucbBonusMicro(p, n + 1) &&
      EventOps.ucbBonusMicro(p + 1, n) >= EventOps.ucbBonusMicro(p, n)
    }

  // ---- graph-ANN: degree bound and ring coverage on random corpora ------
  private val vecsGen: Gen[List[Long]] = for {
    n <- Gen.choose(6, 40)
    seeds <- Gen.listOfN(n, Gen.choose(0L, 1000L))
  } yield seeds

  property("graphAnnEdges: bounded out-degree, every node has edges") =
    forAll(vecsGen) { seeds =>
      val df = seeds.zipWithIndex.map { case (s, i) =>
        (i.toLong, Array.tabulate(4)(j => ((s * 31 + j * 17) % 21) - 10))
      }.toDF("vec_id", "qv")
      val edges = graft.llm.VectorOps.graphAnnEdges(df, "vec_id", "qv",
          shards = 2, bits = 2, degree = 3, ringLinks = 2)
        .as[(Long, Long, Long)].collect()
      val deg = edges.groupBy(_._2).view.mapValues(_.length)
      deg.values.forall(_ <= 5) &&
        edges.map(_._2).toSet.size == seeds.size
    }
}
