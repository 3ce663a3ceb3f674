package graft

import org.apache.spark.sql.functions._
import graft.llm.{EventOps, TextOps}
import graft.operators.GridJoin

/** Hand-checked semantics for the round-8 wave-6 ops: bigram-LM
  * cross-entropy, Poisson-bootstrap CI, CUSUM drift, U-shaped
  * attribution, and the grid proximity join.
  */
class Wave6OpsSpec extends SparkSpec {

  import spark.implicits._

  test("bigramCrossEntropy: hand-computed micro-nat pinning") {
    // corpus: "a b a b" + "a b" → c(a,b)=3, c(b,a)=1, starts a=3 b=1, V=2
    // p(b|a) = 4/5, p(a|b) = 2/3
    // micro-nats: ⌊-ln(0.8)·1e6+0.5⌋ = 223144, ⌊ln(1.5)·1e6+0.5⌋ = 405465
    // doc 1: (223144+405465+223144)/3 → 0.283918 ; doc 2: 0.223144
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextOps.bigramCrossEntropy(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 3L, 0.283918), (2L, 1L, 0.223144)))
  }

  test("bigramCrossEntropy: single-token docs drop by contract") {
    val docs = Seq((1L, "solo"), (2L, "x y")).toDF("doc_id", "text")
    val ids = TextOps.bigramCrossEntropy(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L))
  }

  test("poissonBootstrapCi: ordered CI brackets, weights behave") {
    val n = 400
    val ev = (0 until n).map(i => (i.toLong, "t", 10.0 + (i % 5)))
      .toDF("event_id", "event_type", "value")
    val r = EventOps.poissonBootstrapCi(ev, "event_id", "event_type",
      "value", reps = 16, salt = "spec").collect().head
    assert(r.getLong(1) === n.toLong)
    assert(r.getDouble(2) === 12.0) // exact mean of 10..14 uniform cycle
    assert(r.getLong(3) === 16L)
    val (lo, mid, hi) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(lo <= mid && mid <= hi)
    // Poisson(1) replicate means concentrate ~ ±3·σ/√n ≈ ±0.25 here
    assert(lo > 11.0 && hi < 13.0)
    // deterministic: a second run is bit-identical
    val again = EventOps.poissonBootstrapCi(ev, "event_id", "event_type",
      "value", reps = 16, salt = "spec").collect().head
    assert(again === r)
  }

  test("cusumDrift: hand-computed prefix-identity values") {
    // counts 10,10,10,10,20,20 → T=80, N=6
    // dev(N-units): -20×4, +40×2 ; prefix: -20..-80, -40, 0
    // S = prefix − min(0, running-min) = 0,0,0,0,40,80 → stat 0,…,6.67,13.33
    val daily = Seq(
      ("t", "2024-01-01", 10L), ("t", "2024-01-02", 10L),
      ("t", "2024-01-03", 10L), ("t", "2024-01-04", 10L),
      ("t", "2024-01-05", 20L), ("t", "2024-01-06", 20L))
      .toDF("event_type", "day", "n")
    val got = EventOps.cusumDrift(daily, "event_type", "day", "n",
      sigmas = 1.0)
      .orderBy("day")
      .select("cusum_stat", "threshold", "alarm")
      .as[(Double, Double, Boolean)].collect().toSeq
    val thr = 3.651484 // round6(1.0·sqrt(80/6))
    assert(got.map(_._2).forall(_ === thr))
    assert(got.map(_._1) === Seq(0.0, 0.0, 0.0, 0.0, 6.666667, 13.333333))
    assert(got.map(_._3) === Seq(false, false, false, false, true, true))
  }

  test("attributionUShape: 40/20/40 credit, direct, window cutoff") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val ev = Seq(
      // user 1: click, view, click → purchase 10.0 (m=3: 4.0/2.0/4.0)
      (1L, 1L, ts(1), "click", 0.0), (2L, 1L, ts(2), "view", 0.0),
      (3L, 1L, ts(3), "click", 0.0), (4L, 1L, ts(4), "purchase", 10.0),
      // user 2: no touches → (direct) 7.5
      (5L, 2L, ts(10), "purchase", 7.5),
      // user 3: one touch → 100%; plus one OUTSIDE the 7-day window
      (6L, 3L, ts(2), "signup", 0.0), (7L, 3L, ts(20), "purchase", 4.0),
      (8L, 3L, ts(15), "signup", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventOps.attributionUShape(ev, "user_id", "event_id", "ts",
      "event_type", "value", convType = "purchase", windowDays = 7)
      .orderBy("channel")
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("(direct)", 1L, 7.5),
      ("click", 2L, 8.0),
      ("signup", 1L, 4.0),
      ("view", 1L, 2.0)))
  }

  test("gridJoin: brute-force agreement, exact boundary, origin cells") {
    // deterministic scatter straddling the origin, plus exact-boundary
    // and just-outside pairs
    val pts = ((0 until 120).map { i =>
      (i.toLong, ((i * 2654435761L) % 401) - 200, ((i * 40503L) % 401) - 200)
    } ++ Seq((900L, -3L, 0L), (901L, 37L, 0L),   // dist2 = 1600 = d² (in)
             (902L, 100L, 100L), (903L, 100L, 141L))) // dist2 = 1681 (out)
      .toDF("id", "x", "y")
    val got = GridJoin.proximityJoin(pts, "id", "x", "y", maxDist = 40L)
      .select("id_a", "id_b", "dist2")
      .as[(Long, Long, Long)].collect().toSet
    val rows = pts.as[(Long, Long, Long)].collect()
    val brute = (for {
      a <- rows; b <- rows if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= 1600L
    } yield (a._1, b._1, d2)).toSet
    assert(got === brute)
    assert(got.contains((900L, 901L, 1600L)))
    assert(!got.exists(p => p._1 == 902L && p._2 == 903L))
  }
}
