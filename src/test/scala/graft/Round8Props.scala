package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.llm.EventOps
import graft.operators.{EntityResolution, MerkleDiff}

/** Property-based checks for the round-8 wave-3/4 operators. Few
  * iterations — each case runs Spark jobs.
  */
object Round8Props extends Properties("Round8Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4)

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- fuzzy join: the pigeonhole NEVER misses a single random edit ----

  private val nameGen: Gen[String] = for {
    a <- Gen.oneOf("small", "large", "red", "blue", "hot")
    b <- Gen.oneOf("ring", "bolt", "gear", "widget", "gizmo")
  } yield s"$a $b"

  private val editedGen: Gen[(String, String)] = for {
    s <- nameGen
    kind <- Gen.choose(0, 2)
    pos <- Gen.choose(0, s.length - 1)
    ch <- Gen.alphaLowerChar
  } yield {
    val t = kind match {
      case 0 => s.updated(pos, ch)                        // substitution
      case 1 => s.take(pos) + s.drop(pos + 1)             // deletion
      case _ => s.take(pos) + ch + s.drop(pos)            // insertion
    }
    (s, t)
  }

  property("PassJoin blocking finds every randomly-edited pair") =
    forAll(Gen.listOfN(6, editedGen)) { cases =>
      val master = cases.map(_._1).distinct.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("mid", "mname")
      val probe = cases.map(_._2).distinct.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("pid", "pname")
      val got = EntityResolution
        .editDistance1Join(master, probe, "mid", "mname", "pid", "pname")
        .select("pid", "mid").as[(Long, Long)].collect().toSet
      val want = (for {
        (s, i) <- cases.map(_._1).distinct.zipWithIndex
        (t, j) <- cases.map(_._2).distinct.zipWithIndex
        if levenshtein(s, t) <= 1
      } yield (j.toLong, i.toLong)).toSet
      got == want
    }

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ---- Merkle diff == reference multiset diff on random perturbations --

  private val tableGen: Gen[(Seq[(Long, String)], Seq[(Long, String)])] =
    for {
      n <- Gen.choose(5, 20)
      vals <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
      keep <- Gen.listOfN(n, Gen.frequency(4 -> true, 1 -> false))
      mod <- Gen.listOfN(n, Gen.frequency(4 -> false, 1 -> true))
    } yield {
      val base = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val other = base.zip(keep.zip(mod)).collect {
        case ((id, v), (true, m)) => (id, if (m) v + "!" else v)
      }
      (base, other)
    }

  property("Merkle diff equals the reference multiset diff") =
    forAll(tableGen) { case (base, other) =>
      val digest = MerkleDiff.rowDigest(Seq(col("id"), col("v")))
      val got = MerkleDiff.diff(base.toDF("id", "v"), other.toDF("id", "v"),
        digest, Seq("id"), buckets = 4)
        .select("id", "n_base", "n_other")
        .as[(Long, Long, Long)].collect().toSet
      val bc = base.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val oc = other.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val want = (bc.keySet ++ oc.keySet).flatMap { k =>
        val (nb, no) = (bc.getOrElse(k, 0L), oc.getOrElse(k, 0L))
        if (nb != no) Some((k._1, nb, no)) else None
      }
      got == want
    }

  // ---- association rules: antimonotonicity and direction symmetry ------

  private val basketsGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(4, 10)
    rows <- Gen.listOfN(n * 3,
      Gen.zip(Gen.choose(0L, n.toLong - 1), Gen.oneOf("x", "y", "z", "w")))
  } yield rows

  property("assoc rules: support(a,b) <= min item support; lift symmetric") =
    forAll(basketsGen) { rows =>
      val df = rows.toDF("user_id", "event_type")
      val r = EventOps.assocRules(df, "user_id", "event_type", 0.0)
        .select("antecedent", "consequent", "n_ante", "n_cons", "n_ab",
          "support", "confidence")
        .collect()
      r.forall { row =>
        val (na, nc, nab) = (row.getLong(2), row.getLong(3), row.getLong(4))
        nab <= math.min(na, nc) && row.getDouble(6) <= 1.0 + 1e-9
      } && {
        val byPair = r.map(row => ((row.getString(0), row.getString(1)),
          row.getLong(4))).toMap
        byPair.forall { case ((a, b), nab) => byPair((b, a)) == nab }
      }
    }

  // ---- time-weighted average is bounded by the held values -------------

  private val seriesGen: Gen[Seq[(Long, Int, Double)]] = for {
    n <- Gen.choose(2, 8)
    gaps <- Gen.listOfN(n, Gen.choose(1, 3600))
    vs <- Gen.listOfN(n, Gen.choose(0.0, 500.0))
  } yield {
    val ts = gaps.scanLeft(0)(_ + _).tail
    ts.zip(vs).zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, t, math.floor(v * 100) / 100)
    }
  }

  property("TWA lies within [min, max] of the held (non-final) values") =
    forAll(seriesGen) { rows =>
      val df = rows.map { case (id, t, v) =>
        (id, new java.sql.Timestamp(t * 1000L), 1L, v)
      }.toDF("event_id", "ts", "user_id", "value")
      val out = EventOps
        .timeWeightedAvg(df, "user_id", "ts", "event_id", "value")
        .select("twa").as[Double].collect()
      val held = rows.sortBy(_._2).dropRight(1).map(_._3)
      out.isEmpty || (out.head >= held.min - 1e-6 &&
        out.head <= held.max + 1e-6)
    }
}
