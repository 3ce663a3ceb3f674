package graft

import org.apache.spark.sql.functions._
import graft.llm.{TextOps, VectorOps}

/** URL canonicalization edge cases + per-dimension embedding stats. */
class UrlStatsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(TextOps.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalizeUrl lowercases scheme+host, keeps path case") {
    assert(canon("HTTPS://WWW.Ex.COM/Path/File?Q=V")
      === Seq("https://www.ex.com/Path/File?Q=V"))
  }

  test("canonicalizeUrl strips default ports only for the matching scheme") {
    assert(canon(
      "https://ex.com:443/a", "http://ex.com:80/a",
      "http://ex.com:443/a", "https://ex.com:8443/a")
      === Seq("https://ex.com/a", "http://ex.com/a",
        "http://ex.com:443/a", "https://ex.com:8443/a"))
  }

  test("canonicalizeUrl drops fragments and scrubs utm_ in any position") {
    assert(canon(
      "https://ex.com/a#frag",
      "https://ex.com/a?utm_source=x",
      "https://ex.com/a?utm_source=x#frag",
      "https://ex.com/a?id=1&utm_campaign=y",
      "https://ex.com/a?utm_medium=z&id=1")
      === Seq(
        "https://ex.com/a",
        "https://ex.com/a",
        "https://ex.com/a",
        "https://ex.com/a?id=1",
        "https://ex.com/a?id=1"))
  }

  test("canonicalizeUrl leaves non-tracker params and userinfo-free hosts alone") {
    assert(canon("https://ex.com/a?next=utm_source", "https://ex.com/")
      === Seq("https://ex.com/a?next=utm_source", "https://ex.com/"))
  }

  test("canonicalizeUrl never corrupts a literal '&' in the path (RFC 3986)") {
    // the rejected seam-repair spelling turned the first path '&' into
    // '?'; the positional rules must leave these untouched
    assert(canon(
      "https://ex.com/a&b/c",
      "https://ex.com/a&b/c?utm_source=x",
      "https://ex.com/a&b/c?utm_source=x&id=1")
      === Seq(
        "https://ex.com/a&b/c",
        "https://ex.com/a&b/c",
        "https://ex.com/a&b/c?id=1"))
  }

  test("canonicalizeUrl passes non-absolute inputs through unchanged (no '://' collisions)") {
    // regexp_extract returns '' on no match — the naive spelling mapped
    // every relative path / bare host / malformed crawl URL to a
    // '://'-prefixed remnant, merging DISTINCT inputs under one key
    assert(canon(
      "/relative/path?utm_source=x",
      "example.com/page",
      "not a url at all",
      "ftp//typo.example.com/a")
      === Seq(
        "/relative/path?utm_source=x",
        "example.com/page",
        "not a url at all",
        "ftp//typo.example.com/a"))
    // and therefore urlDedup keeps distinct malformed URLs distinct
    val got = TextOps.urlDedup(
      Seq((1L, "example.com/a"), (2L, "other.org/b")).toDF("id", "url"),
      "id", "url").count()
    assert(got === 2L)
  }

  test("urlDedup keeps the lowest id per canonical key with copy count") {
    val df = Seq(
      (1L, "https://ex.com/a?utm_source=x"),
      (2L, "HTTPS://EX.COM:443/a"),
      (3L, "https://ex.com/b")).toDF("id", "url")
    val got = TextOps.urlDedup(df, "id", "url")
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "https://ex.com/a", 2L),
      (3L, "https://ex.com/b", 1L)))
  }

  test("dimStats computes hand-checked per-dimension moments") {
    val df = Seq(
      Tuple1(Array(1.0f, 2.0f)),
      Tuple1(Array(3.0f, 2.0f)),
      Tuple1(Array(5.0f, 2.0f))).toDF("embedding")
    val rows = VectorOps.dimStats(df, "embedding").orderBy("dim").collect()
    // dim 0: q = 1000,3000,5000 → mean 3000, var E[x²]−E[x]² = 8/3·1e6
    val d0 = rows(0)
    assert(d0.getLong(1) === 3L)
    assert((d0.getLong(2), d0.getLong(3)) === (1000L, 5000L))
    assert(d0.getAs[Double]("mean_q") === 3000.0)
    assert(d0.getAs[Double]("var_q") === math.floor(8.0 / 3.0 * 1e6 * 1e6 + 0.5) / 1e6)
    // dim 1: constant → var exactly 0
    assert(rows(1).getAs[Double]("var_q") === 0.0)
    assert(rows(1).getAs[Double]("mean_q") === 2000.0)
  }

  test("outlierClip flags exactly the hand-computed σ-outliers") {
    // Nine flat rows + one spike per dimension. dim 0: q = 9×0, 1×10000
    // → mean 1000, σ = 3000, 2σ high bound 7000 < 10000 → spike clipped.
    // dim 1: 9×0, 1×50000 → bound 35000 < 50000 → clipped.
    // dim 2: 9×1000, 1×100000 → bound ≈ 70297 < 100000 → clipped.
    val df = Seq(
      Tuple1(Array(0f, 0f, 1f)), Tuple1(Array(0f, 0f, 1f)),
      Tuple1(Array(0f, 0f, 1f)), Tuple1(Array(0f, 0f, 1f)),
      Tuple1(Array(0f, 0f, 1f)), Tuple1(Array(0f, 0f, 1f)),
      Tuple1(Array(0f, 0f, 1f)), Tuple1(Array(0f, 0f, 1f)),
      Tuple1(Array(0f, 0f, 1f)), Tuple1(Array(10f, 50f, 100f)))
      .toDF("embedding")
    val rows = graft.llm.VectorOps.outlierClip(df, "embedding", nSigma = 2.0)
      .orderBy("dim").collect()
    assert(rows(0).getAs[Long]("n_clip_hi") === 1L)
    assert(rows(0).getAs[Long]("n_clip_lo") === 0L)
    assert(rows(1).getAs[Long]("n_clip_hi") === 1L)
    assert(rows(2).getAs[Long]("n_clip_hi") === 1L)
    assert(rows(2).getAs[Long]("n_clip_lo") === 0L)
  }

  test("int8 codec: error bounded by range/510 + 1 µ, constant dims exact") {
    val df = Seq(
      Tuple1(Array(0.0f, 7.0f, -1.0f)),
      Tuple1(Array(1.0f, 7.0f, 0.5f)),
      Tuple1(Array(0.25f, 7.0f, 2.0f)),
      Tuple1(Array(0.75f, 7.0f, -0.25f))).toDF("embedding")
    val rows = VectorOps.int8CodecAudit(df, "embedding")
      .orderBy("dim").collect()
    rows.foreach { r =>
      val range = r.getAs[Long]("max_q") - r.getAs[Long]("min_q")
      val bound = range / 510L + 1L
      assert(r.getAs[Long]("max_err_mu") <= bound,
        s"dim ${r.get(0)}: err ${r.getAs[Long]("max_err_mu")} > bound $bound")
    }
    // dim 1 is constant: round-trip must be exact
    assert(rows(1).getAs[Long]("max_err_mu") === 0L)
    assert(rows(1).getAs[Long]("sum_err_mu") === 0L)
    // endpoints always round-trip exactly (q8 = 0 resp. 255)
    val wide = Seq(Tuple1(Array(-4.0f)), Tuple1(Array(9.0f))).toDF("embedding")
    val w = VectorOps.int8CodecAudit(wide, "embedding").collect().head
    assert(w.getAs[Long]("max_err_mu") === 0L)
  }

  test("outlierClip on a constant dimension clips nothing (σ = 0, strict bounds)") {
    val df = (0 until 20).map(_ => Tuple1(Array(3.5f, 3.5f))).toDF("embedding")
    val rows = graft.llm.VectorOps.outlierClip(df, "embedding").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_clip_lo") === 0L)
      assert(r.getAs[Long]("n_clip_hi") === 0L)
    }
  }

  test("rank normalization: midrank mean is exactly 0.5 and the transform is monotone") {
    val out = graft.queries.LlmSurface.queries("llm_rank_normalize")(
      spark, "/root/testdata/sf0.001")
      .select("q_mq", "rank_pct")
      .as[(Long, Double)].collect().toSeq
    // midrank is sum-preserving: Σ(below + at/2) = n²/2 for ANY
    // distribution, so the mean percentile is 0.5 up to round6 error
    val mean = out.map(_._2).sum / out.size
    assert(math.abs(mean - 0.5) < 1e-5, s"midrank mean was $mean")
    // monotone: a strictly higher score never gets a lower percentile
    val byScore = out.distinct.sortBy(_._1)
    byScore.sliding(2).foreach {
      case Seq((_, p1), (_, p2)) => assert(p1 < p2)
      case _ => ()
    }
  }

  test("trendingTerms: hand-computed lift, newborn terms, and support filter") {
    val df = Seq(
      (0L, "spark spark data"),
      (1L, "spark data data data"),
      (1L, "nova nova nova")).toDF("day", "text")
    val got = TextOps.trendingTerms(df, "day", "text", minCount = 2)
      .orderBy("win", "term")
      .select("win", "term", "n", "n_prev", "lift")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (0L, "spark", 2L, 0L, 3.0),          // newborn in win 0
      (1L, "data", 3L, 1L, 2.0),           // rising: (3+1)/(1+1)
      (1L, "nova", 3L, 0L, 4.0)))          // newborn in win 1
    // "spark" in win 1 has n=1 < minCount → filtered; "data" in win 0
    // has n=1 < minCount → filtered as CURRENT but still visible as
    // win-1 PREV support for the win-1 "data" row above
  }

  test("dimStats group count equals dimensionality, independent of rows") {
    val df = (0 until 37).map(i => Tuple1(Array.fill(5)(i.toFloat / 10)))
      .toDF("embedding")
    assert(VectorOps.dimStats(df, "embedding").count() === 5L)
  }
}
