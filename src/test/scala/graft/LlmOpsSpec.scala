package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.llm.{EventOps, Multimodal, TextOps, VectorOps}

class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles: 3-grams, short-text guard") {
    val df = Seq("a b c d e", "a b").toDF("text")
      .select(TextOps.wordShingles(col("text"), 3).as("sh"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got(0) === Seq("a b c", "b c d", "c d e"))
    assert(got(1) === Seq.empty)
  }

  test("simHashNearDupProbe == full self-join pairs restricted to >=1 probe member") {
    val corpus = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val probe = corpus.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(col("text"), lit(" probed")).as("text"))
    val union = corpus.unionByName(probe)
    val full = TextOps.simHashNearDup(union, "doc_id", "text",
        maxHamming = 3, chunks = 4)
      .filter(col("doc_a") >= 500000L || col("doc_b") >= 500000L)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Int)].collect().toSeq
    val probed = TextOps.simHashNearDupProbe(union, probe, "doc_id", "text",
        maxHamming = 3, chunks = 4)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Int)].collect().toSeq
    assert(probed === full && probed.nonEmpty)
  }

  test("llm_leakage_split: no dup group straddles splits; buckets cover 80/10/10") {
    val rows = graft.queries.LlmSurface.queries("llm_leakage_split")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 500)
    // the leakage guarantee: every member of a group carries the group's
    // split (structural, but pin it against regressions in the bucket
    // derivation)
    val perGroup = rows.groupBy(_.getLong(1)).values
    assert(perGroup.forall(g => g.map(_.getString(3)).toSet.size === 1))
    assert(perGroup.exists(_.length > 1), "corpus must contain dup groups")
    // buckets derive from md5 of the group key and land in [0, 100)
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 100))
    val splits = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(splits.keySet === Set("train", "val", "test"))
    assert(splits("train") > splits("val") && splits("train") > splits("test"))
  }

  test("exactDedup keeps lowest-order copy and counts all copies") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other text"))
      .toDF("doc_id", "text")
    val got = TextOps.exactDedup(df, "text", "doc_id")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (3L, 1L)))
  }

  test("simHash: identical docs hash identically; hamming(x,x)=0") {
    val df = Seq((1L, "spark joins data fast"), (2L, "spark joins data fast"),
      (3L, "completely unrelated words entirely"))
      .toDF("doc_id", "text")
    val h = TextOps.simHash(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(h(1L) === h(2L))
    val dist = Seq((h(1L), h(3L))).toDF("a", "b")
      .select(TextOps.hamming(col("a"), col("b"))).as[Int].head()
    assert(dist > 0)
  }

  test("simHashNearDup: identical docs pair at hamming 0; pigeonhole precondition enforced") {
    val df = Seq(
      (1L, "spark joins data fast with hash tables"),
      (2L, "spark joins data fast with hash tables"),
      (3L, "entirely unrelated vocabulary about citrus orchards blooming"))
      .toDF("doc_id", "text")
    val pairs = TextOps.simHashNearDup(df, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // hamming <= k needs more than k chunks or the pigeonhole breaks
    assertThrows[IllegalArgumentException] {
      TextOps.simHashNearDup(df, "doc_id", "text", maxHamming = 4, chunks = 4)
    }
  }

  test("nearDupPairs: identical docs pair at jaccard 1.0, unrelated docs don't pair") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different content about apples bananas cherries dates eggs"))
      .toDF("doc_id", "text")
    val pairs = TextOps.nearDupPairs(df, "doc_id", "text")
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 1.0)))
    // The library must not leak storage it cannot free: materializing the
    // result leaves NO cached blocks from THIS operator in the caller's
    // session (an earlier revision persisted the signature table
    // internally with no unpersist). Scoped to TextOps creation sites —
    // suites run in parallel in one JVM, so a concurrent suite's
    // in-flight checkpoint (observed: a CC round) must not flake this.
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filter(_.toString.contains("TextOps"))
    assert(leaked.isEmpty, s"nearDupPairs leaked storage: $leaked")
  }

  test("nearDupPairs hotBandCap: hot bucket thins to star pairs, detection and cold buckets intact") {
    // 12 identical boilerplate docs (one hot bucket per band) + one
    // cold near-dup pair + an unrelated doc
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = ((1L to 12L).map(i => (i, boiler)) ++ Seq(
      (21L, "the quick brown fox jumps over the lazy dog today"),
      (22L, "the quick brown fox jumps over the lazy dog today"),
      (30L, "completely different content about apples bananas cherries dates eggs")))
      .toDF("doc_id", "text")
    def pairSet(cap: Int) = TextOps
      .nearDupPairs(df, "doc_id", "text", hotBandCap = cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val capped = pairSet(4)
    // hot cluster: star around the min doc only — 11 pairs, not 66
    assert(capped.filter(_._1 <= 12L) ===
      (2L to 12L).map(b => (1L, b)).toSet)
    // every hot member still detected (the CC/grouping contract)
    assert(capped.flatMap(p => Seq(p._1, p._2)).count(_ <= 12L) === 12)
    // cold buckets are untouched by the cap
    assert(capped.contains((21L, 22L)) && !capped.exists(p =>
      p._1 === 30L || p._2 === 30L))
    // unbounded cap = classical semantics: the full 66-pair clique
    val full = pairSet(Int.MaxValue)
    assert(full.count(_._1 <= 12L) === 66 && full.contains((21L, 22L)))
  }

  test("packSequences: exact offsets across bucket boundaries, hand-computed") {
    // token counts 3,4,2,6,1 -> offsets 0,3,7,9,15; seqLen 5 windows.
    // bucketSize=2 forces three buckets so the two-level scan's
    // cross-bucket bases are exercised, not just the within-bucket path.
    val df = Seq(
      (1L, "a b c"), (2L, "a b c d"), (3L, "a b"),
      (4L, "a b c d e f"), (5L, "a"))
      .toDF("doc_id", "text")
    val got = TextOps.packSequences(df, "doc_id", "text", seqLen = 5, bucketSize = 2)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 0L, 0L, 0L)))
    assert(got(2L) === ((2L, 4L, 3L, 0L, 1L)))
    assert(got(3L) === ((3L, 2L, 7L, 1L, 1L)))
    assert(got(4L) === ((4L, 6L, 9L, 1L, 2L)))
    assert(got(5L) === ((5L, 1L, 15L, 3L, 3L)))
  }

  test("sequenceManifest: full sequences hold exactly seqLen tokens; docs fully covered") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c d"), (3L, "a b"),
      (4L, "a b c d e f"), (5L, "a"))
      .toDF("doc_id", "text")
    val m = TextOps.sequenceManifest(df, "doc_id", "text", seqLen = 5, bucketSize = 2)
      .as[(Long, Long, Long, Long)].collect()
    // 16 tokens / seqLen 5 -> seqs 0..3; all but the last are full
    val bySeq = m.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(bySeq === Map(0L -> 5L, 1L -> 5L, 2L -> 5L, 3L -> 1L))
    // every doc's contributions tile [0, n_tokens) contiguously
    val byDoc = m.groupBy(_._2)
    val tokens = Map(1L -> 3L, 2L -> 4L, 3L -> 2L, 4L -> 6L, 5L -> 1L)
    tokens.foreach { case (doc, n) =>
      val spans = byDoc(doc).sortBy(_._3).map(r => (r._3, r._3 + r._4))
      assert(spans.head._1 === 0L && spans.last._2 === n)
      spans.sliding(2).foreach {
        case Array((_, hi), (lo2, _)) => assert(hi === lo2)
        case _ =>
      }
    }
  }

  test("naiveBayesLangId: separable content classifies correctly; no-trigram doc ties to first lang") {
    val df = Seq(
      (1L, "aaa bbb aaa bab", "xx"),
      (2L, "aab baa aba bba", "xx"),
      (3L, "zzz yyy zzz yzy", "yy"),
      (4L, "zyz yzy zzy zyy", "yy"),
      (5L, "ab", "yy")) // < 3 chars: zero trigrams, all scores equal
      .toDF("doc_id", "text", "lang")
    val got = TextOps.naiveBayesLangId(df, "doc_id", "text", "lang")
      .as[(Long, String, String, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "xx", "xx", true)))
    assert(got(2L) === ((2L, "xx", "xx", true)))
    assert(got(3L) === ((3L, "yy", "yy", true)))
    assert(got(4L) === ((4L, "yy", "yy", true)))
    // deterministic argmax tiebreak: lexicographically smallest language
    assert(got(5L) === ((5L, "yy", "xx", false)))
  }

  test("naiveBayesLangIdHashed: separable content classifies correctly; no-trigram doc ties to first lang") {
    val df = Seq(
      (1L, "aaa bbb aaa bab", "xx"),
      (2L, "aab baa aba bba", "xx"),
      (3L, "zzz yyy zzz yzy", "yy"),
      (4L, "zyz yzy zzy zyy", "yy"),
      (5L, "ab", "yy")) // < 3 chars: zero trigrams, all scores equal
      .toDF("doc_id", "text", "lang")
    val got = TextOps.naiveBayesLangIdHashed(df, "doc_id", "text", "lang")
      .as[(Long, String, String, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "xx", "xx", true)))
    assert(got(2L) === ((2L, "xx", "xx", true)))
    assert(got(3L) === ((3L, "yy", "yy", true)))
    assert(got(4L) === ((4L, "yy", "yy", true)))
    // deterministic argmax tiebreak: lexicographically smallest language
    assert(got(5L) === ((5L, "yy", "xx", false)))
  }

  test("naiveBayesLangIdHashed: colliding trigrams pool their counts deterministically") {
    // 4-bucket feature space: every trigram collides somewhere. The
    // point is the hashed model stays well-defined and deterministic —
    // two identical runs must agree bit-for-bit even under heavy
    // collision, because the bucket is a pure function of the trigram.
    val df = Seq(
      (1L, "aaa bbb aaa bab", "xx"),
      (2L, "zzz yyy zzz yzy", "yy"),
      (3L, "aaa zzz", "xx"))
      .toDF("doc_id", "text", "lang")
    val run = () => TextOps.naiveBayesLangIdHashed(df, "doc_id", "text",
      "lang", buckets = 4)
      .as[(Long, String, String, Boolean)].collect().toSet
    val a = run(); val b = run()
    assert(a === b)
    assert(a.size === 3 && a.forall(r => Set("xx", "yy").contains(r._3)))
  }

  test("naiveBayesLangId: vocabulary past the Heaps'-law envelope raises loudly") {
    val df = Seq(
      (1L, "aaa bbb aaa bab", "xx"),
      (2L, "zzz yyy zzz yzy", "yy"))
      .toDF("doc_id", "text", "lang")
    // the two docs above carry well over 3 distinct trigrams
    val ex = intercept[Exception] {
      TextOps.naiveBayesLangId(df, "doc_id", "text", "lang",
        vocabEnvelope = 3L).collect()
    }
    assert(ex.getMessage.contains("exceeds the model-size envelope"))
    // the default envelope leaves the same corpus green
    assert(TextOps.naiveBayesLangId(df, "doc_id", "text", "lang")
      .count() === 2L)
  }

  test("epochShufflePlan: per-epoch distinct reproducible permutations, shards in range") {
    val df = Seq(1L, 2L, 3L).toDF("doc_id")
    val run = () => TextOps.epochShufflePlan(df, "doc_id", epochs = 2, shards = 4)
      .as[(Int, Int, Long, String)].collect().toSet
    val a = run()
    assert(a.size === 6) // 3 docs x 2 epochs
    assert(a === run(), "plan must be bit-reproducible across invocations")
    assert(a.forall(r => r._2 >= 0 && r._2 < 4))
    // the same doc gets a DIFFERENT key each epoch (epoch in the salt)
    val byDoc = a.groupBy(_._3)
    assert(byDoc.values.forall(_.map(_._4).size == 2))
  }

  test("lengthBucketBatches: bit-length buckets, hand-computed padding, full coverage") {
    // token counts 1,2,3,5 → bit-length buckets 1,2,2,3; batchSize 2 →
    // one batch per bucket (mod 1), so assignment is forced and stats
    // are hand-computable.
    val df = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d e"))
      .toDF("doc_id", "text")
    val got = TextOps.lengthBucketBatches(df, "doc_id", "text", batchSize = 2)
      .as[(Int, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got((1, 0L)) === ((1, 0L, 1L, 1L, 1L, 0.0)))
    // bucket 2: docs of 2 and 3 tokens → pad to 3: (6-5)/6
    assert(got((2, 0L)) === ((2, 0L, 2L, 3L, 5L, 0.166667)))
    assert(got((3, 0L)) === ((3, 0L, 1L, 5L, 5L, 0.0)))
    // hash assignment invariants at batchSize 1: every doc in exactly one
    // batch, batch_idx < ceil(bucket_docs / batchSize)
    val g2 = TextOps.lengthBucketBatches(df, "doc_id", "text", batchSize = 1)
      .as[(Int, Long, Long, Long, Long, Double)].collect()
    assert(g2.map(_._3).sum === 4L)
    assert(g2.forall(r => r._2 >= 0L && r._2 < 2L))
  }

  test("bpePairCounts: frequency-weighted pair counts, deterministic tiebreak") {
    // "ab"×2 + "abc"×1 → ab:3, bc:1; single-char words emit nothing
    val df = Seq((1L, "ab ab abc x"), (2L, "yx xy")).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(df, "text", topK = 10)
      .as[(Int, String, Long)].collect().toSeq
    assert(got.head === ((1, "ab", 3L)))
    // count ties (bc/xy/yx at 1) break on the pair string ascending
    assert(got.tail === Seq((2, "bc", 1L), (3, "xy", 1L), (4, "yx", 1L)))
  }

  test("invertedIndex: postings ordered by doc id, hot words capped to NULL") {
    val df = Seq(
      (3L, "x y w"), (1L, "x x z z w"), (2L, "x"))
      .toDF("doc_id", "text")
    val got = TextOps.invertedIndex(df, "doc_id", "text", maxDf = 2)
      .as[(String, Long, Long, Option[String])].collect().map(r => r._1 -> r).toMap
    assert(got("x") === (("x", 3L, 4L, None))) // df 3 > cap: counts kept, list suppressed
    assert(got("w") === (("w", 2L, 2L, Some("1:1,3:1")))) // ascending doc order
    assert(got("y") === (("y", 1L, 1L, Some("3:1"))))
    assert(got("z") === (("z", 1L, 2L, Some("1:2"))))
  }

  test("sourceKlDrift: hand-computed KL; identical-to-corpus source scores zero") {
    // A = "a a b", B = "a b b": corpus a:3 b:3 (N=6), n_s=3 each.
    // KL(A) = (1/3)(2·ln(2·6/(3·3)) + 1·ln(1·6/(3·3)))
    //       = (2·287682 − 405465)/3e6 µnat = 169899/3e6 = 0.056633
    val df = Seq(("A", "a a b"), ("B", "a b b")).toDF("source", "text")
    val got = TextOps.sourceKlDrift(df, "source", "text")
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("A") === (("A", 3L, 2L, 169899L, 0.056633)))
    assert(got("B") === (("B", 3L, 2L, 169899L, 0.056633)))
    // a source distributed exactly like the corpus has zero drift
    val uni = Seq(("X", "a b"), ("Y", "a b")).toDF("source", "text")
    val g2 = TextOps.sourceKlDrift(uni, "source", "text")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(g2.forall(r => r._4 === 0L && r._5 === 0.0))
  }

  test("importanceWeights: target-like docs score positive, target-unlike negative") {
    // Target docs speak "alpha", raw-only docs speak "omega": the bucket
    // log-ratio model must up-weight alpha-heavy docs and down-weight
    // omega-heavy ones regardless of which hash buckets the words land in.
    // Counts must dominate the +numBuckets Laplace mass or the smoothed
    // target model is flatter than raw and even target words score
    // negative (correct DSIR math, wrong test) — hence 10s of tokens.
    def rep(w: String, n: Int) = Seq.fill(n)(w).mkString(" ")
    val df = Seq(
      (1L, rep("alpha", 50), true),
      (2L, rep("alpha", 30), true),
      (3L, rep("omega", 50), false),
      (4L, rep("alpha", 10) + " " + rep("omega", 10), false)) // mixed
      .toDF("doc_id", "text", "is_t")
    val got = TextOps.importanceWeights(df, "doc_id", "text", col("is_t"), 64, "tst")
      .as[(Long, Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._3 > 0 && got(1L)._5)
    assert(got(2L)._3 > 0)
    assert(got(3L)._3 < 0 && !got(3L)._5)
    assert(got(1L)._2 === 50L && got(4L)._2 === 20L)
    // per-token average sits between the pure docs for the mixed one
    assert(got(4L)._4 > got(3L)._4 && got(4L)._4 < got(1L)._4)
  }

  test("lineDedup: cross-doc lines dropped, within-doc repeats kept, order preserved") {
    val df = Seq(
      (1L, "banner ad\nunique alpha\nbanner ad\nunique beta"), // banner also in doc 2
      (2L, "banner ad\nunique gamma"),
      (3L, "solo line\nsolo line"))                            // repeated but ONLY in doc 3
      .toDF("doc_id", "text")
    val got = TextOps.lineDedup(df, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // both banner positions in doc 1 drop; survivors keep original order
    assert(got(1L) === ((1L, 4L, 2L, "unique alpha\nunique beta")))
    assert(got(2L) === ((2L, 2L, 1L, "unique gamma")))
    // within-doc repetition is NOT cross-doc duplication (1 distinct doc)
    assert(got(3L) === ((3L, 2L, 0L, "solo line\nsolo line")))
  }

  test("lineDedup: a doc that is entirely boilerplate reassembles to empty text") {
    val df = Seq((1L, "x\ny"), (2L, "x\ny"), (3L, "x")).toDF("doc_id", "text")
    val got = TextOps.lineDedup(df, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 2L, 2L, "")))
    assert(got(3L) === ((3L, 1L, 1L, "")))
  }

  test("sequenceManifest: zero-token docs emit no manifest rows, coverage of the rest intact") {
    // A null text yields n_tokens = null (ANSI size(null)) and
    // last_seq < first_seq semantics — without the explode guard Spark's
    // sequence() would generate a DESCENDING range and emit bogus
    // negative-length rows. The guarded form drops the doc, matching
    // the oracle's empty generate_series.
    val df = Seq((1L, "a b c"), (2L, null: String), (3L, "d e f g"))
      .toDF("doc_id", "text")
    val m = TextOps.sequenceManifest(df, "doc_id", "text", seqLen = 4, bucketSize = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(!m.exists(_._2 == 2L), "zero-token doc must emit no rows")
    assert(m.forall(_._4 > 0), "no non-positive n_toks rows")
    // 3 + 4 tokens -> seq 0 holds 4, seq 1 holds 3
    val bySeq = m.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(bySeq === Map(0L -> 4L, 1L -> 3L))
  }

  test("packSequences: bucketing stays exact for ids beyond 2^53 (integer div, not double)") {
    // Doubles cannot represent odd longs >= 2^53; the bucket key must be
    // computed with integer division so borderline ids keep exact,
    // monotone bucket assignment. Offsets here are hand-computable:
    // token counts 2,3,1 in id order.
    val base = 9007199254740992L // 2^53
    val df = Seq((base, "a b"), (base + 1L, "a b c"), (base + 3L, "a"))
      .toDF("doc_id", "text")
    val got = TextOps.packSequences(df, "doc_id", "text", seqLen = 4, bucketSize = 2)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(base) === ((base, 2L, 0L, 0L, 0L)))
    assert(got(base + 1L) === ((base + 1L, 3L, 2L, 0L, 1L)))
    assert(got(base + 3L) === ((base + 3L, 1L, 5L, 1L, 1L)))
  }

  test("wordEntropy: hand-computed values; single-word doc is zero") {
    val df = Seq(
      (1L, "a a b b"),          // uniform over 2 words -> ln 2
      (2L, "a b c d"),          // uniform over 4 words -> ln 4
      (3L, "hello"))            // one token -> 0
      .toDF("doc_id", "text")
    val got = TextOps.wordEntropy(df, "doc_id", "text")
      .select("doc", "n_tokens", "n_distinct", "entropy")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 4L, 2L, 0.693147)))
    assert(got(2L) === ((2L, 4L, 4L, 1.386294)))
    assert(got(3L) === ((3L, 1L, 1L, 0.0)))
  }

  test("pqTopK degenerates to exact L2 top-k when ksub >= corpus size") {
    // Every vector becomes (or shares) its own sub-centroid, so the ADC
    // distance is the exact squared distance — the PQ analogue of the
    // IVF all-lists-degenerates-to-exact property. vecs 0..2 share the
    // (0,0) second-half slice, exercising empty-cluster dropout too.
    val vecs = Seq(
      (0L, Array(0L, 0L, 0L, 0L)),
      (1L, Array(10L, 0L, 0L, 0L)),
      (2L, Array(0L, 10L, 0L, 0L)),
      (3L, Array(5L, 5L, 5L, 5L)),
      (4L, Array(9L, 9L, 9L, 9L)),
      (5L, Array(1L, 2L, 3L, 4L)))
    val df = vecs.toDF("vec_id", "qv")
    val cb = VectorOps.pqCodebooks(df, "vec_id", "qv", m = 2, subDim = 2,
      ksub = 6, iters = 2)
    val codes = VectorOps.pqEncode(df, "vec_id", "qv", cb, m = 2, subDim = 2)
    assert(codes.count() === 12) // m codes per vector
    assert(codes.agg(max("code")).as[Long].head() < 6)
    val qs = df.filter(col("vec_id") < 2)
    val got = VectorOps.pqTopK(codes, qs, cb, "vec_id", "qv", k = 3, m = 2,
      subDim = 2)
      .as[(Long, Int, Long, Long)].collect().toSet
    val expect = (for ((qid, q) <- vecs if qid < 2) yield {
      vecs.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(3)
        .zipWithIndex.map { case ((id, d), i) => (qid, i + 1, id, d) }
    }).flatten.toSet
    assert(got === expect)
  }

  test("refineTopK over a full shortlist equals brute-force exact L2 top-k") {
    // Refining an ALL-candidates shortlist must reproduce exact search
    // bit-for-bit — the property that makes the two-stage result trust-
    // worthy whenever the true neighbor survives the shortlist cut.
    val vecs = Seq(
      (0L, Array(0L, 0L, 0L, 0L)),
      (1L, Array(10L, 0L, 0L, 0L)),
      (2L, Array(0L, 10L, 0L, 0L)),
      (3L, Array(5L, 5L, 5L, 5L)),
      (4L, Array(9L, 9L, 9L, 9L)),
      (5L, Array(1L, 2L, 3L, 4L)))
    val df = vecs.toDF("vec_id", "qv")
    val qs = df.filter(col("vec_id") < 2)
    val full = qs.select(col("vec_id").as("query_id"))
      .crossJoin(df.select(col("vec_id")))
      .filter(col("query_id") =!= col("vec_id"))
    val got = VectorOps.refineTopK(full, df, qs, "vec_id", "qv", k = 3)
      .as[(Long, Int, Long, Long)].collect().toSet
    val expect = (for ((qid, q) <- vecs if qid < 2) yield {
      vecs.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(3)
        .zipWithIndex.map { case ((id, d), i) => (qid, i + 1, id, d) }
    }).flatten.toSet
    assert(got === expect)
  }

  test("ivfPqTopK degenerates to exact L2 top-k when all lists probed and ksub >= n") {
    // With every residual its own sub-centroid, ADC measures
    // (q - c) - (x - c) = q - x exactly; probing every list removes the
    // IVF pruning — so the full index must reproduce brute-force L2.
    val vecs = Seq(
      (0L, Array(0L, 0L, 0L, 0L)),
      (1L, Array(10L, 0L, 0L, 0L)),
      (2L, Array(0L, 10L, 0L, 0L)),
      (3L, Array(5L, 5L, 5L, 5L)),
      (4L, Array(9L, 9L, 9L, 9L)),
      (5L, Array(1L, 2L, 3L, 4L)))
    val df = vecs.toDF("vec_id", "qv")
    val coarse = VectorOps.kMeansCentroids(df, "vec_id", "qv", k = 2, iters = 2)
    val resid = df
      .join(VectorOps.assignToCentroids(df, "vec_id", "qv", coarse), "vec_id")
      .join(coarse.select(col("cid").as("centroid_id"), col("cv")), "centroid_id")
      .select(col("vec_id"), col("centroid_id"),
        zip_with(col("qv"), col("cv"), (a, b) => a - b).as("rv"))
    val cb = VectorOps.pqCodebooks(resid, "vec_id", "rv", m = 2, subDim = 2,
      ksub = 6, iters = 2)
    val codes = VectorOps.pqEncode(resid, "vec_id", "rv", cb, m = 2, subDim = 2)
      .join(resid.select("vec_id", "centroid_id"), "vec_id")
    val qs = df.filter(col("vec_id") < 2)
    val got = VectorOps.ivfPqTopK(codes, qs, coarse, cb, "vec_id", "qv",
      k = 3, nProbe = 2, m = 2, subDim = 2)
      .as[(Long, Int, Long, Long)].collect().toSet
    val expect = (for ((qid, q) <- vecs if qid < 2) yield {
      vecs.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(3)
        .zipWithIndex.map { case ((id, d), i) => (qid, i + 1, id, d) }
    }).flatten.toSet
    assert(got === expect)
  }

  test("hashedFeatures: bucket counts conserve tokens and are partition-invariant") {
    val df = Seq((1L, "a b c d e f"), (2L, "a a a")).toDF("doc_id", "text")
    val f = TextOps.hashedFeatures(df, "doc_id", "text", 16, "feat")
    val perDoc = f.groupBy("doc").agg(sum("c").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(perDoc === Map(1L -> 6L, 2L -> 3L))
    assert(f.agg(max("b"), min("b")).as[(Int, Int)].head()._1 < 16)
    val f8 = TextOps.hashedFeatures(df.repartition(8), "doc_id", "text", 16, "feat")
    assert(f.collect().toSet === f8.collect().toSet)
  }

  test("linearScore: integer logit, hand-computed score and label") {
    val feats = Seq((1L, 0, 2L), (1L, 1, 1L), (2L, 1, 4L)).toDF("doc", "b", "c")
    val weights = Seq((0, 5), (1, -3)).toDF("b", "wt")
    val got = TextOps.linearScore(feats, weights)
      .as[(Long, Long, Double, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 0.002333, "keep"))) // st = 2*5 - 3 = 7
    assert(got(2L) === ((2L, 4L, -0.003, "drop")))   // st = -12
  }

  test("setSimJoin: equals brute-force exact Jaccard; prefix filter prunes candidates") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different content about apples bananas cherries dates eggs"),
      (4L, "another entirely distinct document concerning galaxies nebulae quasars pulsars"),
      (5L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val perDoc = TextOps.setSimPerDoc(df, "doc_id", "text", 3, 0.5)
    // prefix filter must do real pruning: fewer candidates than all pairs
    val n = perDoc.count()
    assert(TextOps.setSimCandidates(perDoc).count() < n * (n - 1) / 2)
    // exactness: identical output to the all-pairs join over the same sets
    val a = perDoc.select(col("doc").as("doc_a"), col("ss").as("sa"), col("c").as("ca"))
    val b = perDoc.select(col("doc").as("doc_b"), col("ss").as("sb"), col("c").as("cb"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        TextOps.round6(col("inter") / (col("ca") + col("cb") - col("inter"))))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val got = TextOps.setSimJoin(df, "doc_id", "text")
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got === brute)
    assert(got.exists(p => p._1 == 1L && p._2 == 5L && p._3 == 1.0)) // identical pair
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L))
  }

  test("containmentJoin: asymmetric (quote⊂page found, reverse not); equals brute force; exact boundary") {
    // doc 1 is a strict prefix of doc 2: every 3-shingle of 1 appears in
    // 2 (containment 1.0) but 2 has many shingles outside 1 (reverse
    // containment far below 0.8). Jaccard for the pair is 5/12 — below
    // any symmetric near-dup bar, which is the point of the measure.
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"),
      (3L, "totally unrelated words about ships and harbors and tides"))
      .toDF("doc_id", "text")
    val got = TextOps.containmentJoin(df, "doc_id", "text")
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 2L, 1.0))) // forward only; doc 3 pairs with nothing
    // brute-force agreement at the same integer threshold
    val all = Seq(
      (1L, "p q r s t u"), (2L, "p q r s t u v w"), (3L, "p q r s x y"),
      (4L, "a b c d e f"))
      .toDF("doc_id", "text")
    val sh = all.select(col("doc_id"),
        explode(TextOps.wordShingles(col("text"), 3)).as("s")).distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val brute = sh.as("a").join(sh.as("b"), $"a.s" === $"b.s" &&
        $"a.doc_id" =!= $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("c").as("ca")), "doc_a")
      .filter(col("inter") * 1000000L >= col("ca") * 800000L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val got2 = TextOps.containmentJoin(all, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got2 === brute)
    // doc 3 ("p q r s x y", 4 shingles, 2 shared with doc 1/2) is at
    // containment 0.5 — proves sub-threshold pairs are dropped even
    // though the prefix filter surfaced them as candidates
    assert(!got2.exists(p => p._1 == 3L))
  }

  test("prototypicality: hand-checked centroid distances; bottom decile pruned, outlier kept") {
    // label 0: three identical vectors + one outlier. Sums (3000,1000),
    // n=4, floored centroid (750,250). dist2 near = 250²+250² = 125000;
    // outlier = 750²+750² = 1125000. percentile(·,0.1) over
    // [125000,125000,125000,1125000] interpolates at rank 0.3 → 125000,
    // so the three redundant copies are pruned (ties AT the threshold
    // prune) and the informative outlier survives — the Sorscher
    // big-data-regime policy.
    val df = Seq(
      (1L, 0, Seq(1000L, 0L)), (2L, 0, Seq(1000L, 0L)),
      (3L, 0, Seq(1000L, 0L)), (4L, 0, Seq(0L, 1000L)))
      .toDF("vec_id", "label", "qv")
    val got = VectorOps.prototypicality(df, "vec_id", "qv", "label", 0.1)
      .select("vec_id", "dist2", "prune")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(125000L, 125000L, 125000L, 1125000L))
    assert(got.map(_._3).toSeq === Seq(1, 1, 1, 0))
  }

  test("pmiPhrases: hand-checked counts and scores; threshold flag exact; guard") {
    // corpus "a b a b" + "a b c": N=7, c(a)=3, c(b)=3, c(c)=1;
    // bigrams: "a b"x3, "b a"x1, "b c"x1. With delta=0, theta=2:
    // score(a,b) = 3*7/9 = 2.333333 -> phrase; score(b,a) = 7/9 = 0.777778
    // -> not; score(b,c) = 7/3 = 2.333333 -> phrase.
    val df = Seq("a b a b", "a b c").toDF("text")
    val got = TextOps.pmiPhrases(df, "text", discount = 0L, minCount = 1L,
        thresholdMicro = 2000000L)
      .select("w1", "w2", "c_ab", "c_a", "c_b", "n_tokens", "score", "phrase")
      .as[(String, String, Long, Long, Long, Long, Double, Int)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got(("a", "b")) === (("a", "b", 3L, 3L, 3L, 7L, 2.333333, 1)))
    assert(got(("b", "a")) === (("b", "a", 1L, 3L, 3L, 7L, 0.777778, 0)))
    assert(got(("b", "c")) === (("b", "c", 1L, 3L, 1L, 7L, 2.333333, 1)))
    assert(got.size === 3)
    // a minCount at or below the discount would emit score <= 0 rows
    intercept[IllegalArgumentException] {
      TextOps.pmiPhrases(df, "text", discount = 5L, minCount = 5L)
    }
  }

  test("nearDupPairs materialize hook is applied and caller-controlled") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    var hookCalls = 0
    val out = TextOps.nearDupPairs(df, "doc_id", "text",
      materialize = d => { hookCalls += 1; d.persist() })
    assert(out.count() === 1)
    assert(hookCalls === 1)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty) // caller owns it...
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty) // ...and can free it
  }

  test("quantize + dotQ: exact integer dot product") {
    val df = Seq((Array(1.0f, 2.0f, -0.5f), Array(0.5f, -1.0f, 2.0f))).toDF("a", "b")
    val got = df.select(
      VectorOps.dotQ(VectorOps.quantize(col("a")), VectorOps.quantize(col("b"))))
      .as[Long].head()
    // floor: (1000,2000,-500) . (500,-1000,2000) = 500000 - 2000000 - 1000000
    assert(got === -2500000L)
  }

  test("cosineNearDup: corpus-scaled bits keep candidate growth sub-quadratic") {
    // Deterministic pseudo-random 16-dim vectors; candidate count = pairs
    // surviving the bucket equi-join with the dot threshold disabled.
    def corpus(n: Int) = {
      val rnd = new scala.util.Random(42)
      (0 until n).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding"),
          VectorOps.quantize(col("embedding")).as("qv"))
    }
    def candidates(n: Int): Long =
      VectorOps.cosineNearDup(corpus(n), "vec_id", "qv", "embedding",
        bits = VectorOps.bitsForCorpus(n), minDotQ = Long.MinValue).count()
    val c200 = candidates(200)
    val c800 = candidates(800)
    // Fixed bits would scale candidates by (800/200)^2 = 16x; growing
    // bits with the corpus (bitsForCorpus: 10 -> 12 here) must hold the
    // growth well under that — ~4x expected, 8x allowed for variance.
    assert(c200 > 0)
    assert(c800 < 8 * c200, s"candidates grew quadratically: $c200 -> $c800")
  }

  test("cosineNearDup multi-probe recovers Hamming-1 neighbors, no pair dups") {
    val rnd = new scala.util.Random(7)
    val emb = (0 until 300).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        VectorOps.quantize(col("embedding")).as("qv"))
    val exact = VectorOps.cosineNearDup(emb, "vec_id", "qv", "embedding",
      bits = 10, minDotQ = Long.MinValue, multiProbe = false)
    val probed = VectorOps.cosineNearDup(emb, "vec_id", "qv", "embedding",
      bits = 10, minDotQ = Long.MinValue)
    assert(probed.count() > exact.count()) // neighbor buckets add recall
    // each qualifying pair matches on exactly one probe -> no duplicates
    assert(probed.count() === probed.select("id_a", "id_b").distinct().count())
  }

  test("scrubPii redacts URLs, then emails, then long digit runs") {
    val df = Seq(
      "mail ab.c%x@foo.io or https://a@b.test/x?p=123456789 card 4111111111111111 ok")
      .toDF("t")
    val got = df.select(TextOps.scrubPii(col("t"))).as[String].head()
    // the URL pass also swallows its embedded @ and digits; short digit
    // runs (<8) survive
    assert(got === "mail <EMAIL> or <URL> card <NUM> ok")
  }

  test("scrubPii URL match stops at any whitespace, not only spaces") {
    // a URL followed by tab/newline must not swallow the following text
    val df = Seq("see https://x.test/a\tnext line\nhttps://y.test ok").toDF("t")
    val got = df.select(TextOps.scrubPii(col("t"))).as[String].head()
    assert(got === "see <URL>\tnext line\n<URL> ok")
  }

  test("chunkWords: overlapping windows, short tail, short-doc single chunk") {
    // 10 words, chunkSize 4, overlap 1 -> step 3 -> ceil(9/3)=3 chunks:
    // [w1..w4], [w4..w7], [w7..w10]
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = TextOps.chunkWords(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .select("doc_id", "chunk_idx", "n_words")
      .as[(Long, Int, Int)].collect().toSet
    assert(got === Set((1L, 0, 4), (1L, 1, 4), (1L, 2, 4), (2L, 0, 2)))
    // overlap: last word of chunk 0 is first word of chunk 1
    val shas = TextOps.chunkWords(df, "doc_id", "text", 4, 1)
      .filter(col("doc_id") === 1L).select("chunk_sha").as[String].collect()
    assert(shas.distinct.length === 3, "distinct content per chunk")
  }

  test("centroidSums: element-wise per-group sums in position order") {
    val df = Seq(
      ("a", Array(1L, 2L, 3L)),
      ("a", Array(10L, 20L, 30L)),
      ("b", Array(5L, 5L, 5L)))
      .toDF("g", "qv")
    val got = VectorOps.centroidSums(df, "g", "qv")
      .as[(String, Long, Seq[Long])].collect()
      .map { case (g, n, v) => g -> ((n, v)) }.toMap
    assert(got("a") === ((2L, Seq(11L, 22L, 33L))))
    assert(got("b") === ((1L, Seq(5L, 5L, 5L))))
  }

  test("centroidSums fails loudly on ragged vector lengths within a group") {
    val ragged = Seq(("a", Array(1L, 2L, 3L)), ("a", Array(4L, 5L)))
      .toDF("g", "qv")
    val e = intercept[Exception] {
      VectorOps.centroidSums(ragged, "g", "qv").collect()
    }
    // wrapped in SparkException layers; the raise_error message survives
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(_.contains("ragged vectors")))
  }

  test("nfc_normalize composes decomposed sequences; composed text unchanged") {
    val decomposed = "cafe\u0301 NIN\u0303O"
    val composed = "caf\u00e9 NI\u00d1O"
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "t")
    val got = df.select(col("id"),
        call_function("nfc_normalize", col("t")).as("n"),
        (call_function("nfc_normalize", col("t")) =!= col("t")).as("changed"))
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((composed, true))) // composition happened
    assert(got(2L) === ((composed, false)))
    assert(got(3L) === (("plain ascii", false)))
    // null passes through
    val n = Seq(Tuple1(null: String)).toDF("t")
      .select(call_function("nfc_normalize", col("t"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("kMeans: k >= n degenerates to self-assignment at distance 0") {
    val vecs = (0L until 5L).map(i => (i, Array(i * 10, i * 10 + 1)))
      .toDF("vec_id", "qv")
    val got = VectorOps.kMeans(vecs, "vec_id", "qv", k = 8, iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === (0L until 5L).map(i => (i, i, 0L)).toSet)
  }

  test("kMeans separates two blobs; invariant to input partitioning") {
    // even ids cluster near +100, odd ids near -100; init (ids 0, 1)
    // lands one centroid in each blob
    val vecs = (0L until 40L).map { i =>
      val c = if (i % 2 == 0) 100L else -100L
      (i, Array(c + i % 7, c - i % 5, c))
    }.toDF("vec_id", "qv")
    val got = VectorOps.kMeans(vecs, "vec_id", "qv", k = 2, iters = 3)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert((0L until 40L).forall(i => got(i) === i % 2),
      s"blob membership must follow parity: $got")
    val reparted = VectorOps.kMeans(vecs.repartition(11), "vec_id", "qv", k = 2, iters = 3)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(reparted === got)
  }

  test("substringDupStats flags cross-doc spans, not in-doc repeats or unique text") {
    // docs 1 and 2 differ overall (no whole-doc dup) but share one
    // planted 6-word run -> with k=4 that is 3 shared windows each;
    // doc 3 repeats ITS OWN phrase (must not count: cross-doc only);
    // doc 4 is unique; doc 5 is too short for any window.
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"unique lead in text $shared and a distinct tail"),
      (2L, s"completely different opener here $shared closing words differ"),
      (3L, "again again again again again again again again"),
      (4L, "nothing here repeats anywhere else in this corpus at all"),
      (5L, "too short"))
      .toDF("doc_id", "text")
    val got = TextOps.substringDupStats(df, "doc_id", "text", spanTokens = 4)
      .select("doc_id", "n_spans", "n_dup_spans", "max_span_docs")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L)._2 === 3L && got(1L)._3 === 2L, s"doc1: ${got(1L)}")
    assert(got(2L)._2 === 3L && got(2L)._3 === 2L, s"doc2: ${got(2L)}")
    // doc 3: 5 windows, all the same text "again again again again", but
    // only ONE document contains it -> zero cross-doc dup spans
    assert(got(3L) === ((5L, 0L, 0L)), s"doc3: ${got(3L)}")
    assert(got(4L)._2 === 0L)
    assert(got(5L) === ((0L, 0L, 0L)), s"doc5: ${got(5L)}")
  }

  test("maximalDupSpans merges consecutive flagged windows into one span") {
    // docs 1 and 2 share a 6-word run -> k=4 flags 3 consecutive windows
    // -> ONE maximal span of 3 + (4-1) = 6 tokens; doc 1's copy starts at
    // word 5, doc 2's at word 6. Doc 3 shares nothing.
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"unique lead in text $shared and a distinct tail"),
      (2L, s"completely different opener words here $shared closing differs"),
      (3L, "nothing here repeats anywhere else in this corpus at all"))
      .toDF("doc_id", "text")
    val got = TextOps.maximalDupSpans(df, "doc_id", "text", spanTokens = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 5L, 6L), (2L, 6L, 6L)), s"got $got")
    // two separated shared runs stay two spans (the gap breaks the island)
    val two = Seq(
      (10L, s"$shared filler one two three four five six $shared"),
      (11L, s"$shared other padding words go here now then $shared"))
      .toDF("doc_id", "text")
    val runs = TextOps.maximalDupSpans(two, "doc_id", "text", spanTokens = 4)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(runs(10L).length === 2 && runs(11L).length === 2,
      s"separated runs must not merge: $runs")
  }

  test("kMeans packs dense cids: ids >= 2^20 cluster correctly") {
    // raw input ids must never be packed into the argmin key — any
    // corpus whose smallest k ids exceed the cid width would silently
    // corrupt both the distance compare and the recovered centroid_id.
    // Same two-blob shape as above, ids shifted far past the cid range.
    val base = 5000000L
    val vecs = (0L until 40L).map { i =>
      val c = if (i % 2 == 0) 100L else -100L
      (base + i, Array(c + i % 7, c - i % 5, c))
    }.toDF("vec_id", "qv")
    val got = VectorOps.kMeans(vecs, "vec_id", "qv", k = 2, iters = 3)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(0L, 1L), s"cids must be dense 0..k-1: $got")
    assert((0L until 40L).forall(i => got(base + i) === i % 2),
      s"blob membership must follow parity regardless of id magnitude: $got")
  }

  test("kForCorpus bounds expected cluster size as the corpus grows") {
    // mirror of the bitsForCorpus sub-quadratic property: with k from
    // kForCorpus, n/k (expected cluster size) stays <= target until the
    // MaxK cap, so SemDeDup in-cluster pairing grows ~linearly, not n².
    val target = 64
    for (n <- Seq(1L, 50L, 500L, 5000L, 500000L, 50000000L, 5000000000L)) {
      val k = VectorOps.kForCorpus(n, target)
      assert(k >= 1 && k <= VectorOps.MaxK)
      if (k < VectorOps.MaxK)
        assert(math.ceil(n.toDouble / k) <= target,
          s"n=$n k=$k leaves clusters of ${n.toDouble / k}")
    }
    // monotone: a bigger corpus never gets fewer clusters
    val ks = Seq(100L, 10000L, 1000000L, 100000000L).map(VectorOps.kForCorpus(_, target))
    assert(ks === ks.sorted)
    // degenerate edges
    assert(VectorOps.kForCorpus(0L) === 1)
    assert(VectorOps.kForCorpus(Long.MaxValue) === VectorOps.MaxK)
  }

  test("signBucket packs sign bits of leading components") {
    val df = Seq(Array(0.1f, -0.2f, 0.3f, 0.0f)).toDF("v")
    val got = df.select(VectorOps.signBucket(col("v"), 4)).as[Long].head()
    // signs: + - + (+ for 0.0) -> bits 0,2,3 -> 1 + 4 + 8
    assert(got === 13L)
  }

  test("blockHash64: identical bytes hash equal; local edits stay near; short payloads defined") {
    val base = Array.tabulate(256)(i => ((i * 7) % 251).toByte)
    val same = base.clone()
    val edited = base.clone()
    edited(10) = (edited(10) + 120).toByte // perturb one window hard
    val h = Multimodal.blockHash64(base)
    assert(h === Multimodal.blockHash64(same))
    val d = java.lang.Long.bitCount(h ^ Multimodal.blockHash64(edited))
    assert(d <= 6, s"single-window edit must stay within the near-dup radius, got $d")
    // < 64 bytes: tail windows are empty -> defined (0 bits), no crash
    val short = Multimodal.blockHash64(Array[Byte](1, 2, 3))
    assert(java.lang.Long.bitCount(short) <= 3)
    assert(Multimodal.blockHash64(Array.emptyByteArray) === 0L)
  }

  test("cmpProd compares 128-bit cross products exactly (no Long overflow)") {
    import java.math.BigInteger
    def ref(a: Long, b: Long, c: Long, d: Long): Int =
      BigInteger.valueOf(a).multiply(BigInteger.valueOf(b))
        .compareTo(BigInteger.valueOf(c).multiply(BigInteger.valueOf(d)))
    // the exact regime the naive wsum*n compare gets wrong: ~2 GB
    // payloads where wsum*n overflows Long
    val twoGiB = 2147483648L
    val cases = Seq(
      (255L * twoGiB / 64, twoGiB, 255L * twoGiB, twoGiB / 64),
      (255L * twoGiB / 64 + 1, twoGiB, 255L * twoGiB, twoGiB / 64),
      (255L * twoGiB / 64 - 1, twoGiB, 255L * twoGiB, twoGiB / 64),
      (0L, twoGiB, 1L, 1L), (0L, 0L, 0L, 5L),
      (Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MaxValue - 1))
    for ((a, b, c, d) <- cases)
      assert(Integer.signum(Multimodal.cmpProd(a, b, c, d)) === Integer.signum(ref(a, b, c, d)),
        s"cmpProd($a,$b,$c,$d)")
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val Seq(a, b, c, d) = Seq.fill(4)(rnd.nextLong() & Long.MaxValue)
      assert(Integer.signum(Multimodal.cmpProd(a, b, c, d)) === Integer.signum(ref(a, b, c, d)),
        s"cmpProd($a,$b,$c,$d)")
    }
  }

  test("perceptual-hash near-dup finds identical payloads via the generic Hamming join") {
    val df = Seq(
      (1L, "the same exact payload content for both documents here"),
      (2L, "the same exact payload content for both documents here"),
      (3L, "completely different bytes that should land far away entirely"))
      .toDF("doc_id", "text")
    val hashed = Multimodal.decodePHash(spark, Multimodal.withPayload(df, "text"), "doc_id")
    val pairs = TextOps.hammingNearDupPairs(hashed, "doc_id", "phash",
      maxHamming = 6, chunks = 8, bits = 64)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("stubDecode: deterministic metadata from payload bytes") {
    val m = Multimodal.stubDecode(7L, "ab".getBytes("UTF-8"))
    assert(m === Multimodal.MediaMeta(7L, 2, 195L, 64 + 195 % 577,
      64 + (195 * 31) % 937, 1 + 2 % 7))
  }

  test("decodeMeta runs the batched executor-side decode") {
    val df = Multimodal.withPayload(Seq((1L, "hello"), (2L, "ab")).toDF("doc_id", "text"), "text")
    val got = Multimodal.decodeMeta(spark, df, "doc_id").collect().map(m => m.doc_id -> m).toMap
    assert(got(2L).byte_sum === 195L)
    assert(got(1L).byte_len === 5)
  }

  test("tokenBudgetSelect keeps best-quality buckets up to the budget") {
    // quality buckets: 0.9 (300 tokens), 0.5 (300), 0.1 (300); budget =
    // 50% of 900 = 450 -> only the 0.9 bucket fits (300 <= 450, and
    // 300 + 300 = 600 > 450)
    val df = Seq(
      (1L, 0.9, 100), (2L, 0.9, 200),
      (3L, 0.5, 300),
      (4L, 0.1, 150), (5L, 0.1, 150))
      .toDF("doc_id", "quality", "est_tokens")
    val got = TextOps.tokenBudgetSelect(df, "quality", "est_tokens", 0.5)
      .select("doc_id", "selected").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> false, 4L -> false, 5L -> false))
    // full budget selects everything
    val all = TextOps.tokenBudgetSelect(df, "quality", "est_tokens", 1.0)
      .select("selected").as[Boolean].collect()
    assert(all.forall(identity))
    // empty corpus: no rows, no NPE from the null total
    val empty = Seq.empty[(Long, Double, Int)].toDF("doc_id", "quality", "est_tokens")
    assert(TextOps.tokenBudgetSelect(empty, "quality", "est_tokens", 0.5).count() === 0)
    // null quality: the row is RETAINED with selected = false, and its
    // tokens don't count toward the budget (an inner join used to drop
    // it silently)
    val withNull = Seq(
      (1L, Some(0.9), 100), (2L, None, 1000000), (3L, Some(0.5), 100))
      .toDF("doc_id", "quality", "est_tokens")
    val sel = TextOps.tokenBudgetSelect(withNull, "quality", "est_tokens", 0.5)
      .select("doc_id", "selected").as[(Long, Boolean)].collect().toMap
    assert(sel === Map(1L -> true, 2L -> false, 3L -> false),
      s"null-quality row must survive unselected without inflating the budget: $sel")
  }

  test("topNgramFraction: repeated bigram dominates; short docs absent") {
    val df = Seq(
      (1L, "a b a b a b"), // bigrams: ab,ba,ab,ba,ab -> max 3 of 5
      (2L, "w1 w2 w3 w4 w5"), // all distinct -> 1 of 4
      (3L, "solo"))           // < 2 words -> no output row
      .toDF("doc_id", "text")
    val got = TextOps.topNgramFraction(df, "doc_id", "text", 2)
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 0.6, 2L -> 0.25))
  }

  test("nearDupAgainstBase finds batch-vs-base pairs, never base-vs-base") {
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val base = Seq(
      (1L, common),
      (2L, common + " extra"),
      (3L, "completely different words about spark catalyst optimizer rules"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, common), // near/exact dup of base 1 and 2
      (11L, "unrelated fresh content that matches nothing in the base set"))
      .toDF("doc_id", "text")
    val pairs = TextOps.nearDupAgainstBase(batch, base, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 1L)))
    assert(pairs.forall { case (a, b) => a >= 10L && b < 10L },
      "doc_a must come from the batch side, doc_b from the base side")
    assert(!pairs.exists(_._1 == 11L))
  }

  test("incrementalDedup flags exact and near dups, keeps fresh docs") {
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val base = Seq((1L, common), (2L, "some other base document with words"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, common),                  // exact dup of base 1
      (11L, common + " trailing"),    // near dup of base 1
      (12L, "entirely new material never seen before anywhere at all"))
      .toDF("doc_id", "text")
    val got = TextOps.incrementalDedup(batch, base, "doc_id", "text")
      .select("doc_id", "exact_dup", "n_near", "keep")
      .as[(Long, Boolean, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L)._1 === true)
    assert(got(10L)._3 === false)
    assert(got(11L)._1 === false)
    assert(got(11L)._2 >= 1L)
    assert(got(11L)._3 === false)
    assert(got(12L) === ((false, 0L, true)))
  }

  test("nearDupPairs degenerate corpora: empty, single doc, all-short docs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.nearDupPairs(empty, "doc_id", "text").count() === 0)
    val single = Seq((1L, "one single document here with several words")).toDF("doc_id", "text")
    assert(TextOps.nearDupPairs(single, "doc_id", "text").count() === 0)
    val short = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    // fewer words than the shingle width -> no shingles -> no pairs
    assert(TextOps.nearDupPairs(short, "doc_id", "text").count() === 0)
  }

  test("writeCsvPartitioned writes one file per partition with headers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pcsv-").toString + "/out"
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(4)
    graft.sinks.Sinks.writeCsvPartitioned(df, dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length === 4)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 100)
    assert(back.columns.toSeq === Seq("id", "v"))
  }

  test("stubResize scales proportionally; frame sampling is deterministic") {
    val m = Multimodal.MediaMeta(1L, 100, 50L, 640, 480, 7)
    val r = Multimodal.stubResize(m, 320)
    assert(r.width === 320 && r.height === 240)
    assert(Multimodal.stubResize(r, 640) === r) // no upscale
    assert(Multimodal.sampleFrameIndices(7, 3) === Seq(0, 3, 6))
    val df = Multimodal.explodeFrames(spark,
      Seq(m).toDS(), stride = 3)
    assert(df.as[(Long, Int)].collect().toSet === Set((1L, 0), (1L, 3), (1L, 6)))
  }

  test("sessionize splits on >30min gaps with exact boundaries") {
    def ts(min: Int, sec: Int = 0): Timestamp =
      Timestamp.valueOf(f"2024-01-01 10:${min}%02d:${sec}%02d")
    val ev = Seq(
      (1L, ts(0), 100L, 1.0), // session 1
      (2L, ts(10), 100L, 2.0), // +10min -> same
      (3L, ts(40), 100L, 3.0), // +30:00 exactly -> NOT a new session (strict >)
      (4L, ts(40, 1) /* +30:01 from #3? no: gap from #3 */, 100L, 4.0),
      (5L, ts(59), 200L, 5.0)) // other user
      .toDF("event_id", "ts", "user_id", "value")
    val got = EventOps.sessionize(ev, 30)
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    // user 100: events at 0,10,40,40:01 -> gaps 10min, 30min (not >30), 1s
    assert(got === Set((100L, 1L, 4L), (200L, 1L, 1L)))
  }

  test("funnel: steps must occur in order, strictly after the previous step") {
    def t(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      // user 1: full conversion in order
      (1L, t(0), 1L, "view", 0.0), (2L, t(5), 1L, "click", 0.0), (3L, t(9), 1L, "purchase", 0.0),
      // user 2: click BEFORE the first view -> does not count; no later click
      (4L, t(2), 2L, "click", 0.0), (5L, t(3), 2L, "view", 0.0),
      // user 3: purchase before click -> reached only step 2
      (6L, t(0), 3L, "view", 0.0), (7L, t(1), 3L, "purchase", 0.0), (8L, t(4), 3L, "click", 0.0),
      // user 4: never views -> absent from output
      (9L, t(0), 4L, "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .select("user_id", "reached").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 2))
  }

  test("tumbling windows align to the hour") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:59:59"), 1L, "a", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "a", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.tumbling(ev, "1 hour")
      .select("win_start", "n").as[(String, Long)].collect().toSet
    assert(got === Set(("2024-01-01 10:00:00", 1L), ("2024-01-01 11:00:00", 1L)))
  }

  test("trainLinearClassifier separates a linearly-separable corpus") {
    val docs = Seq(
      ("good stuff here", 1), ("good clean prose", 1), ("clean good text", 1),
      ("spam junk noise", 0), ("junk spam words", 0), ("noise junk spam", 0))
      .zipWithIndex.map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "y")
    val got = TextOps.trainLinearClassifier(docs, "doc_id", "text",
        col("y") === 1, numBuckets = 256, salt = "t", rounds = 8,
        lrDiv = 1L, clipMilli = 500L, topW = 4)
      .collect().map(r => (r.getString(0), Option(r.get(1)),
        r.getString(2), r.getLong(3))).toSeq
    val confusion = got.filter(_._1 == "confusion")
      .map(r => r._3 -> r._4).toMap
    // disjoint vocabularies: the trained model must classify its own
    // training set perfectly (keep ⟺ y=1)
    assert(confusion === Map("keep|1" -> 3L, "drop|0" -> 3L))
    // the loss curve must be non-increasing
    val curve = got.filter(_._1 == "round").map(_._4)
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a })
  }

  test("bpeTrain: hand-computed merges incl. the shared-boundary greedy case") {
    val docs = Seq(("s1", "aaaa aaaa ab"), ("s2", "aaaa"))
      .toDF("source", "text")
    val got = TextOps.bpeTrain(docs, "source", "text", merges = 3)
      .as[(String, Option[Long], String, Long)].collect().toSeq
    // round 1: pair (a,a) has weight 3·3=9 (> (a,b)=1) → merge; the
    // state " a  a  a  a " must become " aa  aa " (left-to-right
    // non-overlapping replace = greedy BPE), NOT " aa  a  a "-style
    // shared-boundary misses. round 2: (aa,aa)=3. round 3: (a,b)=1.
    // encode: s1 = aaaa + aaaa + ab = 3 tokens, s2 = aaaa = 1.
    assert(got === Seq(
      ("encode", None, "s1", 3L),
      ("encode", None, "s2", 1L),
      ("merge", Some(1L), "a a", 9L),
      ("merge", Some(2L), "aa aa", 3L),
      ("merge", Some(3L), "a b", 1L)))
  }

  test("cvFoldsLm: single-bucket complement identity (xent exactly 0) " +
    "and fold partition") {
    // with buckets=1 every token lands in bucket 0, so the complement
    // model's smoothed probability is (T-n_f+1)/(T-n_f+1) = 1 and the
    // held-out cross-entropy must be EXACTLY zero in integer micro-nats
    // — a closed-form pin of the complement-trick arithmetic
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "documents")
      .select(col("doc_id"), col("text"), col("doc_id").as("group_rep"))
    val got = TextOps.cvFoldsLm(docs, "doc_id", "text", "group_rep",
      k = 5, buckets = 1, foldSalt = "cvf")
    val xent = got.filter(col("sym") === "xent_micro")
      .select("n").as[Long].collect().toSeq
    assert(xent.length === 5 && xent.forall(_ == 0L), s"got $xent")
    val nDocs = got.filter(col("sym") === "n_docs")
      .select("n").as[Long].collect().sum
    assert(nDocs === docs.count())
    val v = got.filter(col("sym") === "var_micro2").select("n").as[Long].head()
    assert(v === 0L)
  }

  test("scalingLawFit: held-out xent falls monotonically with training " +
    "size and the log-log slope is negative") {
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    val got = TextOps.scalingLawFit(docs, "doc_id", "text", buckets = 256,
      lvlSalt = "lvl", hoSalt = "ho")
    val xent = got.filter(col("part") === "size" && col("sym") === "xent_micro")
      .orderBy("k").select("n").as[Long].collect().toSeq
    assert(xent.length === 4)
    assert(xent === xent.sorted.reverse && xent.distinct.length === 4,
      s"xent must strictly fall with more data: $xent")
    val toksBySize = got
      .filter(col("part") === "size" && col("sym") === "train_tokens")
      .orderBy("k").select("n").as[Long].collect().toSeq
    assert(toksBySize === toksBySize.sorted && toksBySize.last > 0,
      s"nested subsets must grow: $toksBySize")
    val slope = got.filter(col("sym") === "slope_micro")
      .select("n").as[Long].head()
    assert(slope < 0L, s"scaling-law slope must be negative, got $slope")
  }

  test("calibrateScores: separable scores calibrate toward the labels " +
    "(ECE drops, slope grows, loss falls)") {
    val scored = ((0 until 50).map(i => (i.toLong, 500L, 1L)) ++
      (50 until 100).map(i => (i.toLong, -500L, 0L))).toDF("doc", "z", "y")
    val got = TextOps.calibrateScores(scored, rounds = 8, lrDivA = 5L,
      lrDivB = 250L, clipA = 100000L, clipB = 2000L)
    val ece = got.filter(col("part") === "ece")
      .select("sym", "n").as[(String, Long)].collect().toMap
    assert(ece("after") < ece("before"),
      s"calibration must reduce ECE: $ece")
    val a = got.filter(col("part") === "param" && col("sym") === "a")
      .select("n").as[Long].head()
    assert(a > 1000000L, s"slope should grow on separable data, got $a")
    val curve = got.filter(col("part") === "round").orderBy("k")
      .select("n").as[Long].collect()
    assert(curve.head > curve.last, s"loss must fall: ${curve.toSeq}")
  }

  test("ipfRaking: converges to uniform joint marginals on an unbalanced " +
    "2x2 table") {
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      ("A", "x", txt(30)), ("A", "y", txt(10)),
      ("B", "x", txt(10)), ("B", "y", txt(30))
    ).toDF("source", "lang", "text")
    val got = TextOps.ipfRaking(docs, "source", "lang", "text", rounds = 5)
    val cells = got.filter(col("part") === "cell").count()
    assert(cells === 4)
    // total 80 tokens, 2 sources, 2 langs -> every marginal targets
    // 40e6 micro-tokens; IPF on this symmetric table converges fast
    val marg = got.filter(col("part") =!= "cell")
      .select("weighted_micro").as[Long].collect()
    assert(marg.length === 4)
    marg.foreach(m => assert(math.abs(m - 40000000L) < 400000L,
      s"marginal $m not within 1% of 40e6"))
    // deterministic: a rerun is bit-identical
    val again = TextOps.ipfRaking(docs, "source", "lang", "text", rounds = 5)
    assert(got.collect().toSeq === again.collect().toSeq)
  }

  test("phraseSearch: overlap, repeated-word phrases, no lone-word false " +
    "positives") {
    val docs = Seq(
      (1L, "x table hash y table hash"),   // plain bigram, twice
      (2L, "table table table"),           // overlapping repeat-word hits
      (3L, "table value table"),           // lone words — must NOT match
      (4L, "filter value small value z"),  // repeated word at idx 1 and 3
      (5L, "filter value small x value")   // broken at idx 3 — no match
    ).toDF("doc_id", "text")
    val got = TextOps.phraseSearch(docs, "doc_id", "text",
        Seq("table hash", "table table", "filter value small value"))
      .orderBy("phrase", "doc")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("filter value small value", 4L, 1L, 0L),
      ("table hash", 1L, 2L, 1L),
      ("table table", 2L, 2L, 0L)))
  }
}
