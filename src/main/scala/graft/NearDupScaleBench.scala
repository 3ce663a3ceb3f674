package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Empirical sub-quadratic-growth artifact for the flagship near-dup
  * paths (the wall-clock companion to the LSH/SimHash unit proofs —
  * timing claims don't belong in unit tests; this main prints one JSON
  * line, recorded in BASELINE.md).
  *
  * Two claims, measured instead of asserted:
  *
  *  1. MinHash-LSH (X3, `nearDupPairs`): band keys are md5 digests of
  *     signature slices — effectively unbounded key space — so
  *     candidates come only from true shingle-set similarity and grow
  *     LINEARLY with corpus size. Measured at 1M and 4M synthetic docs
  *     (20 words each; 20% of docs in 5-doc near-dup clusters sharing
  *     19 of 20 words → expected true pairs = 0.4·n, Jaccard 0.8).
  *
  *  2. SimHash single-chunk blocking (X46, `hammingNearDupPairs` with
  *     60 bits / 4 chunks) keys buckets on 15-bit values: candidates
  *     include ~n²·4/2^15 RANDOM collisions — quadratic with a small
  *     constant, a cliff that starts to bite past ~10⁵ docs. The
  *     combinatorial blocking (`hammingNearDupPairsBlocked`, 3-of-6
  *     subsets → 30-bit keys) pushes random collisions to ~n²·20/2^30,
  *     negligible until billions of docs. Both schemes are lossless
  *     (LlmProps pins equality with brute force); this records the COST
  *     divergence on the same synthetic hash corpora (dup clusters = a
  *     base hash with ≤2 bits flipped per member; uniques = uniform
  *     60-bit hashes — the adversarial case for bucket collisions).
  *     Output pair counts must be EQUAL between schemes on every run —
  *     checked, not assumed.
  */
object NearDupScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-neardup-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (Double, T) = {
      val s = System.nanoTime()
      val out = f
      ((System.nanoTime() - s) / 1e9, out)
    }

    // ---- text corpus for MinHash-LSH --------------------------------------
    // 20 words/doc. Docs whose 5-group index is ≡0 (mod 5) form near-dup
    // clusters: 19 words keyed by the group, 1 tail word keyed by the
    // doc (Jaccard between members = 16/20 shingles = 0.8). All other
    // docs draw every word from a doc-unique key — no cross-doc overlap.
    def textCorpus(n: Long): DataFrame = {
      val grouped = expr("(id DIV 5) % 5 = 0")
      val key = when(grouped, concat(lit("g"), expr("id DIV 5")))
        .otherwise(concat(lit("u"), col("id")))
      spark.range(n).select(
        col("id").as("doc_id"),
        concat_ws(" ", concat(
          transform(sequence(lit(0), lit(18)),
            j => substring(md5(concat(key, lit("_"), j.cast("string"))), 1, 8)),
          array(substring(md5(concat(lit("t"), col("id"))), 1, 8)))).as("text"))
    }

    // ---- hash corpus for the SimHash blocking comparison -------------------
    // Same cluster layout, but straight 60-bit hashes: each cluster
    // member = the group's base hash with ONE member-specific bit
    // flipped (pairwise Hamming 2 — inside the radius), uniques =
    // uniform — maximal random-bucket-collision pressure.
    def hashCorpus(n: Long): DataFrame = {
      val grouped = expr("(id DIV 5) % 5 = 0")
      val key = when(grouped, concat(lit("g"), expr("id DIV 5")))
        .otherwise(concat(lit("u"), col("id")))
      spark.range(n).select(
        col("id").as("doc_id"),
        (conv(substring(md5(key), 1, 15), 16, 10).cast("long")
          .bitwiseXOR(when(grouped,
            expr("shiftleft(CAST(1 AS BIGINT), CAST((id % 5) * 13 % 60 AS INT))"))
            .otherwise(lit(0L)))).as("simhash"))
    }

    def lshRun(n: Long): (Double, Long, Long) = {
      val c = textCorpus(n).localCheckpoint(true)
      val (sec, pairs) = time(TextOps.nearDupPairs(c, "doc_id", "text",
        materialize = _.localCheckpoint(true)).count())
      // threshold=0 keeps every candidate through the (vacuous) verify —
      // the candidate count without a second code path
      val cands = TextOps.nearDupPairs(c, "doc_id", "text", threshold = 0.0,
        materialize = _.localCheckpoint(true)).count()
      c.unpersist()
      (sec, pairs, cands)
    }

    def simhashRun(n: Long, blocked: Boolean): (Double, Long, Long) = {
      val h = hashCorpus(n).localCheckpoint(true)
      val run =
        if (blocked) TextOps.hammingNearDupPairsBlocked(h, "doc_id", "simhash", 3, 6, 60)
        else TextOps.hammingNearDupPairs(h, "doc_id", "simhash", 3, 4, 60)
      val (sec, pairs) = time(run.count())
      // candidate instrumentation: the same bucket join the operator
      // runs, WITHOUT the distinct+verify — the row count whose growth
      // rate is the structural claim (mirrors hammingNearDupPairs[Blocked])
      val chunkBits = if (blocked) 10 else 15
      val subsets =
        if (blocked) (0 until 6).combinations(3).toSeq
        else (0 until 4).map(Seq(_))
      val keyStructs = subsets.zipWithIndex.map { case (ss, si) =>
        val packed = ss.zipWithIndex.map { case (c, pos) =>
          shiftleft(shiftright(col("simhash"), c * chunkBits)
            .bitwiseAND(lit((1L << chunkBits) - 1)), pos * chunkBits)
        }.reduce(_ + _)
        struct(lit(si).as("ki"), packed.as("kv"))
      }
      val keyed = h.select(col("doc_id").as("doc"),
        explode(array(keyStructs: _*)).as("k"))
        .select(col("doc"), col("k.ki").as("ki"), col("k.kv").as("kv"))
      val cands = keyed.select(col("ki"), col("kv"), col("doc").as("doc_a"))
        .join(keyed.select(col("ki"), col("kv"), col("doc").as("doc_b")), Seq("ki", "kv"))
        .filter(col("doc_a") < col("doc_b"))
        .count()
      h.unpersist()
      (sec, pairs, cands)
    }

    val lshNs = Seq(1000000L, 4000000L)
    val lsh = lshNs.map(n => n -> lshRun(n))
    val lshJson = lsh.map { case (n, (sec, pairs, cands)) =>
      f"""{"n":$n,"sec":$sec%.2f,"pairs":$pairs,"candidates":$cands}"""
    }.mkString(""""lsh":[""", ",", "]")

    // both schemes at both scales — the candidate-count divergence IS
    // the artifact (single-chunk ~n²·4/2^15, combinatorial ~true pairs)
    val shNs = Seq(1000000L, 4000000L)
    val single = shNs.map(n => n -> simhashRun(n, blocked = false))
    val blocked = shNs.map(n => n -> simhashRun(n, blocked = true))

    // losslessness cross-check: identical output pairs at every scale
    shNs.foreach { n =>
      val pSingle = single.find(_._1 == n).get._2._2
      val pBlocked = blocked.find(_._1 == n).get._2._2
      require(pSingle == pBlocked,
        s"blocking schemes disagree at n=$n: $pSingle vs $pBlocked")
    }

    def shJson(name: String, rows: Seq[(Long, (Double, Long, Long))]): String =
      rows.map { case (n, (sec, pairs, cands)) =>
        f"""{"n":$n,"sec":$sec%.2f,"pairs":$pairs,"candidates":$cands}"""
      }.mkString(s""""$name":[""", ",", "]")

    val out = Seq(
      lshJson,
      shJson("simhash_single_chunk", single),
      shJson("simhash_blocked", blocked)
    ).mkString("""{"metric":"neardup_scale",""", ",", "}")
    println(out)
    spark.stop()
  }
}
