package graft

import org.apache.spark.sql.functions._
import graft.operators.SuffixArray

/** Scale/phase artifact for the distributed suffix array (X182) — one
  * JSON line, recorded in BASELINE.md.
  *
  * Measurements (ADVICE r9: phases no longer double-count, and size
  * metrics carry real growth signal):
  *
  *  1. Phase split at sf0.1 on ONE build: construction
  *     (`rank_tables_sec`, forced) vs the post-construction pipeline on
  *     the PREBUILT tables — `pairs_sec` (SA order + adjacency + gate +
  *     LCP descent) and `topk_sec` (left-max filter + top-k) — so each
  *     phase is timed exactly once and their sum is the full cost.
  *
  *  2. Growth: the full pipeline on the same corpus at 1× and 2× (union
  *     with id-shifted copy — doubles tokens AND plants cross-copy equal
  *     suffixes, the worst case for prefix-quadrupling convergence).
  *     Size metrics are corpus tokens and gated candidate-pair counts at
  *     both scales (the capped top-k row count of r9 carried no signal).
  */
object SuffixScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(cpus, "graft-suffix-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (Double, T) = {
      val s = System.nanoTime()
      val out = f
      ((System.nanoTime() - s) / 1e9, out)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = SuffixArray.tokens(docs, "doc_id", "text")
    val nTok1 = toks.count()

    // phase split at 1×, each phase on the previous phase's output
    val (tRanks, tables) = time {
      val t = SuffixArray.rankTables(docs, "doc_id", "text")
      t.last._2.count() // force the last (lazy consumers exist per round)
      t
    }
    val (tPairs, pairs) = time {
      SuffixArray.adjacentLcpFromTables(tables, toks, minTokens = 5)
    }
    val nPairs1 = pairs.count()
    val (tTopk, _) = time {
      SuffixArray.leftMaxTopK(pairs, toks, topK = 40, minTokens = 5).count()
    }
    tables.foreach(t => SuffixArray.freeCheckpoint(t._2))
    SuffixArray.freeCheckpoint(pairs)

    // growth at 2× (shifted copy ⇒ every doc gains an exact twin)
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + maxId + 1).as("doc_id"), col("text")))
    val toks2 = SuffixArray.tokens(doubled, "doc_id", "text")
    val (tFull2, nPairs2) = time {
      val t2 = SuffixArray.rankTables(doubled, "doc_id", "text")
      val p2 = SuffixArray.adjacentLcpFromTables(t2, toks2, minTokens = 5)
      val n = p2.count()
      SuffixArray.leftMaxTopK(p2, toks2, topK = 40, minTokens = 5).count()
      t2.foreach(x => SuffixArray.freeCheckpoint(x._2))
      SuffixArray.freeCheckpoint(p2)
      n
    }
    val tFull1 = tRanks + tPairs + tTopk

    println(
      s"""{"metric":"suffix_scale","rounds":${tables.size},""" +
      s""""rank_tables_sec":${f"$tRanks%.2f"},"pairs_sec":${f"$tPairs%.2f"},""" +
      s""""topk_sec":${f"$tTopk%.2f"},"full_1x_sec":${f"$tFull1%.2f"},""" +
      s""""full_2x_sec":${f"$tFull2%.2f"},""" +
      s""""growth":${f"${tFull2 / tFull1}%.2f"},""" +
      s""""tokens_1x":$nTok1,"tokens_2x":${nTok1 * 2},""" +
      s""""cand_pairs_1x":$nPairs1,"cand_pairs_2x":$nPairs2,"sf":"$sfDir"}""")
    spark.stop()
  }
}
