package graft

import org.apache.spark.sql.functions._
import graft.operators.SuffixArray

/** Scale/phase artifact for the distributed suffix array (X182) — one
  * JSON line, recorded in BASELINE.md.
  *
  * Two measurements:
  *
  *  1. Phase split at sf0.1 (construction rounds vs SA-order + LCP
  *     descent + filters): names where the wall-clock goes, so the
  *     optimization target is measured, not guessed.
  *
  *  2. Growth: the same corpus at 1× and 2× (union with id-shifted
  *     copy — doubles tokens AND plants cross-copy equal suffixes, the
  *     worst case for prefix-doubling convergence). Linear-ish wall
  *     growth and round count ~log(maxDocLen) are the claims; the
  *     shuffle per round carries one 24-byte row per token, so rows
  *     processed per round = corpus tokens, independent of repeats.
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

    // phase split at 1×
    val (tRanks, tables) = time {
      val t = SuffixArray.rankTables(docs, "doc_id", "text")
      t.last._2.count() // force
      t
    }
    val (tFull, n1) = time {
      SuffixArray.longestRepeats(docs, "doc_id", "text", 40, 5).count()
    }

    // growth at 2× (shifted copy ⇒ every doc gains an exact twin)
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + maxId + 1).as("doc_id"), col("text")))
    val (tFull2, n2) = time {
      SuffixArray.longestRepeats(doubled, "doc_id", "text", 40, 5).count()
    }

    println(
      s"""{"metric":"suffix_scale","rounds":${tables.size},""" +
      s""""rank_tables_sec":${f"$tRanks%.2f"},"full_1x_sec":${f"$tFull%.2f"},""" +
      s""""full_2x_sec":${f"$tFull2%.2f"},""" +
      s""""growth":${f"${tFull2 / tFull}%.2f"},""" +
      s""""rows_1x":$n1,"rows_2x":$n2,"sf":"$sfDir"}""")
    spark.stop()
  }
}
