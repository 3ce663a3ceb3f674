package graft

import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Adversarial hot-band artifact for banded MinHash-LSH (the r11
  * verdict's task #6): `nearDupPairs`' candidate self-join is quadratic
  * PER BUCKET, and one planted boilerplate cluster — n near-identical
  * docs sharing every shingle — lands all n members on the same
  * (band, bkey) in every band, yielding ~n²/2 candidates from that one
  * key. This main PLANTS that skew (a hot cluster inside a benign
  * corpus), measures candidate counts and wall-clock with the cap off
  * and on, and checks the detection contract: with the cap on, every
  * hot-cluster member must still verify as a near-dup of the bucket
  * representative (the downstream CC/grouping input is preserved; only
  * the intra-bucket pair LIST is thinned).
  *
  * Prints one JSON line; recorded in BASELINE.md.
  */
object NearDupSkewBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-neardup-skew").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](f: => T): (Double, T) = {
      val s = System.nanoTime()
      val out = f
      ((System.nanoTime() - s) / 1e9, out)
    }

    // benign corpus: 20k docs, 20 distinct words each, 20% in 5-doc
    // near-dup clusters (the NearDupScaleBench generator) — bucket
    // sizes bounded by true similarity. Hot cluster: `hot` docs whose
    // text is IDENTICAL boilerplate (identical shingle sets → same
    // signature → one bucket per band).
    val benign = 20000
    val hot = 2000
    val grp = expr("id div 5")
    val docs = spark.range(benign)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 20).map { w =>
          if (w < 19)
            when(grp % 5 === 0, concat(lit(s"w$w-g"), grp))
              .otherwise(concat(lit(s"w$w-d"), col("id")))
          else concat(lit(s"w$w-d"), col("id"))
        }: _*).as("text"))
      .unionByName(
        spark.range(benign, benign + hot)
          .select(col("id").as("doc_id"),
            lit((0 until 20).map(w => s"boiler$w").mkString(" ")).as("text")))
      .localCheckpoint(true)

    val bands = TextOps.bandRowsForTest(docs, "doc_id", "text")

    val (tUncapped, nUncapped) =
      time(TextOps.bandCandidates(bands).count())
    val (tCapped, nCapped) =
      time(TextOps.bandCandidates(bands, hotBandCap = 64).count())

    // detection contract under the cap: every hot doc near-dups the rep
    val (tPairs, pairs) = time(
      TextOps.nearDupPairs(docs, "doc_id", "text",
          materialize = _.localCheckpoint(true), hotBandCap = 64)
        .localCheckpoint(true))
    val hotFlagged = pairs
      .filter(col("doc_a") >= benign || col("doc_b") >= benign)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .filter(col("d") >= benign).distinct().count()

    val out = Map(
      "metric" -> "\"neardup_skew\"",
      "benign_docs" -> benign,
      "hot_docs" -> hot,
      "candidates_uncapped" -> nUncapped,
      "candidates_capped" -> nCapped,
      "sec_candidates_uncapped" -> f"$tUncapped%.3f",
      "sec_candidates_capped" -> f"$tCapped%.3f",
      "sec_capped_pairs_end_to_end" -> f"$tPairs%.3f",
      "hot_docs_flagged_under_cap" -> hotFlagged)
    println(out.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}"))
    require(hotFlagged == hot,
      s"cap broke detection: $hotFlagged of $hot hot docs flagged")
    spark.stop()
  }
}
