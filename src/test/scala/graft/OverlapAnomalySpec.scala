package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.llm.{EventOps, TextOps}

/** Wave-4 specs: MinHash source-overlap (identity, disjointness, and
  * the MERGEABILITY that licenses the sketch) and trailing-window rate
  * anomaly (planted spike, flat-series null, zero-filled gap day).
  */
class OverlapAnomalySpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("minhash overlap: identical sources estimate 1.0, disjoint 0.0") {
    val text = "a b c d e f g h i j"
    val other = "q r s t u v w x y z"
    val docs = Seq(("s1", text), ("s2", text), ("s3", other))
      .toDF("source", "text")
    val got = TextOps.minhashSourceOverlap(docs, "source", "text", k = 8)
      .orderBy("src_a", "src_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("s1", "s2", 1.0), ("s1", "s3", 0.0), ("s2", "s3", 0.0)))
  }

  test("sketches are mergeable: sketch(A union B) = min-merge of sketches") {
    val docs = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("a", "pack my box with five dozen liquor jugs"),
      ("b", "the quick brown fox likes the lazy dog a lot"),
      ("b", "sphinx of black quartz judge my vow"))
      .toDF("source", "text")
    // ground truth: one sketch over everything under a single label
    val direct = TextOps.minhashSketch(
      docs.withColumn("source", lit("all")), "source", "text", k = 16)
      .orderBy("slot")
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    // merge path: per-source sketches folded by per-slot min — the
    // monoid operation a continuous pipeline would use
    val merged = TextOps.minhashSketch(docs, "source", "text", k = 16)
      .groupBy("slot").agg(min("mh").as("mh"))
      .orderBy("slot")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(direct.toSeq === merged.toSeq)
  }

  test("rate anomaly: planted spike flags, flat series yields null z") {
    // type 'e': 10/day for 8 days then a 100 spike; type 'f': flat 5s
    // (std 0 -> z null); day 5 has NO 'e' events -> zero cell in the
    // scaffold, so the trailing mean sees the gap.
    val rows =
      (0 until 9).filter(_ != 4).flatMap { d =>
        (0 until (if (d == 8) 100 else 10)).map(i =>
          (d.toLong * 1000 + i, ts(f"2024-01-${d + 1}%02d 10:00:00"), "e"))
      } ++
        (0 until 9).flatMap { d =>
          (0 until 5).map(i =>
            (90000L + d * 100 + i, ts(f"2024-01-${d + 1}%02d 11:00:00"), "f"))
        }
    val ev = rows.toDF("event_id", "ts", "event_type")
    val got = EventOps.rateAnomaly(ev, "ts", "event_type", window = 7)
      .filter(col("day") === "2024-01-09")
      .orderBy("event_type")
      .collect()
    val e = got(0); val f = got(1)
    assert(e.getString(1) === "e" && e.getLong(2) === 100L)
    assert(e.getLong(3) === 7L && !e.isNullAt(5) && e.getDouble(5) > 3.0)
    assert(e.getBoolean(6))                       // spike flagged
    assert(f.getString(1) === "f" && f.isNullAt(5) && !f.getBoolean(6))
    // the gap day exists as a zero cell
    val gap = EventOps.rateAnomaly(ev, "ts", "event_type", window = 7)
      .filter(col("day") === "2024-01-05" && col("event_type") === "e")
      .collect()
    assert(gap.length === 1 && gap.head.getLong(2) === 0L)
  }
}
