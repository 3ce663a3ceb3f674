package graft

import org.apache.spark.sql.functions._
import graft.llm.VectorOps

/** randomProjection: exact integer outputs on hand-checked vectors, a
  * genuinely mixed ±1 sign matrix, and the zero-shuffle plan claim.
  */
class RandomProjectionSpec extends SparkSpec {

  import spark.implicits._

  private def sign(d: Int, o: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val firstHex = (md.digest(s"$d|$o".getBytes("UTF-8"))(0) >> 4) & 0xf
    if (firstHex % 2 == 0) 1L else -1L
  }

  test("hand-checked projections: zero vector, unit axes, known sums") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f)),   // picks out sign(0, o) * 1000
      (3L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val got = VectorOps
      .randomProjection(df, "vec_id", "embedding", dims = 3, outDims = 2)
      .orderBy("vec_id", "out_dim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val want = for {
      id <- Seq(1L, 2L, 3L); o <- 0 until 2
    } yield {
      val v = Map(1L -> Seq(0L, 0L, 0L), 2L -> Seq(1000L, 0L, 0L),
        3L -> Seq(1000L, 2000L, 3000L))(id)
      (id, o, v.zipWithIndex.map { case (x, d) => x * sign(d, o) }.sum)
    }
    assert(got.toSeq === want)
    assert(got.exists(_._3 != 0L)) // non-vacuous
  }

  test("64x8 sign matrix mixes both signs in every output column") {
    for (o <- 0 until 8) {
      val ss = (0 until 64).map(sign(_, o))
      assert(ss.contains(1L) && ss.contains(-1L),
        s"output $o has a degenerate sign column")
    }
  }

  test("plan is a pure linear scan: no Exchange, no Join") {
    val df = Seq((1L, Seq.fill(64)(0.5f))).toDF("vec_id", "embedding")
    val p = VectorOps
      .randomProjection(df, "vec_id", "embedding", dims = 64, outDims = 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
    assert(!p.contains("Join"), s"projection must not join:\n$p")
  }
}
