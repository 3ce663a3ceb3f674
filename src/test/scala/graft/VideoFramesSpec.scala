package graft

import graft.llm.Multimodal

/** X359 video container + per-frame codec: fixture dims through the
  * REAL decoder, frame counts by clip id, truncation stopping the
  * walk without a crash, and a corrupt frame degrading to 0×0 while
  * later frames still decode.
  */
class VideoFramesSpec extends SparkSpec {

  import spark.implicits._

  test("every frame decodes to its pinned fixture dimensions") {
    val fx = Multimodal.videoFixture(spark, 8)
    val rows = Multimodal.videoFrameMeta(spark, fx, "clip_id")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(rows.length === (0 until 8).map(i => 2 + (i % 4)).sum)
    rows.foreach { case (clip, f, _, w, h, _) =>
      val (ew, eh) = Multimodal.fixtureDims(
        Multimodal.videoFrameId(clip, f.toInt))
      assert((w, h) === ((ew.toLong, eh.toLong)),
        s"clip $clip frame $f decoded ${w}x$h, fixture says ${ew}x$eh")
    }
  }

  test("a truncated tail stops the walk; prior frames survive") {
    val full = Multimodal.videoFixture(spark, 1)
      .as[(Long, Array[Byte])].collect().head._2
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 7)
    val rows = Multimodal.videoFrameMeta(spark,
        Seq((9L, cut)).toDF("clip_id", "payload"), "clip_id")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    // clip 0 has 2 frames; cutting the last 7 bytes truncates frame 1
    assert(rows.length === 1 && rows.head._2 === 0L)
  }

  test("a corrupt frame reads 0x0 but the framing walk continues") {
    val full = Multimodal.videoFixture(spark, 1)
      .as[(Long, Array[Byte])].collect().head._2
    val broken = full.clone()
    // zero 16 bytes INSIDE frame 0's image data (past the 4-byte
    // length + 8-byte signature + IHDR), keeping lengths intact
    (40 until 56).foreach(i => broken(i) = 0)
    val rows = Multimodal.videoFrameMeta(spark,
        Seq((5L, broken)).toDF("clip_id", "payload"), "clip_id")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .sortBy(_._2)
    assert(rows.length === 2)
    // frame 1 is untouched and still decodes to its fixture dims —
    // the payload is CLIP 0's container (only the label says 5), so
    // the pinned dims are videoFrameId(0, 1)'s
    val (ew, eh) = Multimodal.fixtureDims(Multimodal.videoFrameId(0L, 1))
    assert((rows(1)._4, rows(1)._5) === ((ew.toLong, eh.toLong)))
  }
}
