package graft

import graft.llm.Multimodal

/** X348 real s16le PCM decode: hand-packed bytes through the real
  * little-endian reader (two's complement, trailing short frame),
  * and the fixture's planted-silence contract.
  */
class AudioPcmSpec extends SparkSpec {

  import spark.implicits._

  test("hand-packed samples decode with two's complement and framing") {
    // samples: 1, -1, 0, 300, -32768 — s16le bytes packed by hand
    val bytes = Array[Byte](
      0x01, 0x00, // 1
      0xff.toByte, 0xff.toByte, // -1
      0x00, 0x00, // 0
      0x2c, 0x01, // 300
      0x00, 0x80.toByte) // -32768
    val df = Seq((7L, bytes)).toDF("clip_id", "payload")
    val rows = Multimodal.pcmFrameEnergy(spark, df, "clip_id", frameLen = 2)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().sortBy(_._2)
    // frames of 2: [1,-1] ssq 2 peak 1; [0,300] ssq 90000 peak 300;
    // trailing [-32768] ssq 2^30 peak 32768, n_samples 1
    assert(rows === Seq(
      (7L, 0L, 2L, 2L, 1L, false),
      (7L, 1L, 2L, 90000L, 300L, false),
      (7L, 2L, 1L, 1073741824L, 32768L, false)))
  }

  test("all-zero frame is silent; mixed frame is not") {
    val bytes = Array[Byte](0, 0, 0, 0, 0x05, 0, 0, 0)
    val rows = Multimodal.pcmFrameEnergy(spark,
        Seq((1L, bytes)).toDF("clip_id", "payload"), "clip_id",
        frameLen = 2)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().sortBy(_._2)
    assert(rows === Seq((1L, 0L, 2L, 0L, 0L, true),
      (1L, 1L, 2L, 25L, 5L, false)))
  }

  test("fixture plants silence exactly at frames 2 and 5 of id % 5 == 0") {
    val fx = Multimodal.pcmFixture(spark, 6)
    val silent = Multimodal.pcmFrameEnergy(spark, fx, "clip_id")
      .filter("silent")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2)).sorted
    assert(silent.toSeq === Seq((0L, 2L), (0L, 5L), (5L, 2L), (5L, 5L)))
  }

  test("fixture samples match the pinned function through the codec") {
    val fx = Multimodal.pcmFixture(spark, 3)
    val row = Multimodal.pcmFrameEnergy(spark, fx, "clip_id")
      .filter("clip_id = 2 and frame_no = 0")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().head
    var ssq = 0L
    var peak = 0L
    (0 until 256).foreach { t =>
      val v = Multimodal.pcmSample(2L, t).toLong
      ssq += v * v
      peak = math.max(peak, math.abs(v))
    }
    assert(row._3 === 256L && row._4 === ssq && row._5 === peak)
  }
}
