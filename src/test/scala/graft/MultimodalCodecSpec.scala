package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** The real codec at the multimodal stub boundary: planted PNG/JPEG
  * payloads decoded through the SAME `decodeMeta` path the oracle
  * queries exercise (batched mapPartitions, typed Dataset out, no
  * driver round-trip) — only the decode function differs.
  */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) % 0xffffff)))
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"no $format writer in this JDK")
    bos.toByteArray
  }

  test("imageDecode reads planted PNG and JPEG dimensions through decodeMeta's distributed path") {
    val png = imageBytes(37, 21, "png")
    val jpg = imageBytes(64, 48, "jpg")
    val notAnImage = "just some text bytes".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, jpg), (3L, notAnImage))
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeMeta(spark, df, "doc_id", Multimodal.imageDecode)
      .collect().map(m => m.doc_id -> m).toMap

    assert(got(1L).width === 37 && got(1L).height === 21 && got(1L).frames === 1)
    assert(got(2L).width === 64 && got(2L).height === 48 && got(2L).frames === 1)
    // transport checksums stay payload-derived for images too
    assert(got(1L).byte_len === png.length)
    assert(got(1L).byte_sum === png.map(_ & 0xff).map(_.toLong).sum)
    // non-image payloads fall back to the deterministic stub
    val stub = Multimodal.stubDecode(3L, notAnImage)
    assert(got(3L) === stub)
  }

  test("imageDecode falls back to the stub on a corrupt image payload (magic without body)") {
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 1, 2, 3)
    val got = Multimodal.imageDecode(9L, corrupt)
    assert(got === Multimodal.stubDecode(9L, corrupt))
  }

  test("the downstream resize/frame plumbing is decoder-agnostic") {
    val png = imageBytes(300, 120, "png")
    val df = Seq((5L, png)).toDF("doc_id", "payload")
    val resized = Multimodal.resizeMeta(
      Multimodal.decodeMeta(spark, df, "doc_id", Multimodal.imageDecode), maxDim = 100)
      .collect().head
    assert(resized.width === 100 && resized.height === 40) // 300x120 -> fit 100
    val frames = Multimodal.frameTable(spark,
      Multimodal.decodeMeta(spark, df, "doc_id", Multimodal.imageDecode), stride = 1)
      .collect()
    assert(frames.length === 1) // still image: one frame row
  }

  test("pngFixture blobs are genuine PNGs the real codec decodes to the pinned dims") {
    val n = 24
    val rows = Multimodal.decodeMeta(spark,
      Multimodal.pngFixture(spark, n), "doc_id", Multimodal.imageDecode)
      .collect().map(m => m.doc_id -> m).toMap
    assert(rows.size === n)
    (0L until n).foreach { id =>
      val (w, h) = Multimodal.fixtureDims(id)
      assert(rows(id).width === w && rows(id).height === h,
        s"id $id: got ${rows(id).width}x${rows(id).height}, want ${w}x$h")
    }
    // payloads differ per id (varying pixels -> varying bytes): the
    // k15 oracle's md5 column is a real discriminator, not a constant
    val md5s = Multimodal.pngFixture(spark, n)
      .select(md5(hex(col("payload")))).distinct().count()
    assert(md5s === n.toLong)
    // magic bytes are the PNG signature on every row
    val magics = Multimodal.pngFixture(spark, n)
      .select(hex(expr("substring(payload, 1, 8)"))).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(magics === Seq("89504E470D0A1A0A"))
  }
}
