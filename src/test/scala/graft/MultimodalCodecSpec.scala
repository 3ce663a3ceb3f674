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

  // little-endian u32 at 0-based byte offset
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  test("encodeBmp container layout matches the oracle's byte arithmetic") {
    // The llm_multimodal_near_dup oracle re-derives the DECODED pixel
    // bytes from the container: dataOff at byte 10 (LE), width at 18,
    // height at 22 (positive = bottom-up), 24 bpp at 28, rows padded
    // to 4 bytes. Pin every assumption against the real ImageIO writer.
    Seq(0L, 7L, 123L, -8L).foreach { id =>
      val b = Multimodal.encodeBmp(id)
      val base = if (id < 0) -id - 1 else id
      val (w, h) = Multimodal.bmpDims(base)
      assert(b(0) === 'B'.toByte && b(1) === 'M'.toByte)
      assert(le32(b, 2) === b.length.toLong, "declared file size")
      val dataOff = le32(b, 10).toInt
      assert(le32(b, 18) === w.toLong, "width LE at 18")
      assert(le32(b, 22) === h.toLong, "positive height (bottom-up) at 22")
      assert(((b(28) & 0xff) | ((b(29) & 0xff) << 8)) === 24, "24 bpp")
      val stride = (3 * w + 3) / 4 * 4
      assert(dataOff + stride * h === b.length, "pixel array fills the file")
      // the pixel bytes at the oracle's offsets == the decoded pixels
      // imagePixelPHash walks (bottom-up BGR, padding skipped)
      val px = new Array[Byte](3 * w * h)
      var p = 0
      while (p < 3 * w * h) {
        val pix = p / 3
        px(p) = b(dataOff + (pix / w) * stride + (pix % w) * 3 + p % 3)
        p += 1
      }
      val img = ImageIO.read(new java.io.ByteArrayInputStream(b))
      assert(img != null, "ImageIO decodes its own BMP")
      val fromDecode = new Array[Byte](3 * w * h)
      p = 0
      var row = 0
      while (row < h) {
        val y = h - 1 - row
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          fromDecode(p) = (rgb & 0xff).toByte
          fromDecode(p + 1) = ((rgb >> 8) & 0xff).toByte
          fromDecode(p + 2) = ((rgb >> 16) & 0xff).toByte
          p += 3; x += 1
        }
        row += 1
      }
      assert(px.toSeq === fromDecode.toSeq,
        s"id $id: container pixel bytes != decoded pixel bytes")
    }
  }

  test("imagePixelPHash: variant Hamming-close to base, corrupt blob degrades") {
    val ids = Seq(0L, 10L, 20L, -1L, -11L, -21L) // bases + their variants
    val df = Multimodal.bmpCorpus(spark, ids.toDF("doc_id"), "doc_id")
    val ph = Multimodal.imagePixelPHash(spark, df, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(0L, 10L, 20L).foreach { base =>
      val d = java.lang.Long.bitCount(ph(base) ^ ph(-base - 1))
      assert(d <= 6, s"base $base vs variant: hamming $d")
    }
    // distinct bases should not all collide (the hash discriminates)
    assert(Seq(0L, 10L, 20L).map(ph).distinct.size > 1)
    // corrupt blob: falls back to the byte-level hash, never throws
    val junk = Seq((99L, "definitely not a bitmap".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val got = Multimodal.imagePixelPHash(spark, junk, "doc_id")
      .collect().head.getLong(1)
    assert(got === Multimodal.blockHash64(
      "definitely not a bitmap".getBytes("UTF-8")))
  }
}
