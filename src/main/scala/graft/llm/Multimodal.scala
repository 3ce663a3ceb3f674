package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, decoded executor-side in batches.
  *
  * The decode itself is a STUB — no image/audio codecs ship in this
  * container — but everything AROUND it is the real distributed shape:
  * binary payload column, per-partition batched iteration (the Scala
  * analogue of `mapInPandas` with arrow batch size 64), a typed
  * `Dataset[MediaMeta]` result, and no data through the driver. Swapping
  * [[stubDecode]] for a real JPEG/opus decoder changes nothing upstream
  * or downstream.
  *
  * Scale: decode is embarrassingly parallel (narrow, per-partition);
  * partition sizing is controlled by the upstream scan
  * (`spark.sql.files.maxPartitionBytes`), and metadata-only downstream
  * queries never re-read payload bytes thanks to parquet column pruning.
  */
object Multimodal extends Serializable {

  /** Typed decode result: payload size plus fake "decoded" dimensions. */
  case class MediaMeta(
      doc_id: Long,
      byte_len: Int,
      byte_sum: Long,
      width: Int,
      height: Int,
      frames: Int)

  /** STUB decoder — deterministic fake standing in for the real codec
    * (??? boundary). Derives metadata purely from the payload bytes so
    * tests and the DuckDB oracle can verify the distributed plumbing
    * end-to-end: byte_sum is the unsigned byte total, dimensions are
    * fixed modular functions of it.
    */
  def stubDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    MediaMeta(
      doc_id = docId,
      byte_len = bytes.length,
      byte_sum = sum,
      width = 64 + (sum % 577).toInt,
      height = 64 + ((sum * 31) % 937).toInt,
      frames = 1 + (bytes.length % 7))
  }

  /** REAL still-image decode at the documented stub boundary: PNG and
    * JPEG through `javax.imageio` — the one codec stack this container
    * ships (it is part of the JDK). Payloads that don't carry a
    * PNG/JPEG magic number (or fail to decode) fall back to
    * [[stubDecode]], so a mixed corpus keeps flowing instead of dying
    * on the first non-image blob; still images report `frames = 1`.
    * `byte_len`/`byte_sum` stay payload-derived in both branches —
    * they're transport checksums, not pixel data.
    *
    * The legacy oracle rows (llm_multimodal_meta/frames) keep
    * [[stubDecode]] — DuckDB can replay byte arithmetic but not a
    * codec. Since r12, `k15_image_decode` oracle-checks THIS decoder
    * too: the [[pngFixture]] blobs go through the real codec on the
    * Spark side while the oracle re-derives width/height from the PNG
    * container's IHDR bytes, so the hash match proves a genuine decode
    * ran (MultimodalCodecSpec additionally pins the fixture dims).
    */
  def imageDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val isPng = bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte
    val isJpeg = bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff
    if (!isPng && !isJpeg) stubDecode(docId, bytes)
    else {
      // a truncated/corrupt blob must degrade to the stub, not kill the
      // job: ImageIO throws IIOException on bad streams (and returns
      // null when no reader volunteers) — both are data problems, not
      // code problems, at corpus scale
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) stubDecode(docId, bytes)
      else {
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        MediaMeta(docId, bytes.length, sum, img.getWidth, img.getHeight, frames = 1)
      }
    }
  }

  /** Attach an opaque binary payload (here: the UTF-8 bytes of a text
    * column, standing in for image bytes; a real ingest would read the
    * blobs from object storage).
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** Deterministic REAL-PNG fixture corpus: `n` rows of
    * (doc_id, payload) where payload is a genuine PNG (encoded
    * executor-side through `javax.imageio`) whose dimensions are pinned
    * functions of doc_id — width = 8 + id % 29, height = 8 + (id·7) % 31
    * — and whose pixels vary per id (so payload hashes differ). This is
    * the fixture k15_image_decode runs the REAL codec against: the
    * DuckDB oracle re-derives width/height from the PNG container's
    * IHDR bytes while Spark decodes the pixels, so a codec/container
    * disagreement (or a stub masquerading as a decode) hash-mismatches.
    * Generation is distributed (mapPartitions over a range — no blob
    * ever passes through the driver).
    */
  def pngFixture(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions(_.map(id => (id, encodePng(id))))
      .toDF("doc_id", "payload")
  }

  /** Pinned fixture dimensions — shared by the generator, the decode
    * spec, and anything that wants to assert against the real codec. */
  def fixtureDims(id: Long): (Int, Int) =
    (8 + (id % 29).toInt, 8 + ((id * 7) % 31).toInt)

  private def encodePng(id: Long): Array[Byte] = {
    val (w, h) = fixtureDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = x * 31L + y * 17L + id * 101L
        img.setRGB(x, y,
          (((v % 256) << 16) | (((v * 7) % 256) << 8) | ((v * 13) % 256))
            .toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Corpus-shaped REAL-PNG payload column (r12 verdict #3 — the
    * convergence of the legacy multimodal family onto the real codec):
    * one genuine PNG per document id, dimensions pinned by
    * [[fixtureDims]], pixels keyed by the id. The blobs are written to
    * parquet by the caller so the DuckDB oracle reads the SAME bytes
    * (container-parsed truth) that Spark pushes through javax.imageio.
    * Generation is a distributed narrow map; no blob passes the driver.
    */
  def pngCorpus(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, encodePng(id))))
      .toDF(idCol, "payload")
  }

  /** Corpus-shaped REAL-VIDEO payload column: one length-prefixed
    * PNG-frame container per document id (the [[videoFixture]] encoder
    * over corpus ids — 2 + id % 4 frames, per-(id, frame) pinned
    * dimensions). */
  def videoCorpus(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, encodeVideo(id))))
      .toDF(idCol, "payload")
  }

  /** Pinned dimensions for the pixel-phash BMP corpus — small (≤12×14)
    * so the oracle's per-pixel hex walk stays cheap at verify scale. */
  def bmpDims(id: Long): (Int, Int) =
    (8 + (id % 5).toInt, 8 + ((id * 3) % 7).toInt)

  /** Corpus-shaped REAL-BMP payload column for the pixel-level
    * perceptual-hash path: BMP because it is the one ImageIO codec
    * whose PIXELS are byte-addressable in the container (24bpp BGR
    * rows, bottom-up, 4-byte-padded), so the DuckDB oracle can
    * re-derive the exact pixel bytes the REAL decode produced — the
    * k15 IHDR trick extended from dimensions to the full pixel array.
    * A NEGATIVE id encodes a planted near-copy of base −id−1: the same
    * image with one mid bit of pixel (0,0)'s blue channel flipped —
    * Hamming-close in any block-mean hash, byte-distinct on disk.
    */
  def bmpCorpus(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, encodeBmp(id))))
      .toDF(idCol, "payload")
  }

  private[graft] def encodeBmp(outId: Long): Array[Byte] = {
    val base = if (outId < 0) -outId - 1 else outId
    val (w, h) = bmpDims(base)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = x * 37L + y * 19L + base * 131L
        img.setRGB(x, y,
          (((v % 256) << 16) | (((v * 5) % 256) << 8) | ((v * 11) % 256))
            .toInt)
        x += 1
      }
      y += 1
    }
    if (outId < 0) {
      // flip one mid bit of one channel: a ±8 perturbation never wraps
      // a window sum far enough to flip more than a bit or two
      val rgb = img.getRGB(0, 0)
      img.setRGB(0, 0, (rgb & 0xffff00) | ((rgb & 0xff) ^ 0x08))
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.toByteArray
  }

  /** REAL decode → pixel-level block-mean perceptual hash: javax.imageio
    * decodes the payload, the pixel bytes are laid out in BMP storage
    * order (bottom-up rows, B-G-R, padding excluded), and [[blockHash64]]
    * runs over THAT array — so the hash is a function of decoded pixels,
    * not container bytes, and the DuckDB oracle reproduces it from the
    * container's pixel array (offset/stride arithmetic over the hex).
    * A payload that fails to decode degrades to the byte-level hash
    * ([[blockHash64]] over the raw payload) — the stub boundary is now
    * ONLY the corrupt-blob path. Embarrassingly parallel narrow map.
    */
  def imagePixelPHash(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // in-memory ImageInputStream cache: the default FILE cache
        // creates+deletes a temp file per decode (same fix as
        // videoFrameMeta; decoded pixels identical)
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(64).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val img =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
            if (img == null) (id, blockHash64(bytes))
            else {
              val w = img.getWidth
              val h = img.getHeight
              val px = new Array[Byte](3 * w * h)
              var p = 0
              var row = 0
              while (row < h) {
                val y = h - 1 - row // bottom-up: BMP storage order
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  px(p) = (rgb & 0xff).toByte // B
                  px(p + 1) = ((rgb >> 8) & 0xff).toByte // G
                  px(p + 2) = ((rgb >> 16) & 0xff).toByte // R
                  p += 3
                  x += 1
                }
                row += 1
              }
              (id, blockHash64(px))
            }
          }
        }
      }
      .toDF(idCol, "phash")
  }

  /** Decode every payload to typed metadata, executor-side, in batches of
    * 64 (mirrors an arrow-batched `mapInPandas` UDF's shape). `decode`
    * picks the codec: [[stubDecode]] (default — oracle-replayable) or
    * [[imageDecode]] (real PNG/JPEG); the distributed shape is the same.
    */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String,
      decode: (Long, Array[Byte]) => MediaMeta = stubDecode): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // in-memory ImageInputStream cache for the real-codec decode
        // path (no-op for the stub) — see videoFrameMeta
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(64).flatMap { batch =>
          batch.iterator.map { case (id, bytes) => decode(id, bytes) }
        }
      }
  }

  /** Block-mean perceptual hash over the raw payload bytes (the
    * Blockhash/block-mean-value scheme, Yang et al. 2006, applied to the
    * byte stream): split the payload into 64 equal windows; bit b = 1
    * iff window b's mean byte value ≥ the global mean. Compared by
    * cross-multiplication (`wsum · n ≥ total · wlen`) so the whole hash
    * is exact integer math — bit-reproducible in the DuckDB oracle. A
    * real pipeline runs the same computation over DECODED pixel blocks
    * (swap [[stubDecode]]'s boundary); the hash shape, the Hamming
    * near-dup join, and everything downstream are unchanged.
    *
    * Payloads shorter than 64 bytes leave the tail windows empty —
    * empty windows hash to 0 (defined, not derived).
    */
  def blockHash64(bytes: Array[Byte]): Long = {
    val n = bytes.length
    var total = 0L
    var i = 0
    while (i < n) { total += bytes(i) & 0xff; i += 1 }
    var hash = 0L
    var b = 0
    while (b < 64) {
      val start = b.toLong * n / 64
      val end = (b + 1).toLong * n / 64
      val wlen = end - start
      if (wlen > 0) {
        var wsum = 0L
        var j = start.toInt
        while (j < end) { wsum += bytes(j) & 0xff; j += 1 }
        if (cmpProd(wsum, n, total, wlen) >= 0) hash |= (1L << b)
      }
      b += 1
    }
    hash
  }

  /** Deterministic REAL-PCM fixture corpus (X348): `n` rows of
    * (clip_id, payload) where payload is 2048 samples of signed 16-bit
    * little-endian audio — the raw interchange format under WAV/FLAC.
    * Sample values are a pinned integer function of (clip_id, t)
    * ([[pcmSample]]); clips with id % 5 == 0 carry two ZEROED frames
    * (2 and 5) so silence detection has planted positives. Like
    * [[pngFixture]], generation is distributed (mapPartitions over a
    * range — no blob passes the driver) and the encoding is the real
    * container byte layout, so the DuckDB oracle can re-derive every
    * sample from the hex of the SAME bytes Spark decoded.
    */
  def pcmFixture(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions(_.map(id => (id, encodePcm(id))))
      .toDF("clip_id", "payload")
  }

  /** Pinned fixture sample value — shared by the generator and the
    * decode spec. Integer triangle-ish noise in ±2000 (fits s16). */
  def pcmSample(id: Long, t: Int): Int =
    if (id % 5 == 0 && ((t >= 512 && t < 768) || (t >= 1280 && t < 1536))) 0
    else ((t.toLong * (t + 7L * id) + 13L * id) % 4001L).toInt - 2000

  private def encodePcm(id: Long): Array[Byte] = {
    val out = new Array[Byte](4096)
    var t = 0
    while (t < 2048) {
      val v = pcmSample(id, t)
      out(2 * t) = (v & 0xff).toByte
      out(2 * t + 1) = ((v >> 8) & 0xff).toByte
      t += 1
    }
    out
  }

  /** REAL s16le decode → per-frame energy rows (clip_id, frame_no,
    * n_samples, ssq, peak, silent): ByteBuffer little-endian shorts,
    * `frameLen`-sample frames (a short trailing frame keeps its true
    * n_samples), ssq = Σ v² (≤ 256·32768² ≈ 2.7·10¹¹ — Long-safe at any
    * frame length below ~8·10⁹ samples), silent ⟺ peak == 0 (defined,
    * not thresholded — a threshold is a policy layered on these exact
    * integers). Embarrassingly parallel narrow map, same shape as
    * [[decodeMeta]]; blobs never pass the driver.
    */
  def pcmFrameEnergy(spark: SparkSession, df: DataFrame, idCol: String,
      frameLen: Int = 256): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val nS = bytes.length / 2
          val nF = (nS + frameLen - 1) / frameLen
          (0 until nF).iterator.map { f =>
            val end = math.min((f + 1) * frameLen, nS)
            var ssq = 0L
            var peak = 0L
            var i = f * frameLen
            while (i < end) {
              val v = bb.getShort(2 * i).toLong
              ssq += v * v
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 1
            }
            (id, f.toLong, (end - f * frameLen).toLong, ssq, peak,
              peak == 0L)
          }
        }
      }
      .toDF("clip_id", "frame_no", "n_samples", "ssq", "peak", "silent")
  }

  /** Deterministic REAL-VIDEO fixture corpus (X359): `n` clips of
    * (clip_id, payload) where payload is a length-prefixed frame
    * container — [4-byte big-endian length][PNG bytes] repeated for
    * 2 + id % 4 frames, each frame a GENUINE PNG (the [[pngFixture]]
    * encoder with per-(clip, frame) pinned dimensions). The framing is
    * the real interchange shape (MJPEG-in-AVI / length-delimited
    * protobuf streams); the oracle can walk the SAME container bytes.
    */
  def videoFixture(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions(_.map(id => (id, encodeVideo(id))))
      .toDF("clip_id", "payload")
  }

  /** Pinned per-frame sub-id — shared by the generator and the spec. */
  def videoFrameId(clipId: Long, frame: Int): Long =
    clipId * 101 + frame * 7 + 1

  private def encodeVideo(id: Long): Array[Byte] = {
    val frames = (0 until (2 + (id % 4)).toInt)
      .map(f => encodePng(videoFrameId(id, f)))
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { b =>
      out.write(Array[Byte](((b.length >> 24) & 0xff).toByte,
        ((b.length >> 16) & 0xff).toByte, ((b.length >> 8) & 0xff).toByte,
        (b.length & 0xff).toByte))
      out.write(b)
    }
    out.toByteArray
  }

  /** REAL container walk + REAL per-frame decode: parse the 4-byte
    * big-endian framing, run each frame through javax.imageio, and
    * emit (clip_id, frame_no, n_bytes, width, height, frame_md5) —
    * frame_md5 is md5 of the frame's UPPERCASE hex (the k15
    * `md5(hex(...))` convention, so the oracle can recompute it from
    * `substr(hex(payload), …)`). A malformed tail (fewer than 4 bytes
    * where a length should be, or a length overrunning the payload)
    * stops the walk — truncation is a data problem, not a crash.
    * Embarrassingly parallel narrow map; blobs never pass the driver.
    */
  def videoFrameMeta(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Per-task setup (guide §4.5): ImageIO's default ImageInputStream
        // is FILE-cache-backed — one temp file created and deleted PER
        // FRAME; the in-memory cache decodes identically. One MD5
        // instance reused across frames (reset() on digest()).
        javax.imageio.ImageIO.setUseCache(false)
        val digest = java.security.MessageDigest.getInstance("MD5")
        val HEXU = "0123456789ABCDEF".getBytes("US-ASCII")
        val HEXL = "0123456789abcdef".toCharArray
        it.flatMap { case (id, bytes) =>
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Long, Long, String)]
          var pos = 0
          var f = 0L
          while (pos + 4 <= bytes.length) {
            val len = ((bytes(pos) & 0xff) << 24) |
              ((bytes(pos + 1) & 0xff) << 16) |
              ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
            if (len < 0 || pos + 4 + len > bytes.length) {
              pos = bytes.length // truncated frame: stop the walk
            } else {
              val frame = java.util.Arrays.copyOfRange(bytes, pos + 4,
                pos + 4 + len)
              val img =
                try javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(frame))
                catch { case _: java.io.IOException => null }
              val (w, h) =
                if (img == null) (0, 0) else (img.getWidth, img.getHeight)
              // md5 over the frame's UPPERCASE-hex ASCII bytes — same
              // digest as the old StringBuilder+format path (k15
              // md5(hex(...)) convention) via a nibble lookup table:
              // the per-byte String.format was the measured hot spot,
              // not the hashing.
              val hexBytes = new Array[Byte](len * 2)
              var i = 0
              while (i < len) {
                val v = frame(i) & 0xff
                hexBytes(2 * i) = HEXU(v >>> 4)
                hexBytes(2 * i + 1) = HEXU(v & 0xf)
                i += 1
              }
              val dg = digest.digest(hexBytes)
              val mdChars = new Array[Char](32)
              var j = 0
              while (j < 16) {
                val v = dg(j) & 0xff
                mdChars(2 * j) = HEXL(v >>> 4)
                mdChars(2 * j + 1) = HEXL(v & 0xf)
                j += 1
              }
              out += ((id, f, len.toLong, w.toLong, h.toLong,
                new String(mdChars)))
              f += 1
              pos += 4 + len
            }
          }
          out.iterator
        }
      }
      .toDF("clip_id", "frame_no", "n_bytes", "width", "height",
        "frame_md5")
  }

  /** Exact compare of a·b vs c·d for non-negative longs via 128-bit
    * cross multiplication (Math.multiplyHigh + unsigned low word).
    * The naive `wsum * n >= total * wlen` overflows Long once payloads
    * pass ~1.5 GB (wsum ≤ 255n, so wsum·n ~ 255n²) and would silently
    * flip hash bits on exactly the large binaries a 100 TB multimodal
    * corpus contains.
    */
  private[graft] def cmpProd(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }

  /** Executor-side batched perceptual-hash pass — same shape as
    * [[decodeMeta]]; returns (idCol, phash).
    */
  def decodePHash(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.iterator.map { case (id, bytes) => (id, blockHash64(bytes)) }
        }
      }
      .toDF(idCol, "phash")
  }

  /** STUB resize — proportional downscale to fit `maxDim` (integer
    * arithmetic, ceil-free floor scaling; a real impl calls the codec).
    * Pure metadata math, so it runs as a narrow typed map.
    */
  def stubResize(m: MediaMeta, maxDim: Int): MediaMeta = {
    val longest = math.max(m.width, m.height)
    if (longest <= maxDim) m
    else m.copy(
      width = math.max(1, (m.width.toLong * maxDim / longest).toInt),
      height = math.max(1, (m.height.toLong * maxDim / longest).toInt))
  }

  def resizeMeta(ds: Dataset[MediaMeta], maxDim: Int): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.map(stubResize(_, maxDim))
  }

  /** Frame sampling for video-like payloads: every `stride`-th frame
    * index (deterministic; a real impl seeks the container). */
  def sampleFrameIndices(frames: Int, stride: Int): Seq[Int] =
    0 until frames by math.max(1, stride)

  /** One row per sampled frame — the explode-shaped fan-out a
    * frame-level feature extractor consumes downstream. */
  def explodeFrames(spark: SparkSession, ds: Dataset[MediaMeta], stride: Int): DataFrame = {
    import spark.implicits._
    ds.flatMap(m => sampleFrameIndices(m.frames, stride).map(f => (m.doc_id, f)))
      .toDF("doc_id", "frame_idx")
  }

  /** [[explodeFrames]] carrying the (resized) dimensions along in the SAME
    * narrow flatMap — the shape a frame-level extractor actually wants,
    * with no join back to the metadata (which would re-run the decode or
    * force a shuffle).
    */
  def frameTable(spark: SparkSession, ds: Dataset[MediaMeta], stride: Int): DataFrame = {
    import spark.implicits._
    ds.flatMap(m => sampleFrameIndices(m.frames, stride)
        .map(f => (m.doc_id, f, m.width, m.height)))
      .toDF("doc_id", "frame_idx", "width", "height")
  }
}
