package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise with real Spark
  * partitioning and schemas.
  *
  * The actual codecs (JPEG/PNG/audio decode) are NOT available in this
  * environment — the decode kernels below are clearly-marked deterministic
  * FAKES operating on a self-describing synthetic header, so the
  * Spark-side contract (schema, batching, partition sizing, null
  * handling) is real and tested while the kernel is swappable for a JNI /
  * process-pool implementation on a real cluster.
  */
object Multimodal {

  /** media row contract: (media_id, mime, media binary).
    * `format` is detected from magic bytes: "bmp" / "wav" are REAL
    * byte-layout parsers (no codec library needed); "grft" is the labeled
    * synthetic container; "unknown" = unparseable. Audio fields are -1/0
    * for visual formats and vice versa. */
  final case class MediaMeta(media_id: Long, mime: String, format: String,
                             width: Int, height: Int,
                             channels: Int, sampleRateHz: Int, durationMs: Long,
                             nBytes: Long, valid: Boolean)
  final case class Frame(media_id: Long, frameIdx: Int, ts_ms: Long, pixelsHash: Long)

  // ---- REAL container parsers (pure byte layout, public formats) -------------

  /** BMP (Windows DIB) header: "BM", u32le file size, pixel offset at 10,
    * DIB header size at 14, i32le width at 18, i32le height at 22 (negative
    * = top-down), u16le bpp at 28. Returns (width, height, bpp). */
  def parseBmp(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes == null || bytes.length < 30) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dibSize = bb.getInt(14)
    if (dibSize < 40) return None // BITMAPINFOHEADER or later
    val w = bb.getInt(18)
    val h = math.abs(bb.getInt(22))
    val bpp = bb.getShort(28) & 0xFFFF
    if (w <= 0 || h <= 0) None else Some((w, h, bpp))
  }

  /** WAV (RIFF) header: "RIFF" + u32le size + "WAVE", then chunks; the
    * "fmt " chunk carries u16le channels at +2, u32le sample rate at +4,
    * u32le byte rate at +8; the "data" chunk length gives the duration.
    * Returns (channels, sampleRateHz, durationMs). */
  def parseWav(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    if (bytes == null || bytes.length < 44) return None
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var channels = -1; var rate = -1; var byteRate = -1; var dataLen = -1L
    while (off + 8 <= bytes.length && (channels < 0 || dataLen < 0)) {
      val id = ascii(off, 4)
      val len = bb.getInt(off + 4)
      // declared chunk data must actually be present (the optional pad
      // byte after an odd-length final chunk may be absent, but the data
      // itself may not)
      if (len < 0 || off + 8 + len.toLong > bytes.length) return None
      if (id == "fmt " && len >= 16) {
        channels = bb.getShort(off + 10) & 0xFFFF
        rate = bb.getInt(off + 12)
        byteRate = bb.getInt(off + 16)
      } else if (id == "data") dataLen = len.toLong
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || byteRate <= 0 || dataLen < 0) None
    else Some((channels, rate, dataLen * 1000 / byteRate))
  }

  /** Minimal valid BMP bytes (24bpp, bottom-up, zeroed pixels) — fixture
    * builder for tests and synthetic pipelines. */
  def synthesizeBmp(width: Int, height: Int): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val pixelBytes = rowSize * height
    val bb = java.nio.ByteBuffer.allocate(54 + pixelBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + pixelBytes)
      .putInt(0).putInt(54) // reserved, pixel offset
      .putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(pixelBytes)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.array()
  }

  /** 24bpp BMP pixel accessor: (w, h, pixelOffset, rowSize, topDown).
    * Rows are padded to 4-byte boundaries; a negative height field means
    * top-down row order (byte row r = image row r; bottom-up otherwise). */
  private def bmpPixelLayout(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Boolean)] =
    parseBmp(bytes).flatMap { case (w, h, bpp) =>
      if (bpp != 24) None
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val pixelOff = bb.getInt(10)
        val topDown = bb.getInt(22) < 0
        val rowSize = ((w * 3 + 3) / 4) * 4
        // lower bound too: a corrupt negative pixel offset must not pass
        if (pixelOff < 54 || pixelOff + rowSize.toLong * h > bytes.length) None
        else Some((w, h, pixelOff, rowSize, topDown))
      }
    }

  /** REAL nearest-neighbor resize of a 24bpp BMP — actual pixel work, no
    * codec library (BMP is an uncompressed public byte layout). Output is
    * always bottom-up; top-down inputs are orientation-corrected. Returns
    * None if the input isn't a 24bpp BMP. */
  def resizeBmp(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    bmpPixelLayout(bytes).map { case (w, h, pixelOff, rowSize, topDown) =>
      val out = synthesizeBmp(newW, newH)
      val outRowSize = ((newW * 3 + 3) / 4) * 4
      var y = 0 // output byte row (bottom-up: image row newH-1-y)
      while (y < newH) {
        // source IMAGE row for this output image row, then to byte row
        val srcImgY = ((newH - 1 - y).toLong * h / newH).toInt
        val srcY = if (topDown) srcImgY else h - 1 - srcImgY
        var x = 0
        while (x < newW) {
          val srcX = (x.toLong * w / newW).toInt
          val src = pixelOff + srcY * rowSize + srcX * 3
          val dst = 54 + y * outRowSize + x * 3
          out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
          x += 1
        }
        y += 1
      }
      out
    }

  /** REAL per-channel means (B, G, R — BMP channel order) of a 24bpp BMP —
    * the feature-extraction kernel, de-stubbed for the one format whose
    * pixels are plain bytes. */
  def bmpChannelMeans(bytes: Array[Byte]): Option[(Double, Double, Double)] =
    bmpPixelLayout(bytes).map { case (w, h, pixelOff, rowSize, _) =>
      var b = 0L; var g = 0L; var r = 0L
      var y = 0
      while (y < h) {
        var x = 0
        val rowOff = pixelOff + y * rowSize
        while (x < w) {
          val p = rowOff + x * 3
          b += bytes(p) & 0xFF; g += bytes(p + 1) & 0xFF; r += bytes(p + 2) & 0xFF
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      (b.toDouble / n, g.toDouble / n, r.toDouble / n)
    }

  /** Minimal valid PCM WAV bytes (silence) — fixture builder. */
  def synthesizeWav(channels: Int, sampleRateHz: Int, millis: Int,
                    bitsPerSample: Int = 16): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRateHz * blockAlign
    // Long arithmetic: byteRate * millis overflows Int at ~12 s of 44.1 kHz
    // stereo 16-bit; round down to a whole block
    val dataLenL = byteRate.toLong * millis / 1000 / blockAlign * blockAlign
    require(dataLenL <= Int.MaxValue - 44,
      s"requested WAV data section ($dataLenL bytes) exceeds the 2 GiB single-buffer bound")
    val dataLen = dataLenL.toInt
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRateHz)
      .putInt(byteRate).putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** Synthetic media header: 16 bytes = magic "GRFT" + width(int) +
    * height(int) + frames(int), then payload. Stand-in for a real
    * container format so decode is deterministic and testable. */
  def synthesize(mediaId: Long, width: Int, height: Int, frames: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 16)
    bb.put("GRFT".getBytes("US-ASCII")).putInt(width).putInt(height).putInt(frames)
    bb.putLong(mediaId).putLong(width.toLong * height * frames) // fake payload
    bb.array()
  }

  /** FAKE DECODE (deterministic): parse the synthetic header. A real
    * implementation would hand `bytes` to an image library here; the
    * surrounding iterator shape (one partition = one batch, reused buffer,
    * per-record try/catch) is the production contract. */
  private def decodeHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes == null || bytes.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4); bb.get(magic)
    if (new String(magic, "US-ASCII") != "GRFT") None
    else Some((bb.getInt, bb.getInt, bb.getInt))
  }

  /** Extract typed metadata from the binary column. mapPartitions (not a
    * row UDF) so a real decoder could amortize native init per batch.
    * BMP and WAV are parsed for real (byte layout only); the synthetic
    * GRFT container covers the video-frames path. */
  def extractMeta(df: DataFrame): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    df.select(col("media_id").cast("long"), col("mime").cast("string"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mime = r.getString(1)
          val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val n = if (bytes == null) 0L else bytes.length.toLong
          def invalid = MediaMeta(id, mime, "unknown", -1, -1, -1, -1, -1L, n, valid = false)
          try parseBmp(bytes).map { case (w, h, _) =>
            MediaMeta(id, mime, "bmp", w, h, -1, -1, -1L, n, valid = true)
          }.orElse(parseWav(bytes).map { case (ch, rate, ms) =>
            MediaMeta(id, mime, "wav", -1, -1, ch, rate, ms, n, valid = true)
          }).orElse(decodeHeader(bytes).map { case (w, h, _) =>
            MediaMeta(id, mime, "grft", w, h, -1, -1, -1L, n, valid = true)
          }).getOrElse(invalid)
          catch { case _: Exception => invalid } // malformed blob != failed stage
        }
      }
  }

  /** Frame sampling: every `stride`-th frame up to `maxFrames`, with a
    * deterministic per-frame feature hash standing in for decoded pixels.
    * flatMap shape = real contract for video expansion (row count
    * amplification happens executor-side, never on the driver). */
  def sampleFrames(df: DataFrame, stride: Int, maxFrames: Int): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    df.select(col("media_id").cast("long"), col("media"))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeHeader(bytes) match {
          case Some((w, h, frames)) =>
            (0 until frames by stride).take(maxFrames).map { f =>
              // FAKE pixel features: hash of (id, frame, dims)
              Frame(id, f, f * 40L, (id * 31L + f) * 1000003L + w * 7L + h)
            }
          case None => Nil
        }
      }
  }

  final case class ResizedMedia(media_id: Long, media: Array[Byte], resized: Boolean)
  final case class ImageFeatures(media_id: Long, mean_b: Double, mean_g: Double,
                                 mean_r: Double, valid: Boolean)

  /** Batch resize over the binary column (24bpp BMPs resized for real;
    * anything else passes through with resized=false). mapPartitions
    * keeps the production contract: binary in, binary out, row-at-a-time
    * failure isolation. */
  def resizeImages(df: DataFrame, newW: Int, newH: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    df.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          // row-at-a-time failure isolation: one malformed blob passes
          // through instead of aborting the stage
          try resizeBmp(bytes, newW, newH) match {
            case Some(out) => ResizedMedia(id, out, resized = true)
            case None => ResizedMedia(id, bytes, resized = false)
          } catch { case _: Exception => ResizedMedia(id, bytes, resized = false) }
        }
      }
  }

  /** Batch feature extraction: real per-channel means for 24bpp BMPs. */
  def imageFeatures(df: DataFrame): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    df.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          try bmpChannelMeans(bytes) match {
            case Some((b, g, rr)) => ImageFeatures(id, b, g, rr, valid = true)
            case None => ImageFeatures(id, -1, -1, -1, valid = false)
          } catch { case _: Exception => ImageFeatures(id, -1, -1, -1, valid = false) }
        }
      }
  }

  /** Size-aware repartitioning for heavy binary columns: target
    * `targetPartitionBytes` per task using the average blob size — the
    * knob that keeps executor memory bounded when blobs are MBs each. */
  def repartitionBySize(df: DataFrame, totalBytes: Long, targetPartitionBytes: Long): DataFrame = {
    // clamp BEFORE narrowing: a petabyte/megabyte ratio wraps Int negative
    // and math.max(1, ...) would collapse to ONE partition — the opposite
    // of this knob's purpose
    val ratio = totalBytes / math.max(1L, targetPartitionBytes)
    val parts = math.max(1L, math.min(Int.MaxValue.toLong, ratio)).toInt
    df.repartition(parts)
  }
}
