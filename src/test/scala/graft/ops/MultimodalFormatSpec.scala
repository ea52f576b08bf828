package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Real container-format parsing (round-1 verdict item 10): BMP and WAV are
  * pure public byte layouts, so the decode step is no longer a stub for
  * those formats — including end-to-end through the mapPartitions batch
  * contract.
  */
class MultimodalFormatSpec extends SparkSuite {

  test("BMP: synthesized bytes parse back to the exact dimensions") {
    val bytes = Multimodal.synthesizeBmp(640, 480)
    assert(Multimodal.parseBmp(bytes).contains((640, 480, 24)))
    // top-down BMP (negative height) normalizes
    val bb = java.nio.ByteBuffer.wrap(bytes.clone()).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -480)
    assert(Multimodal.parseBmp(bb.array()).contains((640, 480, 24)))
    // corrupt: bad magic, truncated
    assert(Multimodal.parseBmp("XXnotabmp".getBytes).isEmpty)
    assert(Multimodal.parseBmp(bytes.take(20)).isEmpty)
    assert(Multimodal.parseBmp(null).isEmpty)
  }

  test("WAV: synthesized bytes parse back to channels/rate/duration") {
    val bytes = Multimodal.synthesizeWav(channels = 2, sampleRateHz = 44100, millis = 1500)
    assert(Multimodal.parseWav(bytes).contains((2, 44100, 1500L)))
    val mono = Multimodal.synthesizeWav(channels = 1, sampleRateHz = 16000, millis = 250)
    assert(Multimodal.parseWav(mono).contains((1, 16000, 250L)))
    assert(Multimodal.parseWav("RIFFxxxxNOPE".getBytes).isEmpty)
    assert(Multimodal.parseWav(bytes.take(30)).isEmpty)
  }

  test("BMP resize: real nearest-neighbor pixel work, well-formed output") {
    // 4x2 image: left half solid red (BMP stores BGR), right half solid blue
    val src = Multimodal.synthesizeBmp(4, 2)
    val rowSize = ((4 * 3 + 3) / 4) * 4
    for (y <- 0 until 2; x <- 0 until 4) {
      val p = 54 + y * rowSize + x * 3
      if (x < 2) { src(p) = 0; src(p + 1) = 0; src(p + 2) = 0xFF.toByte } // red
      else { src(p) = 0xFF.toByte; src(p + 1) = 0; src(p + 2) = 0 }       // blue
    }
    val out = Multimodal.resizeBmp(src, 2, 1).get
    assert(Multimodal.parseBmp(out).contains((2, 1, 24)))
    val outRow = ((2 * 3 + 3) / 4) * 4
    assert((out(54) & 0xFF, out(56) & 0xFF) == (0, 255), "left pixel stays red")
    assert((out(54 + 3) & 0xFF, out(56 + 3) & 0xFF) == (255, 0), "right pixel stays blue")
    assert(outRow > 0)
    // channel means reflect the half/half split exactly
    val (b, g, r) = Multimodal.bmpChannelMeans(src).get
    assert(b == 127.5 && g == 0.0 && r == 127.5)
    // non-BMP input passes through
    assert(Multimodal.resizeBmp("not an image".getBytes, 2, 2).isEmpty)
  }

  test("BMP resize preserves orientation for top-down inputs") {
    // 1x2 bottom-up: byte row 0 = image bottom (blue), byte row 1 = top (red)
    val rowSize = ((1 * 3 + 3) / 4) * 4
    val bottomUp = Multimodal.synthesizeBmp(1, 2)
    bottomUp(54) = 0xFF.toByte // bottom pixel blue (B channel)
    bottomUp(54 + rowSize + 2) = 0xFF.toByte // top pixel red (R channel)
    val r1 = Multimodal.resizeBmp(bottomUp, 1, 2).get
    assert((r1(54) & 0xFF) == 255, "bottom stays blue")
    assert((r1(54 + rowSize + 2) & 0xFF) == 255, "top stays red")
    // same bytes declared top-down: byte row 0 = image TOP (blue)
    val topDown = bottomUp.clone()
    java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, -2)
    val r2 = Multimodal.resizeBmp(topDown, 1, 2).get
    assert((r2(54 + rowSize) & 0xFF) == 255, "image top (blue) lands in the output's top byte row")
    assert((r2(54 + 2) & 0xFF) == 255, "image bottom (red) lands in the output's bottom byte row")
  }

  test("WAV chunk whose declared length exceeds the file is rejected") {
    val bytes = Multimodal.synthesizeWav(1, 8000, 100)
    // corrupt the data chunk length (+1 beyond actual bytes)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataLen = bb.getInt(40)
    bb.putInt(40, dataLen + 1)
    assert(Multimodal.parseWav(bytes).isEmpty, "over-declared data chunk must not be valid")
  }

  test("resize + feature ops run through the Dataset batch contract") {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("mime", StringType),
      StructField("media", BinaryType)))
    val rows = Seq(
      Row(1L, "image/bmp", Multimodal.synthesizeBmp(64, 32)),
      Row(2L, "audio/wav", Multimodal.synthesizeWav(1, 8000, 100)),
      Row(3L, "image/bmp", null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val resized = Multimodal.resizeImages(df, 16, 8).collect().map(m => m.media_id -> m).toMap
    assert(resized(1L).resized && Multimodal.parseBmp(resized(1L).media).contains((16, 8, 24)))
    assert(!resized(2L).resized, "WAV passes through unresized")
    val feats = Multimodal.imageFeatures(df).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).valid && feats(1L).mean_b == 0.0) // zeroed pixels
    assert(!feats(2L).valid && !feats(3L).valid)
  }

  test("extractMeta dispatches on magic bytes across a mixed partition") {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("mime", StringType),
      StructField("media", BinaryType)))
    val rows = Seq(
      Row(1L, "image/bmp", Multimodal.synthesizeBmp(128, 64)),
      Row(2L, "audio/wav", Multimodal.synthesizeWav(2, 48000, 2000)),
      Row(3L, "video/grft", Multimodal.synthesize(3L, 320, 240, 5)),
      Row(4L, "application/octet-stream", Array[Byte](9, 9, 9)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val meta = Multimodal.extractMeta(df).collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).format == "bmp" && meta(1L).width == 128 && meta(1L).height == 64 && meta(1L).valid)
    assert(meta(2L).format == "wav" && meta(2L).channels == 2 &&
      meta(2L).sampleRateHz == 48000 && meta(2L).durationMs == 2000L && meta(2L).valid)
    assert(meta(3L).format == "grft" && meta(3L).width == 320 && meta(3L).valid)
    assert(meta(4L).format == "unknown" && !meta(4L).valid)
  }
}
