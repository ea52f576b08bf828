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

  /** media row contract: (media_id, mime, media binary) */
  final case class MediaMeta(media_id: Long, mime: String, width: Int, height: Int,
                             nBytes: Long, valid: Boolean)
  final case class Frame(media_id: Long, frameIdx: Int, ts_ms: Long, pixelsHash: Long)

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
    * row UDF) so a real decoder could amortize native init per batch. */
  def extractMeta(df: DataFrame): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    df.select(col("media_id").cast("long"), col("mime").cast("string"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mime = r.getString(1)
          val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          decodeHeader(bytes) match {
            case Some((w, h, _)) => MediaMeta(id, mime, w, h, bytes.length.toLong, valid = true)
            case None => MediaMeta(id, mime, -1, -1,
              if (bytes == null) 0L else bytes.length.toLong, valid = false)
          }
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

  /** Size-aware repartitioning for heavy binary columns: target
    * `targetPartitionBytes` per task using the average blob size — the
    * knob that keeps executor memory bounded when blobs are MBs each. */
  def repartitionBySize(df: DataFrame, totalBytes: Long, targetPartitionBytes: Long): DataFrame = {
    val parts = math.max(1, (totalBytes / math.max(1L, targetPartitionBytes)).toInt)
    df.repartition(parts)
  }
}
