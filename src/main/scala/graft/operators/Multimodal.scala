package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-decoded on executors.
  *
  * The Spark-side machinery is real and tested — schema, partition-parallel
  * batched iteration (the Scala analog of a batched/pandas decode UDF), typed
  * output — while the codec itself is a clearly marked DETERMINISTIC STUB
  * (this container ships no image/audio libraries): it "decodes" a blob into
  * byte-level features. Swapping `decodeStub` for a real JNI/opencv call
  * changes nothing about the distributed plumbing.
  */
object Multimodal {

  /** Typed per-media features produced by the decode stage. */
  final case class MediaMeta(
      doc_id: Long,
      format: String,
      n_bytes: Int,
      checksum: Long, // Σ bytes mod 2^31-1
      width: Int,     // STUB: derived dimensions standing in for real decode
      height: Int)

  /** Attach a binary media column (here fabricated from text — the testdata
    * has no real blobs; a production source would read image/audio bytes).
    */
  def withBlob(docs: DataFrame, textCol: String, fmtCol: String): DataFrame =
    docs.select(col("doc_id"), col(fmtCol).as("format"),
      encode(col(textCol), "UTF-8").as("blob"))

  /** ??? real decode goes here — STUB: deterministic content features.
    * Checksum = Σ codepoints of the UTF-8-decoded payload, ONE final modulo —
    * matching the SQL-oracle restatement (`unicode(char)` fold) exactly; a
    * byte-wise or per-step-mod definition would silently diverge on the
    * first non-ASCII or very large payload.
    */
  private def decodeStub(docId: Long, format: String, blob: Array[Byte]): MediaMeta = {
    var sum = 0L
    val it = new String(blob, java.nio.charset.StandardCharsets.UTF_8)
      .codePoints().iterator()
    while (it.hasNext) sum += it.nextInt()
    val checksum = sum % 2147483647L
    MediaMeta(docId, format, blob.length, checksum,
      width = (blob.length % 64) + 1, height = (checksum % 64).toInt + 1)
  }

  /** Batched executor-side decode: partitions stream through in fixed-size
    * batches (the shape a vectorized decode library wants — amortized codec
    * init per batch, bounded memory), one output row per media item.
    */
  def decodeBatched(blobs: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "format", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec setup would happen here
          batch.iterator.map { case (id, fmt, blob) => decodeStub(id, fmt, blob) }
        }
      }
  }

  /** One sampled frame of a video-like blob. */
  final case class Frame(doc_id: Long, frame_idx: Int, total_frames: Int,
      frame: Array[Byte])

  /** Frame sampling: treat the blob as a sequence of fixed-size frames and
    * emit every `every`-th one as its OWN ROW — the explode shape a
    * frame-level pipeline (caption, embed, filter per frame) needs. The
    * fixed-`frameBytes` segmentation is the STUB (a real container format
    * would use the demuxer's frame index); the partition-parallel batched
    * explode, the one-row-per-frame schema, and the total_frames bookkeeping
    * are the real plumbing. Empty blobs produce no frames.
    */
  def frameSample(blobs: DataFrame, frameBytes: Int, every: Int,
      batchSize: Int = 64): Dataset[Frame] = {
    require(frameBytes > 0 && every > 0, "frameBytes and every must be positive")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "format", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch demuxer setup would happen here
          batch.iterator.flatMap { case (id, _, blob) =>
            val total = (blob.length + frameBytes - 1) / frameBytes
            (0 until total by every).iterator.map { i =>
              Frame(id, i, total, java.util.Arrays.copyOfRange(
                blob, i * frameBytes, math.min((i + 1) * frameBytes, blob.length)))
            }
          }
        }
      }
  }

  /** A media item resized to a fixed grid. */
  final case class Resized(doc_id: Long, width: Int, height: Int,
      pixels: Array[Byte])

  /** Resize to a fixed w×h grid by nearest-neighbor sampling over the blob
    * bytes — the STUB for a real scaler (bilinear over decoded pixels); the
    * batched executor plumbing and the fixed-size output contract (every row
    * exactly w·h bytes, the shape a training-batch assembler requires) are
    * real. Empty blobs resize to all-zero pixels.
    */
  def resizeBatched(blobs: DataFrame, w: Int, h: Int,
      batchSize: Int = 64): Dataset[Resized] = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "format", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch scaler setup would happen here
          batch.iterator.map { case (id, _, blob) =>
            val n = w * h
            val px = Array.tabulate(n) { i =>
              if (blob.isEmpty) 0.toByte
              else blob(((i.toLong * blob.length) / n).toInt)
            }
            Resized(id, w, h, px)
          }
        }
      }
  }
}
