package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark side — schema, partition sizing, batch iteration, the
  * operator signatures — is real and tested (MultimodalSpec). The
  * codec itself is a STUB: this container has no image/audio
  * libraries, so `decodeStub` derives deterministic fake metadata and
  * frames from the payload bytes. Swapping in a real decoder changes
  * only the function body marked FAKE below.
  */
object Multimodal {

  /** Decoded-media metadata row. */
  final case class MediaMeta(id: Long, modality: String, nBytes: Long,
                             width: Int, height: Int, nFrames: Int)

  /** Sampled-frame row (one per frame kept). */
  final case class Frame(id: Long, frameIdx: Int, frameBytes: Array[Byte])

  /** Pack any table into the canonical multimodal schema:
    * (id, modality, payload binary, props). Here payload is the
    * utf-8 encoding of a text column — a stand-in for real media
    * bytes; the schema and partitioning are what downstream relies on.
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String, modality: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), lit(modality).as("modality"),
      encode(col(textCol), "UTF-8").cast("binary").as("payload"))

  /** Batched per-partition "decode": real batch shape (mapPartitions,
    * grouped iterator — the same shape a JNI/FFmpeg decode batch would
    * use, amortizing codec init per batch), FAKE codec body.
    */
  def decodeStub(media: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.select(col("id"), col("modality"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // >>> FAKE DECODE: deterministic metadata derived from the
          // payload byte length (length-based rather than content-
          // hash-based so an external oracle can recompute it). A real
          // implementation decodes the media header here.
          batch.map { r =>
            val id = r.getLong(0)
            val modality = r.getString(1)
            val bytes = r.getAs[Array[Byte]](2)
            val n = bytes.length.toLong
            MediaMeta(id, modality, n,
              width = 16 + (n % 1920L).toInt,
              height = 16 + (n * 7L % 1080L).toInt,
              nFrames = 1 + (n % 32L).toInt)
          }
          // <<< FAKE DECODE
        }
      }
  }

  /** Frame sampling: every `stride`-th frame, payload sliced per
    * frame. Real slicing/partition shape; FAKE frame content (byte
    * slices of the payload).
    */
  def sampleFrames(media: DataFrame, stride: Int, batchSize: Int = 64): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    media.select(col("id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            // >>> FAKE FRAMES: fixed-width slices stand in for decoded frames.
            val nFrames = math.max(1, bytes.length / 32)
            (0 until nFrames by stride).map { i =>
              Frame(id, i, java.util.Arrays.copyOfRange(bytes,
                math.min(i * 32, bytes.length), math.min(i * 32 + 32, bytes.length)))
            }
            // <<< FAKE FRAMES
          }
        }
      }
  }

  /** Feature extraction to a fixed-dim embedding per media row —
    * FAKE features (seeded from bytes), real schema (array<float>).
    */
  def featureStub(media: DataFrame, dim: Int = 16): DataFrame =
    media.select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("payload"), i), lit(1000L)).cast("double") / 500.0 - 1.0)
          .cast("float")).as("features"))
}
