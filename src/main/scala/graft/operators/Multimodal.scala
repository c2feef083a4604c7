package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: opaque bytes + typed metadata. The binary column is never
  * interpreted by Spark itself — only by the (pluggable) decoder. */
case class MediaRecord(
    doc_id: Long,
    media: Array[Byte],
    mime: String,
    width: Int,
    height: Int)

case class MediaFeatures(
    doc_id: Long,
    mime: String,
    byte_len: Long,
    checksum: Long,
    histogram: Array[Float])

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-parallel batched iteration
  * (`mapPartitions` on a typed Dataset, the Scala analog of Python's
  * `mapInPandas`), column pruning of the heavy binary column until the decode
  * stage — is real and tested. The DECODE ITSELF IS A STUB: this container has
  * no image/audio codecs, so [[decodeStub]] computes a deterministic fake
  * feature vector (byte histogram) where a real deployment would call its
  * codec. Swap `decodeStub` for a real decoder without touching the pipeline.
  */
object Multimodal {

  /** Synthesize a media table from the documents table: UTF-8 bytes of the
    * text stand in for an encoded image; width/height derived from n_chars.
    * Deterministic — mirrored by the DuckDB oracle. */
  def synthesizeFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/x-fake").as("mime"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))

  /** Metadata-only projection — MUST not read the binary column; at scale the
    * parquet scan prunes `media` entirely (verify via ReadSchema in explain). */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("mime"), col("width"), col("height"),
      (col("width") * col("height")).as("pixels"))

  /** Decode + feature-extract, batched per partition. REAL pipeline shape,
    * STUB decode: features = 16-bin byte histogram (normalized) + FNV-1a
    * checksum. A real image decoder would produce e.g. CLIP-ready tensors
    * here; everything around it (partitioning, schema, laziness) is what
    * would ship. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val bytes = rec.media
          var h = 0xcbf29ce484222325L // FNV-1a 64
          val hist = new Array[Float](16)
          var i = 0
          while (i < bytes.length) {
            h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
            hist((bytes(i) & 0xff) >> 4) += 1f
            i += 1
          }
          val n = math.max(bytes.length, 1).toFloat
          MediaFeatures(rec.doc_id, rec.mime, bytes.length.toLong, h,
            hist.map(_ / n))
        }
      }
  }

  /** Resize, batched per partition — REAL pipeline shape, STUB kernel:
    * nearest-neighbor subsampling of the byte buffer to targetW×targetH
    * (a real deployment would decode and rescale pixels here). Metadata is
    * updated alongside the payload, as a real resize must. */
  def resizeStub(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height").as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val src = rec.media
          val n = targetW * targetH
          val out = new Array[Byte](n)
          if (src.length > 0) {
            var i = 0
            while (i < n) {
              out(i) = src((i.toLong * src.length / n).toInt)
              i += 1
            }
          }
          rec.copy(media = out, width = targetW, height = targetH)
        }
      }
  }

  /** Frame sampling: every `stride`-th byte-window stands in for a video
    * frame. Pure column code (slice on a byte array) — shows the
    * array-of-frames shape a real frame sampler would emit. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    // floor division (Spark's `/` on ints is fractional); negative intermediate
    // values are clamped to 0, matching integer floor-div semantics
    val lastIdx = greatest(
      floor((length(col("media")) - frameBytes).cast("double") / stride).cast("int"),
      lit(0))
    media.select(col("doc_id"),
      transform(
        sequence(lit(0), lastIdx),
        i => col("media").substr((i * stride + 1).cast("int"), lit(frameBytes)))
        .as("frames"))
      .withColumn("n_frames", size(col("frames")))
  }
}
