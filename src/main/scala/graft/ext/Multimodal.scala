package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video travel as opaque
  * `binary` columns with a typed metadata struct, processed by
  * executor-side batch functions over `mapPartitions` (the Scala
  * analog of pandas-UDF `mapInPandas` plumbing).
  *
  * The actual codecs (JPEG decode, resample, frame extraction) are
  * NOT in this container, so the decode kernels are clearly-marked
  * deterministic STUBS — but everything Spark-side is real and
  * tested: the schema (binary + struct), the partition-batched
  * execution shape, the typed Encoder round trip, and the metadata
  * derivation, which is pure codegen'd expressions.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRow(doc_id: Long, format: String, width: Int, height: Int,
                            n_bytes: Long, payload: Array[Byte])

  /** Extracted features (decode output schema). */
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                                 mean_byte: Double, first_byte: Int, frames_sampled: Int)

  /** Wrap a text table as a media table: payload = UTF-8 bytes (the
    * stand-in for real image bytes), metadata derived
    * deterministically. Pure expressions — oracle-verifiable.
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("png"), lit("jpeg"), lit("webp")), (col("doc_id") % 3 + 1).cast("int")).as("format"),
      (col("n_chars") % 640 + 64).cast("int").as("width"),
      (col("n_chars") * 7 % 480 + 48).cast("int").as("height"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
      col("text").cast("binary").as("payload"))

  /** Executor-side batch "decode": iterates each partition once,
    * computing features per payload. The byte-statistics body stands
    * in for a real `ImageIO.read`/ffmpeg call — swap `decodeStub`
    * for the codec and the plumbing (partitioning, encoders, batch
    * shape) is unchanged.
    */
  def decodeFeatures(media: Dataset[MediaRow], frameStride: Int = 1024): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (mean, first, frames) = decodeStub(r.payload, frameStride)
        MediaFeatures(r.doc_id, r.format, r.n_bytes, mean, first, frames)
      }
    }
  }

  /** STUB for the real codec: deterministic byte statistics. A real
    * implementation decodes `payload` with an image/audio library and
    * returns genuine features (dimensions, duration, frame pixels).
    */
  private def decodeStub(payload: Array[Byte], frameStride: Int): (Double, Int, Int) = {
    if (payload.isEmpty) (0.0, -1, 0)
    else {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      val frames = (payload.length + frameStride - 1) / frameStride // "frame sample" every stride bytes
      (sum.toDouble / payload.length, payload(0) & 0xff, frames)
    }
  }

  /** "Resize" stub: metadata-only transform (a real kernel rewrites
    * payload bytes); shows the partial-column-update shape.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))
}
