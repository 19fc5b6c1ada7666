package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video travel as opaque
  * `binary` columns with a typed metadata struct, processed by
  * executor-side batch functions over `mapPartitions` (the Scala
  * analog of pandas-UDF `mapInPandas` plumbing).
  *
  * The image path is a REAL in-JDK codec: payloads are genuine
  * PNG/JPEG byte streams produced by `javax.imageio.ImageIO.write`
  * and decoded back with `ImageIO.read` on the executors. The raster
  * content is a deterministic arithmetic pattern, which makes the
  * PNG (lossless) decode output analytically verifiable — the
  * q_multimodal_decode oracle recomputes the same mean luma in pure
  * SQL, so a hash match proves the byte-level decode was faithful.
  *
  * 100 TB shape: encode and decode are embarrassingly parallel
  * per-partition batch loops over the opaque binary column; no
  * shuffle is introduced, and the binary payload never feeds a join
  * key. Swap `ImageIO` for ffmpeg/libjpeg-turbo bindings and the
  * plumbing (schema, encoders, partition batching) is unchanged.
  */
object Multimodal {

  // JVM-global, once per process (object init runs on whichever JVM —
  // driver or executor — first touches a codec): in-memory streams
  // only, no tmp-file spill per encode/decode call
  ImageIO.setUseCache(false)

  /** One media row: payload + typed metadata. */
  final case class MediaRow(doc_id: Long, format: String, width: Int, height: Int,
                            n_bytes: Long, payload: Array[Byte])

  /** Extracted payload statistics (opaque-format output schema). */
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                                 mean_byte: Double, first_byte: Int, frames_sampled: Int)

  /** One real image row: compressed PNG/JPEG bytes + identity. */
  final case class ImageRow(doc_id: Long, format: String, payload: Array[Byte])

  /** Decoded image features: dimensions from the codec, mean green-
    * channel luma over all pixels.
    */
  final case class DecodedImage(doc_id: Long, format: String, width: Int, height: Int,
                                n_bytes: Long, mean_luma: Double)

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

  /** Executor-side batch payload statistics for opaque formats the
    * container has no codec for (audio/video/unknown): one partition
    * pass computing byte-level stats. For image formats use
    * [[decodeImages]] — the real codec.
    */
  def decodeFeatures(media: Dataset[MediaRow], frameStride: Int = 1024): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (mean, first, frames) = payloadStats(r.payload, frameStride)
        MediaFeatures(r.doc_id, r.format, r.n_bytes, mean, first, frames)
      }
    }
  }

  /** Byte-level statistics for payloads with no in-container codec:
    * mean byte value, first byte, and a stride-sampled "frame" count.
    */
  private def payloadStats(payload: Array[Byte], frameStride: Int): (Double, Int, Int) = {
    if (payload.isEmpty) (0.0, -1, 0)
    else {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      val frames = (payload.length + frameStride - 1) / frameStride // "frame sample" every stride bytes
      (sum.toDouble / payload.length, payload(0) & 0xff, frames)
    }
  }

  /** Deterministic grayscale raster: pixel (x, y) of doc d has value
    * (d·31 + 7x + 13y) mod 256 — full-range, reproducible, and cheap
    * enough that the oracle can recompute it analytically.
    */
  private def grayAt(docId: Long, x: Int, y: Int): Int =
    java.lang.Math.floorMod(docId * 31 + 7L * x + 13L * y, 256L).toInt

  /** Image dimensions derived from the id (SQL-expressible so the
    * oracle can reproduce them): 16–47 wide, 12–35 tall.
    */
  def imageDims(docId: Long): (Int, Int) =
    ((docId % 32 + 16).toInt, (docId % 24 + 12).toInt)

  /** Encode the deterministic raster for `docId` as real `format`
    * ("png" or "jpeg") bytes via `ImageIO.write`.
    */
  def encodeImage(docId: Long, w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = grayAt(docId, x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, baos), s"no ImageIO writer for $format")
    baos.toByteArray
  }

  /** Render one real compressed image per doc row: even ids → PNG
    * (lossless, oracle-verifiable decode), odd ids → JPEG (lossy,
    * unit-verified decode). Executor-side batch encode over
    * `mapPartitions`; emits genuine codec output bytes.
    */
  def renderImages(docs: DataFrame): Dataset[ImageRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val (w, h) = imageDims(d)
        val fmt = if (d % 2 == 0) "png" else "jpeg"
        ImageRow(d, fmt, encodeImage(d, w, h, fmt))
      }
    }
  }

  /** THE real decode kernel: `ImageIO.read` each payload on the
    * executor, take dimensions from the decoded raster (not metadata)
    * and mean green-channel luma over every pixel. Fails fast on an
    * undecodable payload rather than emitting silent nulls.
    */
  def decodeImages(media: Dataset[ImageRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable ${r.format} payload for doc ${r.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += (img.getRGB(x, y) >> 8) & 0xff; x += 1 }
          y += 1
        }
        DecodedImage(r.doc_id, r.format, w, h, r.payload.length.toLong,
          sum.toDouble / (w.toLong * h))
      }
    }
  }

  /** "Resize" stub: metadata-only transform ([[resizeImages]] is the
    * real raster kernel); shows the partial-column-update shape.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** REAL raster resize: decode each payload, bilinear-resample to
    * `w`×`h` via `Graphics2D.drawImage`, re-encode in the row's own
    * format. Same embarrassingly-parallel partition-batch shape as
    * [[decodeImages]]; payload bytes are genuinely rewritten.
    */
  def resizeImages(media: Dataset[ImageRow], w: Int, h: Int): Dataset[ImageRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val src = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(src != null, s"undecodable ${r.format} payload for doc ${r.doc_id}")
        val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val baos = new ByteArrayOutputStream()
        require(ImageIO.write(dst, r.format, baos), s"no ImageIO writer for ${r.format}")
        ImageRow(r.doc_id, r.format, baos.toByteArray)
      }
    }
  }

  // ---- video-ish: real multi-frame GIF container via ImageIO ----

  /** One clip row: animated-GIF bytes (the multi-frame container the
    * JDK can both write and read). */
  final case class ClipRow(doc_id: Long, n_frames: Int, payload: Array[Byte])

  /** One sampled frame's features. */
  final case class SampledFrame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                                mean_luma: Double)

  /** Frames per clip (SQL-expressible): 4–9. */
  def clipFrames(docId: Long): Int = (docId % 6 + 4).toInt

  /** Frame f's raster extends the image pattern with a time term:
    * pixel (x, y) of frame f of doc d = (31d + 7x + 13y + 97f) mod 256.
    * 256-level grayscale fits a GIF palette exactly, so the container
    * round-trip is lossless and the sampled means are analytically
    * oracle-checkable.
    */
  private def clipGrayAt(docId: Long, x: Int, y: Int, f: Int): Int =
    java.lang.Math.floorMod(docId * 31 + 7L * x + 13L * y + 97L * f, 256L).toInt

  /** Encode a real animated GIF via `ImageIO`'s sequence writer. */
  def encodeGif(docId: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new ByteArrayOutputStream()
    val out = ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, clipGrayAt(docId, x, y, f)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      out.close()
    }
    baos.toByteArray
  }

  /** Render one real animated GIF per doc row ([[imageDims]] sizes). */
  def renderClips(docs: DataFrame): Dataset[ClipRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      ids.map { d =>
        val (w, h) = imageDims(d)
        val n = clipFrames(d)
        ClipRow(d, n, encodeGif(d, w, h, n))
      }
    }
  }

  /** THE frame-sample kernel: open each clip with an `ImageReader`,
    * read every `stride`-th frame (never decoding the skipped ones'
    * pixels), emit per-sampled-frame mean luma. The container parse +
    * per-frame decode happens executor-side in the partition batch —
    * the distributed shape of ffmpeg-based frame extraction.
    */
  def sampleFrames(clips: Dataset[ClipRow], stride: Int = 2): Dataset[SampledFrame] = {
    import clips.sparkSession.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    clips.mapPartitions { rows =>
      rows.flatMap { r =>
        val in = ImageIO.createImageInputStream(new ByteArrayInputStream(r.payload))
        val readers = ImageIO.getImageReaders(in)
        // fail fast with the doc id, matching decodeImages — a bare
        // NoSuchElementException from next() names nothing
        require(readers.hasNext, s"undecodable clip payload for doc ${r.doc_id}")
        val reader = readers.next()
        try {
          reader.setInput(in)
          val n = reader.getNumImages(true)
          (0 until n by stride).map { f =>
            val img = reader.read(f)
            val w = img.getWidth
            val h = img.getHeight
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += (img.getRGB(x, y) >> 8) & 0xff; x += 1 }
              y += 1
            }
            SampledFrame(r.doc_id, f, w, h, sum.toDouble / (w.toLong * h))
          }
        } finally {
          reader.dispose()
          in.close()
        }
      }
    }
  }

  // ---- audio: real WAV codec via javax.sound.sampled (pure JDK) ----

  /** One audio row: RIFF/WAVE bytes (16-bit PCM mono LE). */
  final case class AudioRow(doc_id: Long, payload: Array[Byte])

  /** Decoded audio features — dimensions from the codec (format +
    * frame length), integer sums over the PCM samples so the oracle
    * compare is EXACT (no float path anywhere).
    */
  final case class DecodedAudio(doc_id: Long, sample_rate: Long, n_samples: Long,
                                sum_abs: Long, sum_sq: Long)

  /** Deterministic integer waveform: sample i of doc d is
    * ((d·31 + 7i²) mod 4001) − 2000 ∈ [−2000, 2000] — pure integer
    * arithmetic, so the decoded sums are analytically recomputable in
    * SQL (no libm sin() whose last-ulp could differ across engines).
    */
  def sampleAt(docId: Long, i: Long): Int =
    (java.lang.Math.floorMod(docId * 31 + 7L * i * i, 4001L) - 2000L).toInt

  /** Samples per doc (SQL-expressible): 100–599. */
  def audioLen(docId: Long): Int = (docId % 500 + 100).toInt

  /** Encode the waveform as a real RIFF/WAVE stream via
    * `javax.sound.sampled.AudioSystem` — genuine codec output bytes,
    * not a hand-rolled header.
    */
  def encodeWav(docId: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = sampleAt(docId, i)
      pcm(2 * i) = (s & 0xff).toByte          // little-endian 16-bit
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Render one real WAV per doc row — executor-side batch encode. */
  def renderAudio(docs: DataFrame): Dataset[AudioRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      ids.map(d => AudioRow(d, encodeWav(d, audioLen(d))))
    }
  }

  /** THE real audio decode kernel: `AudioSystem.getAudioInputStream`
    * parses the RIFF/WAVE container on the executor; sample rate and
    * frame count come from the decoded format, and the 16-bit LE PCM
    * frames are summed exactly (Σ|s|, Σs²) — the loudness/energy
    * features an audio-quality gate keys on.
    */
  def decodeAudio(media: Dataset[AudioRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(r.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"unexpected decoded format $fmt for doc ${r.doc_id}")
        val n = ais.getFrameLength.toInt
        val buf = ais.readAllBytes()
        // getFrameLength is NOT_SPECIFIED (-1) for unsized/streamed
        // input, and a truncated payload can deliver fewer PCM bytes
        // than the header promises — either would otherwise surface
        // as a negative loop bound or ArrayIndexOutOfBounds instead
        // of the format error this kernel promises
        require(n >= 0 && buf.length >= 2 * n,
          s"truncated/unsized PCM (frames=$n, bytes=${buf.length}) for doc ${r.doc_id}")
        var sumAbs = 0L
        var sumSq = 0L
        var i = 0
        while (i < n) {
          val s = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
          sumAbs += math.abs(s)
          sumSq += s.toLong * s
          i += 1
        }
        DecodedAudio(r.doc_id, fmt.getSampleRate.toLong, n.toLong, sumAbs, sumSq)
      }
    }
  }
}
