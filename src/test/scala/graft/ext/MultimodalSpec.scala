package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "ab", 2L), (1L, "xyz", 3L), (2L, "", 0L)
  ).toDF("doc_id", "text", "n_chars")

  test("attachPayload: payload is the UTF-8 bytes, metadata deterministic") {
    val m = Multimodal.attachPayload(docs).orderBy("doc_id").collect()
    assert(m(0).getAs[String]("format") === "png")
    assert(m(1).getAs[String]("format") === "jpeg")
    assert(m(2).getAs[String]("format") === "webp")
    assert(m(0).getAs[Array[Byte]]("payload").toSeq === "ab".getBytes("UTF-8").toSeq)
    assert(m(0).getAs[Long]("n_bytes") === 2L)
    assert(m(1).getAs[Int]("width") === 3 % 640 + 64)
  }

  /** Mean of the deterministic raster pattern over doc `d`'s dims. */
  private def analyticMean(d: Long): Double = {
    val (w, h) = Multimodal.imageDims(d)
    (for { x <- 0 until w; y <- 0 until h }
      yield ((d * 31 + 7 * x + 13 * y) % 256).toDouble).sum / (w * h)
  }

  test("decodeImages: PNG decode is bit-faithful to the analytic raster") {
    val d = 4L
    val src = Seq((d, "t", 1L)).toDF("doc_id", "text", "n_chars")
    val out = Multimodal.decodeImages(Multimodal.renderImages(src)).collect().head
    val (w, h) = Multimodal.imageDims(d)
    assert(out.format === "png")
    assert(out.width === w && out.height === h)
    assert(out.n_bytes > 0L)
    assert(out.mean_luma === analyticMean(d)) // PNG is lossless: exact equality
  }

  test("decodeImages: JPEG decode recovers dims exactly, luma approximately") {
    val d = 5L
    val src = Seq((d, "t", 1L)).toDF("doc_id", "text", "n_chars")
    val out = Multimodal.decodeImages(Multimodal.renderImages(src)).collect().head
    val (w, h) = Multimodal.imageDims(d)
    assert(out.format === "jpeg")
    assert(out.width === w && out.height === h) // dims survive lossy coding
    assert(math.abs(out.mean_luma - analyticMean(d)) < 16.0,
      s"jpeg luma ${out.mean_luma} drifted too far from analytic ${analyticMean(d)}")
  }

  test("decodeImages: fails fast on an undecodable payload") {
    val bad = Seq(Multimodal.ImageRow(9L, "png", Array[Byte](1, 2, 3))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(bad).collect()
    }
    assert(e.getMessage.contains("undecodable") ||
      Option(e.getCause).exists(_.getMessage.contains("undecodable")))
  }

  test("sampleFrames: fails fast with the doc id on an undecodable clip payload") {
    // ImageIO.getImageReaders on garbage yields an empty iterator; a
    // bare next() threw NoSuchElementException naming nothing — the
    // guard must surface which doc carried the bad container
    val bad = Seq(Multimodal.ClipRow(42L, 3, Array[Byte](0, 1, 2, 3))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFrames(bad).collect()
    }
    val msgs = e.getMessage +: Option(e.getCause).map(_.getMessage).toSeq
    assert(msgs.exists(m => m.contains("undecodable") && m.contains("42")),
      s"error must name the doc id: $msgs")
  }

  test("decodeAudio: fails fast with the doc id on a truncated WAV payload") {
    // a truncated body delivers fewer PCM bytes than the RIFF header
    // promises; without the frame-count guard the sample loop indexed
    // past the buffer (ArrayIndexOutOfBounds, no doc id)
    val src = Seq((7L, "t", 1L)).toDF("doc_id", "text", "n_chars")
    val good = Multimodal.renderAudio(src).collect().head
    val cut = Multimodal.AudioRow(7L, good.payload.take(good.payload.length - 64))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(Seq(cut).toDS()).collect()
    }
    val msgs = e.getMessage +: Option(e.getCause).map(_.getMessage).toSeq
    assert(msgs.exists(m => m.contains("truncated") && m.contains("7")),
      s"error must name the doc id: $msgs")
  }

  test("resizeImages: payload bytes genuinely rewritten, decode confirms new dims") {
    val src = Seq((4L, "t", 1L)).toDF("doc_id", "text", "n_chars")
    val orig = Multimodal.renderImages(src)
    val resized = Multimodal.resizeImages(orig, 8, 6).collect().head
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized.payload))
    assert(img != null && img.getWidth === 8 && img.getHeight === 6)
    assert(!java.util.Arrays.equals(resized.payload, orig.collect().head.payload))
  }

  test("sampleFrames: GIF container round trip is lossless; stride skips frames") {
    val d = 4L // 7 frames (4 % 6 + 4 = 8? -> 4%6=4, +4 = 8 frames), dims 20x16
    val src = Seq((d, "t", 1L)).toDF("doc_id", "text", "n_chars")
    val out = Multimodal.sampleFrames(Multimodal.renderClips(src), stride = 2)
      .collect().sortBy(_.frame_idx)
    val (w, h) = Multimodal.imageDims(d)
    val n = Multimodal.clipFrames(d)
    assert(out.map(_.frame_idx).toSeq === (0 until n by 2))
    out.foreach { fr =>
      assert(fr.width === w && fr.height === h)
      val expect = (for { x <- 0 until w; y <- 0 until h }
        yield ((d * 31 + 7 * x + 13 * y + 97 * fr.frame_idx) % 256).toDouble).sum / (w * h)
      assert(fr.mean_luma === expect,
        s"frame ${fr.frame_idx}: GIF round trip not lossless (${fr.mean_luma} vs $expect)")
    }
  }

  test("decodeAudio: WAV round trip recovers format and exact PCM sums") {
    val d = 7L
    val src = Seq((d, "t", 1L)).toDF("doc_id", "text", "n_chars")
    val out = Multimodal.decodeAudio(Multimodal.renderAudio(src)).collect().head
    val n = Multimodal.audioLen(d)
    assert(out.sample_rate === 8000L && out.n_samples === n.toLong)
    val samples = (0 until n).map(i => Multimodal.sampleAt(d, i.toLong))
    assert(out.sum_abs === samples.map(s => math.abs(s).toLong).sum)
    assert(out.sum_sq === samples.map(s => s.toLong * s).sum)
  }

  test("decodeFeatures: partition-batched payload stats for opaque formats") {
    val media = Multimodal.attachPayload(docs).as[Multimodal.MediaRow]
    val f = Multimodal.decodeFeatures(media, frameStride = 2).collect()
      .map(r => r.doc_id -> r).toMap
    assert(f(0L).mean_byte === (97 + 98) / 2.0) // "ab"
    assert(f(0L).first_byte === 97)
    assert(f(0L).frames_sampled === 1) // 2 bytes / stride 2
    assert(f(1L).frames_sampled === 2) // 3 bytes / stride 2 → ceil
    assert(f(2L).mean_byte === 0.0 && f(2L).first_byte === -1 && f(2L).frames_sampled === 0)
  }

  test("resize: metadata-only transform preserves payload") {
    val r = Multimodal.resize(Multimodal.attachPayload(docs), 100, 50)
      .orderBy("doc_id").collect()
    assert(r.forall(_.getAs[Int]("width") === 100))
    assert(r.forall(_.getAs[Int]("height") === 50))
    assert(r(1).getAs[Array[Byte]]("payload").toSeq === "xyz".getBytes("UTF-8").toSeq)
  }
}
