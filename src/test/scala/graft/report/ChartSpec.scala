package graft.report

import org.scalatest.funsuite.AnyFunSuite

/** Golden-image pin for the raster report chart (verdict r7 #8): the
  * PipelineSpec geometry checks catch gross breakage (size, background,
  * series ink), but a silent rendering regression — a shifted axis, a
  * recolored series, a dropped legend — changes none of those. Pinning
  * the rendered output's hash on a fixed fixture catches ANY visual
  * change. Two pins, coarse to fine:
  *  - the decoded PIXEL raster hash: the picture itself, invariant to
  *    PNG encoder details — this is the one that means "the chart
  *    changed";
  *  - the encoded PNG byte hash: additionally pins the in-JDK encoder
  *    output (the artifact the reference's savefig parity is judged
  *    on). If this one ever drifts alone (pixels green, bytes red),
  *    the JDK's encoder changed, not the chart — re-pin it.
  * Like any golden-image test, BOTH pins also freeze the host's text
  * rasterization: Font.SANS_SERIF resolves to whatever font stack the
  * container ships, and glyph antialiasing varies by JDK build. On a
  * font-stack or JDK change, both hashes fail together with the chart
  * unchanged — that is environment drift, not a regression: eyeball
  * one render, then re-pin both. Within one environment (this repo's
  * pinned container/JDK) the pins are exact regression tripwires.
  * Pure JVM — no Spark; the renderer is driver-side by design.
  */
class ChartSpec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  private def fixtureChart(): Array[Byte] = {
    // deterministic 30-day window exercising every render path: a full
    // series, a min_periods-gated partial series, an all-null series
    // (legend entry with no polyline points)
    val dates = (1 to 30).map(d => f"2024-01-$d%02d")
    val close = (1 to 30).map(d => Some(100.0 + 7 * math.sin(d / 3.0) + d * 0.5))
    val ma7 = (1 to 30).map(d => if (d < 7) None else Some(100.0 + d * 0.45))
    val ma30 = (1 to 30).map(_ => None: Option[Double])
    PngChart.lineChart(dates,
      Seq("close" -> close, "ma7" -> ma7, "ma30" -> ma30), "BTC-USD 60-day report")
  }

  test("PNG chart golden hashes: pixel raster and encoded bytes are pinned") {
    val png = fixtureChart()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val px = java.nio.ByteBuffer.allocate(img.getWidth * img.getHeight * 4)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) px.putInt(img.getRGB(x, y))
    assert(md5(px.array()) === "9a3b96d96b42bb6abbdbebe2078c0539",
      "the rendered chart picture changed — if intentional, re-pin both hashes")
    assert(md5(png) === "1fbacda87b4ca4d2e552d7746b7710e9",
      "the encoded PNG bytes changed — encoder drift if the pixel pin still passes")
  }

  test("rendering is deterministic: two renders of the fixture are byte-identical") {
    assert(md5(fixtureChart()) === md5(fixtureChart()))
  }
}
