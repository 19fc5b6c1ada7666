package graft.report

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.geom.Line2D
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Raster PNG line-chart renderer — byte-level parity with the
  * reference's `matplotlib savefig(...png)` artifact (reference
  * dag_btc_daily.py:300-371), drawn with `java.awt.Graphics2D` and
  * encoded by `javax.imageio` (the same in-JDK codec the multimodal
  * operators use). Geometry is shared with [[SvgChart]] via
  * [[ChartGeom]], so the PNG and SVG artifacts of one window are the
  * same picture. Pure driver-side rendering over an
  * ALREADY-COLLECTED, bounded report window (≤ 61 rows) — never a
  * distributed operation.
  */
object PngChart {

  /** Render `series` (name → per-date optional values, all aligned to
    * `dates`) as a PNG byte array: white background, title, axes with
    * extreme labels, one polyline per series, legend.
    */
  def lineChart(dates: Seq[String], series: Seq[(String, Seq[Option[Double]])],
                title: String, w: Int = 980, h: Int = 420): Array[Byte] = {
    require(dates.nonEmpty, "empty report window")
    val g2d = ChartGeom(w, h, dates.size, series.flatMap(_._2.flatten))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, w, h)
      // text is best-effort: a fontless container must not take down
      // the chart — axes and series carry the analytic content
      def text(s: String, x: Float, y: Float, size: Int, anchor: String = "start"): Unit =
        try {
          g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, size))
          val fm = g.getFontMetrics
          val tx = anchor match {
            case "end"    => x - fm.stringWidth(s)
            case "middle" => x - fm.stringWidth(s) / 2f
            case _        => x
          }
          g.drawString(s, tx, y)
        } catch { case _: Throwable => () }
      g.setColor(Color.BLACK)
      text(title, w / 2f, 24f, 14, "middle")
      // axes
      g.setColor(new Color(0x999999))
      g.setStroke(new BasicStroke(1f))
      g.draw(new Line2D.Double(g2d.padL, g2d.padT, g2d.padL, g2d.padT + g2d.plotH))
      g.draw(new Line2D.Double(g2d.padL, g2d.padT + g2d.plotH,
        g2d.padL + g2d.plotW, g2d.padT + g2d.plotH))
      g.setColor(Color.BLACK)
      text(g2d.fmt(g2d.hi), g2d.padL - 6f, (g2d.y(g2d.hi) + 4).toFloat, 10, "end")
      text(g2d.fmt(g2d.lo), g2d.padL - 6f, (g2d.y(g2d.lo) + 4).toFloat, 10, "end")
      text(dates.head, g2d.padL.toFloat, g2d.padT + g2d.plotH + 16f, 10)
      text(dates.last, (g2d.padL + g2d.plotW).toFloat, g2d.padT + g2d.plotH + 16f, 10, "end")
      // series polylines
      g.setStroke(new BasicStroke(1.5f, BasicStroke.CAP_ROUND, BasicStroke.JOIN_ROUND))
      series.zipWithIndex.foreach { case ((_, vals), si) =>
        g.setColor(new Color(ChartGeom.SeriesColors(si % ChartGeom.SeriesColors.size)))
        val pts = vals.zipWithIndex.collect { case (Some(v), i) => (g2d.x(i), g2d.y(v)) }
        pts.sliding(2).foreach {
          case Seq((x1, y1), (x2, y2)) => g.draw(new Line2D.Double(x1, y1, x2, y2))
          case _ => () // a single defined point draws no segment (same as SVG)
        }
      }
      // legend
      series.zipWithIndex.foreach { case ((name, _), si) =>
        val lx = g2d.padL + si * 110
        g.setColor(new Color(ChartGeom.SeriesColors(si % ChartGeom.SeriesColors.size)))
        g.fillRect(lx, h - 18, 10, 10)
        g.setColor(Color.BLACK)
        text(name, lx + 14f, h - 9f, 11)
      }
    } finally g.dispose()
    val baos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    require(ImageIO.write(img, "png", baos), "no ImageIO PNG writer")
    baos.toByteArray
  }
}
