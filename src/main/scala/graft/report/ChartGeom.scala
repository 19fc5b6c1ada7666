package graft.report

/** Shared plot geometry for the S11 report chart renderers
  * ([[SvgChart]], [[PngChart]]): identical padding, y-range fitting
  * (5% headroom over the defined values), and data→pixel mapping, so
  * the vector and raster artifacts of the same window are the same
  * picture.
  */
private[report] final case class ChartGeom(w: Int, h: Int, nDates: Int,
                                           defined: Seq[Double]) {
  val padL = 70; val padR = 20; val padT = 40; val padB = 40
  val plotW: Int = w - padL - padR
  val plotH: Int = h - padT - padB
  val (lo, hi): (Double, Double) =
    if (defined.isEmpty) (0.0, 1.0)
    else {
      val l = defined.min; val u = defined.max
      if (u == l) (l - 1, u + 1) else (l - (u - l) * 0.05, u + (u - l) * 0.05)
    }
  def x(i: Int): Double =
    padL + (if (nDates == 1) plotW / 2.0 else plotW * i.toDouble / (nDates - 1))
  def y(v: Double): Double = padT + plotH * (1.0 - (v - lo) / (hi - lo))
  def fmt(d: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, d)
}

object ChartGeom {
  /** matplotlib's default category10 cycle, shared by both renderers. */
  val SeriesColors: Seq[Int] = Seq(0x1f77b4, 0xff7f0e, 0x2ca02c, 0xd62728)
}
