package graft.report

/** Minimal deterministic SVG line-chart renderer — the vector form of
  * the S11 artifact sink (reference dag_btc_daily.py:300-371 renders
  * the same 60-day close/ma7/ma30 window with matplotlib savefig;
  * [[PngChart]] is the raster-parity form, this is the dependency-free
  * vector one). Geometry shared via [[ChartGeom]]. Pure string
  * assembly over an ALREADY-COLLECTED, bounded report window (≤ 61
  * rows) — never a distributed operation.
  */
object SvgChart {

  private def hex(c: Int): String = f"#$c%06x"

  /** Render `series` (name → per-date optional values, all aligned to
    * `dates`) as polylines with a y-range fitted to the defined
    * values, x/y extreme labels, and a legend.
    */
  def lineChart(dates: Seq[String], series: Seq[(String, Seq[Option[Double]])],
                title: String, w: Int = 980, h: Int = 420): String = {
    require(dates.nonEmpty, "empty report window")
    val g = ChartGeom(w, h, dates.size, series.flatMap(_._2.flatten))
    import g.{fmt, lo, hi, padL, padT, plotW, plotH}

    val polylines = series.zipWithIndex.map { case ((name, vals), si) =>
      val pts = vals.zipWithIndex.collect { case (Some(v), i) => s"${fmt(g.x(i))},${fmt(g.y(v))}" }
      s"""<polyline fill="none" stroke="${hex(ChartGeom.SeriesColors(si % ChartGeom.SeriesColors.size))}" stroke-width="1.5" points="${pts.mkString(" ")}"><title>$name</title></polyline>"""
    }
    val legend = series.zipWithIndex.map { case ((name, _), si) =>
      val lx = padL + si * 110
      s"""<rect x="$lx" y="${h - 18}" width="10" height="10" fill="${hex(ChartGeom.SeriesColors(si % ChartGeom.SeriesColors.size))}"/>""" +
        s"""<text x="${lx + 14}" y="${h - 9}" font-size="11" font-family="sans-serif">$name</text>"""
    }
    val axis =
      s"""<line x1="$padL" y1="$padT" x2="$padL" y2="${padT + plotH}" stroke="#999"/>
         |<line x1="$padL" y1="${padT + plotH}" x2="${padL + plotW}" y2="${padT + plotH}" stroke="#999"/>
         |<text x="${padL - 6}" y="${fmt(g.y(hi) + 4)}" font-size="10" text-anchor="end" font-family="sans-serif">${fmt(hi)}</text>
         |<text x="${padL - 6}" y="${fmt(g.y(lo) + 4)}" font-size="10" text-anchor="end" font-family="sans-serif">${fmt(lo)}</text>
         |<text x="$padL" y="${padT + plotH + 16}" font-size="10" font-family="sans-serif">${dates.head}</text>
         |<text x="${padL + plotW}" y="${padT + plotH + 16}" font-size="10" text-anchor="end" font-family="sans-serif">${dates.last}</text>""".stripMargin
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">
       |<rect width="$w" height="$h" fill="white"/>
       |<text x="${w / 2}" y="24" font-size="14" text-anchor="middle" font-family="sans-serif">$title</text>
       |$axis
       |${polylines.mkString("\n")}
       |${legend.mkString("\n")}
       |</svg>
       |""".stripMargin
  }
}
