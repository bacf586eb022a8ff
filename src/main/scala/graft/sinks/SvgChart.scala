package graft.sinks

/** Tiny deterministic SVG chart writer — the reference's TODO "graph
  * module to extract data and create a chart" (/root/reference/TODO:
  * final item), with SVG instead of gnuplot/graphviz so the output is
  * a self-contained text file with zero dependencies.
  *
  * Charts are driver-side BY DESIGN: a chart is a bounded visual
  * artifact (the pipeline module enforces a hard point cap before
  * collecting), so this is rendering, not data processing — all
  * aggregation/sampling happens upstream in the distributed plan.
  */
object SvgChart {

  private val W = 640
  private val H = 360
  private val MarginL = 56
  private val MarginR = 16
  private val MarginT = 34
  private val MarginB = 48

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def fmt(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString
    else f"$v%.2f"

  /** Nice y-axis bounds: [min(0, lo), max(0, hi)] split into 5 ticks. */
  private def yTicks(lo: Double, hi: Double): (Double, Double, Seq[Double]) = {
    val bottom = math.min(0.0, lo)
    val top = if (math.max(0.0, hi) == bottom) bottom + 1.0 else math.max(0.0, hi)
    val step = (top - bottom) / 5.0
    (bottom, top, (0 to 5).map(i => bottom + i * step))
  }

  /** Shared frame: title, axes, y grid+labels, sampled x labels. */
  private def frame(title: String, labels: Seq[String], lo: Double,
                    hi: Double, body: String): String = {
    val (b, t, ticks) = yTicks(lo, hi)
    val plotH = H - MarginT - MarginB
    val plotW = W - MarginL - MarginR
    def yPix(v: Double): Double = MarginT + plotH * (t - v) / (t - b)
    val grid = ticks.map { v =>
      val y = yPix(v)
      f"""<line x1="$MarginL" y1="$y%.1f" x2="${W - MarginR}" y2="$y%.1f" stroke="#ddd"/>
         |<text x="${MarginL - 6}" y="${y + 4}%.1f" text-anchor="end" font-size="11">${esc(fmt(v))}</text>""".stripMargin
    }.mkString("\n")
    // at most 12 x labels, evenly sampled, to stay readable
    val stride = math.max(1, math.ceil(labels.size / 12.0).toInt)
    val xLabels = labels.zipWithIndex.collect {
      case (lab, i) if i % stride == 0 =>
        val x = MarginL + plotW * (i + 0.5) / math.max(1, labels.size)
        f"""<text x="$x%.1f" y="${H - MarginB + 16}" text-anchor="middle" font-size="11">${esc(lab.take(12))}</text>"""
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H">
       |<rect width="$W" height="$H" fill="white"/>
       |<text x="${W / 2}" y="20" text-anchor="middle" font-size="14" font-weight="bold">${esc(title)}</text>
       |$grid
       |<line x1="$MarginL" y1="$MarginT" x2="$MarginL" y2="${H - MarginB}" stroke="#333"/>
       |<line x1="$MarginL" y1="${yPix(math.max(b, math.min(0.0, t)))}" x2="${W - MarginR}" y2="${yPix(math.max(b, math.min(0.0, t)))}" stroke="#333"/>
       |$body
       |$xLabels
       |</svg>
       |""".stripMargin
  }

  private def yScale(lo: Double, hi: Double): Double => Double = {
    val (b, t, _) = yTicks(lo, hi)
    val plotH = H - MarginT - MarginB
    v => MarginT + plotH * (t - v) / (t - b)
  }

  /** Vertical bar chart: one `<rect>` per (label, value) in order. */
  def bar(points: Seq[(String, Double)], title: String): String = {
    if (points.isEmpty) return frame(title, Nil, 0, 1, "")
    val lo = points.map(_._2).min
    val hi = points.map(_._2).max
    val yp = yScale(lo, hi)
    val plotW = W - MarginL - MarginR
    val slot = plotW.toDouble / points.size
    val bw = math.max(1.0, slot * 0.8)
    val bars = points.zipWithIndex.map { case ((_, v), i) =>
      val x = MarginL + i * slot + (slot - bw) / 2
      val y0 = yp(0.0); val y1 = yp(v)
      val top = math.min(y0, y1); val hgt = math.abs(y0 - y1)
      f"""<rect x="$x%.1f" y="$top%.1f" width="$bw%.1f" height="$hgt%.1f" fill="#4878a8"/>"""
    }.mkString("\n")
    frame(title, points.map(_._1), lo, hi, bars)
  }

  /** Line chart: a single `<polyline>` through the points in order. */
  def line(points: Seq[(String, Double)], title: String): String = {
    if (points.isEmpty) return frame(title, Nil, 0, 1, "")
    val lo = points.map(_._2).min
    val hi = points.map(_._2).max
    val yp = yScale(lo, hi)
    val plotW = W - MarginL - MarginR
    val pts = points.zipWithIndex.map { case ((_, v), i) =>
      val x = MarginL + plotW * (i + 0.5) / points.size
      f"$x%.1f,${yp(v)}%.1f"
    }.mkString(" ")
    val poly =
      s"""<polyline points="$pts" fill="none" stroke="#4878a8" stroke-width="2"/>"""
    frame(title, points.map(_._1), lo, hi, poly)
  }
}
