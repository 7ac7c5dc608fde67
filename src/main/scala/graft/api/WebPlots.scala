package graft.api

import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Self-contained HTML chart emitters — the web half of the reference's
  * plotting module (src/DataFrame/Display/Web/Plot.hs:102-1008). The
  * reference emits Chart.js canvases that fetch the library from a CDN;
  * here each chart is a single HTML document with INLINE SVG — no
  * external script, so the file renders offline, in CI artifacts, and
  * in air-gapped clusters (the 100 TB deployments these reports come
  * from rarely have an internet-facing browser).
  *
  * Same division of labor as [[Plots]]: the distributed side is the
  * plot-DATA surfaces ([[Frame.histogram]], [[Stats.scatterData]],
  * [[Stats.linesData]], grouped counts); the emitter collects only the
  * bounded result and does string work. Output is deterministic (fixed
  * palette, Locale.ROOT number formatting) so goldens can pin it.
  */
object WebPlots {

  private val palette = Seq("#4bc0c0", "#ff6384", "#36a2eb", "#ffce56",
    "#9966ff", "#ff9f40", "#c9cbcf", "#2ecc71")

  private def num(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else String.format(Locale.ROOT, "%.2f", Double.box(v))

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def doc(title: String, svg: String): String =
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title></head>
       |<body style="font-family:sans-serif">
       |<h3>${esc(title)}</h3>
       |$svg
       |</body></html>
       |""".stripMargin

  private val W = 640
  private val H = 400
  private val Pad = 50

  private def svgOpen = s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H">"""

  private def axes(xMin: Double, xMax: Double, yMin: Double, yMax: Double): String = {
    val x0 = Pad; val x1 = W - Pad; val y0 = H - Pad; val y1 = Pad
    s"""<line x1="$x0" y1="$y0" x2="$x1" y2="$y0" stroke="black"/>
       |<line x1="$x0" y1="$y0" x2="$x0" y2="$y1" stroke="black"/>
       |<text x="$x0" y="${y0 + 20}" font-size="12">${num(xMin)}</text>
       |<text x="$x1" y="${y0 + 20}" font-size="12" text-anchor="end">${num(xMax)}</text>
       |<text x="${x0 - 5}" y="$y0" font-size="12" text-anchor="end">${num(yMin)}</text>
       |<text x="${x0 - 5}" y="${y1 + 5}" font-size="12" text-anchor="end">${num(yMax)}</text>""".stripMargin
  }

  private def sx(v: Double, lo: Double, hi: Double): Double =
    Pad + (v - lo) / math.max(hi - lo, 1e-300) * (W - 2 * Pad)
  private def sy(v: Double, lo: Double, hi: Double): Double =
    (H - Pad) - (v - lo) / math.max(hi - lo, 1e-300) * (H - 2 * Pad)

  /** `plotHistogram` (Web/Plot.hs:102-168): vertical bars over
    * [[Frame.histogram]]'s distributed equi-width bins. */
  def htmlHistogram(df: DataFrame, col: String, bins: Int = 30,
                    title: String = ""): String = {
    val rows = new Frame(df).histogram(col, bins).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val t = if (title.nonEmpty) title else s"Histogram of $col"
    if (rows.isEmpty) return doc(t, s"$svgOpen</svg>")
    val maxN = rows.map(_._4).max.toDouble
    val bw = (W - 2 * Pad).toDouble / bins
    val bars = rows.map { case (bin, lo, _, n) =>
      val h = n / maxN * (H - 2 * Pad)
      val x = Pad + bin * bw
      val y = (H - Pad) - h
      s"""<rect x="${num(x)}" y="${num(y)}" width="${num(bw * 0.95)}" height="${num(h)}" fill="${palette.head}"><title>[${num(lo)}, n=$n]</title></rect>"""
    }.mkString("\n")
    val xLo = rows.map(_._2).min; val xHi = rows.map(_._3).max
    doc(t, s"$svgOpen\n${axes(xLo, xHi, 0, maxN)}\n$bars\n</svg>")
  }

  /** `plotScatter` / `plotScatterBy` (Web/Plot.hs:171-312): one circle
    * per point, color per group, legend. Points ride
    * [[Stats.scatterData]] (hash-thinned, then capped). */
  def htmlScatter(df: DataFrame, x: String, y: String,
                  group: Option[String] = None,
                  samplePct: Double = 100.0, maxPoints: Int = 5000,
                  title: String = ""): String = {
    val data = Stats.scatterData(df, x, y, group, samplePct).take(maxPoints)
    val t = if (title.nonEmpty) title else s"$x vs $y"
    if (data.isEmpty) return doc(t, s"$svgOpen</svg>")
    val pts = data.map(r => (r.getDouble(0), r.getDouble(1),
      if (group.isDefined) Option(r.get(2)).map(_.toString).getOrElse("null") else t))
    val (xLo, xHi) = (pts.map(_._1).min, pts.map(_._1).max)
    val (yLo, yHi) = (pts.map(_._2).min, pts.map(_._2).max)
    val groups = pts.map(_._3).distinct.sorted
    val colorOf = groups.zipWithIndex.map { case (g, i) =>
      g -> palette(i % palette.length) }.toMap
    val circles = pts.map { case (px, py, g) =>
      s"""<circle cx="${num(sx(px, xLo, xHi))}" cy="${num(sy(py, yLo, yHi))}" r="3" fill="${colorOf(g)}" fill-opacity="0.7"/>"""
    }.mkString("\n")
    val legend = legendSvg(groups.map(g => g -> colorOf(g)))
    doc(t, s"$svgOpen\n${axes(xLo, xHi, yLo, yHi)}\n$circles\n$legend</svg>")
  }

  /** `plotLines` (Web/Plot.hs:314-386): one polyline per y column over
    * [[Stats.linesData]]'s long format, ordered by x. */
  def htmlLines(df: DataFrame, x: String, ys: Seq[String],
                maxPoints: Int = 5000, title: String = ""): String = {
    val data = Stats.linesData(df, x, ys).take(maxPoints)
    val t = if (title.nonEmpty) title else ys.mkString(", ")
    if (data.isEmpty) return doc(t, s"$svgOpen</svg>")
    val rows = data.map(r => (anyToDouble(r.get(0)), r.getString(1),
      if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .filterNot(_._3.isNaN)
    val (xLo, xHi) = (rows.map(_._1).min, rows.map(_._1).max)
    val (yLo, yHi) = (rows.map(_._3).min, rows.map(_._3).max)
    val lines = ys.zipWithIndex.map { case (s, i) =>
      val pts = rows.filter(_._2 == s).sortBy(_._1)
        .map { case (px, _, pv) =>
          s"${num(sx(px, xLo, xHi))},${num(sy(pv, yLo, yHi))}" }
        .mkString(" ")
      s"""<polyline points="$pts" fill="none" stroke="${palette(i % palette.length)}" stroke-width="2"/>"""
    }.mkString("\n")
    val legend = legendSvg(ys.zipWithIndex.map { case (s, i) =>
      s -> palette(i % palette.length) })
    doc(t, s"$svgOpen\n${axes(xLo, xHi, yLo, yHi)}\n$lines\n$legend</svg>")
  }

  /** `plotBars`/`plotValueCounts` (Web/Plot.hs:388-487): horizontal
    * bars of the top-n grouped counts + the reference's "Other" fold. */
  def htmlBars(df: DataFrame, name: String, n: Int = 10,
               title: String = ""): String = {
    val counts = df.groupBy(F.col(name).cast("string").as("label"))
      .agg(F.count(F.lit(1)).cast("double").as("n"))
      .collect().map(r => (Option(r.getString(0)).getOrElse("null"), r.getDouble(1))).toSeq
    val items = Plots.groupWithOther(n, counts)
    val t = if (title.nonEmpty) title else s"Value counts for $name"
    if (items.isEmpty) return doc(t, s"$svgOpen</svg>")
    val maxV = items.map(_._2).max
    val rowH = (H - 2 * Pad).toDouble / items.size
    val bars = items.zipWithIndex.map { case ((label, v), i) =>
      val w = v / maxV * (W - 2 * Pad - 120)
      val y = Pad + i * rowH
      s"""<text x="${Pad + 115}" y="${num(y + rowH * 0.6)}" font-size="12" text-anchor="end">${esc(label)}</text>
         |<rect x="${Pad + 120}" y="${num(y + rowH * 0.1)}" width="${num(w)}" height="${num(rowH * 0.8)}" fill="${palette(i % palette.length)}"/>
         |<text x="${num(Pad + 125 + w)}" y="${num(y + rowH * 0.6)}" font-size="12">${num(v)}</text>""".stripMargin
    }.mkString("\n")
    doc(t, s"$svgOpen\n$bars\n</svg>")
  }

  /** `plotPie` (Web/Plot.hs:489-592): SVG arc slices clockwise from 12
    * o'clock, ≤ maxSlices + the "Other (k items, p%)" fold, legend with
    * value and percent. */
  def htmlPie(df: DataFrame, name: String, maxSlices: Int = 8,
              title: String = ""): String = {
    val counts = df.groupBy(F.col(name).cast("string").as("label"))
      .agg(F.count(F.lit(1)).cast("double").as("n"))
      .collect().map(r => (Option(r.getString(0)).getOrElse("null"), r.getDouble(1))).toSeq
    val items = Plots.groupWithOtherForPie(maxSlices, counts)
    val t = if (title.nonEmpty) title else s"Distribution of $name"
    if (items.isEmpty) return doc(t, s"$svgOpen</svg>")
    val total = items.map(_._2).sum
    val cx = H / 2.0; val cy = H / 2.0; val r = H / 2.0 - Pad
    def point(frac: Double): (Double, Double) = {
      val a = frac * 2 * math.Pi - math.Pi / 2 // clockwise from 12 o'clock
      (cx + r * math.cos(a), cy + r * math.sin(a))
    }
    val slices = items.zipWithIndex
      .foldLeft((0.0, List.empty[String])) { case ((start, acc), ((label, v), i)) =>
        val end = start + v / total
        val (x1, y1) = point(start)
        val (x2, y2) = point(end)
        val large = if (end - start > 0.5) 1 else 0
        val path =
          if (end - start >= 0.999999) // single-slice: a full circle, arcs degenerate
            s"""<circle cx="${num(cx)}" cy="${num(cy)}" r="${num(r)}" fill="${palette(i % palette.length)}"><title>${esc(label)}</title></circle>"""
          else
            s"""<path d="M ${num(cx)} ${num(cy)} L ${num(x1)} ${num(y1)} A ${num(r)} ${num(r)} 0 $large 1 ${num(x2)} ${num(y2)} Z" fill="${palette(i % palette.length)}"><title>${esc(label)}</title></path>"""
        (end, path :: acc)
      }._2.reverse.mkString("\n")
    val legend = legendSvg(items.zipWithIndex.map { case ((label, v), i) =>
      val pct = math.round(v / total * 100)
      s"$label: ${num(v)} ($pct%)" -> palette(i % palette.length)
    }, xOff = H)
    doc(t, s"$svgOpen\n$slices\n$legend</svg>")
  }

  private def legendSvg(entries: Seq[(String, String)], xOff: Int = W - 160): String =
    entries.zipWithIndex.map { case ((label, color), i) =>
      val y = Pad + i * 18
      s"""<rect x="$xOff" y="$y" width="12" height="12" fill="$color"/>
         |<text x="${xOff + 16}" y="${y + 10}" font-size="12">${esc(label)}</text>""".stripMargin
    }.mkString("\n")

  private def anyToDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toDouble
    case ts: java.sql.Timestamp => ts.getTime.toDouble
    case other => other.toString.toDouble
  }

  /** write a chart to disk (driver-side, one small file). */
  def save(path: String, html: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), html)
}
