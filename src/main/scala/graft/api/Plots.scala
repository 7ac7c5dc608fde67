package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Driver-side ASCII renderers over the engine's plot-DATA surfaces —
  * the terminal half of the reference's plotting module
  * (src/DataFrame/Display/Terminal/Plot.hs:56-587, whose glyph work is
  * delegated to the external Granite library; parity here is shape, not
  * glyph-exact). Every renderer collects only a BOUNDED result: grouped
  * counts (≤ distinct categories), box statistics (≤ groups), or a
  * point sample capped by `maxPoints` — the distributed heavy lifting
  * (grouping, sampling, binning) happens in the data surfaces
  * ([[Frame.barsTopN]], [[Stats.scatterData]], [[Stats.linesData]],
  * [[Stats.boxPlotStats]]), so rendering a 100 TB table is the same
  * cost as rendering 1 GB: one small collect.
  */
object Plots {

  /** top-n by value, remainder folded into "Other (k items)" —
    * reference `groupWithOther` (Display/Terminal/Plot.hs:560-570).
    * Ties break by label so reruns render identically. */
  def groupWithOther(n: Int, items: Seq[(String, Double)]): Seq[(String, Double)] = {
    val sorted = items.sortBy { case (l, v) => (-v, l) }
    val (top, rest) = sorted.splitAt(n)
    val otherSum = rest.map(_._2).sum
    if (rest.isEmpty || otherSum == 0) top
    else top :+ (s"Other (${rest.size} items)", otherSum)
  }

  /** [[groupWithOther]] with the percent baked into the label —
    * reference `groupWithOtherForPie` (Plot.hs:572-587). */
  def groupWithOtherForPie(n: Int, items: Seq[(String, Double)]): Seq[(String, Double)] = {
    val total = items.map(_._2).sum
    val sorted = items.sortBy { case (l, v) => (-v, l) }
    val (top, rest) = sorted.splitAt(n)
    val otherSum = rest.map(_._2).sum
    if (rest.isEmpty || otherSum == 0) top
    else {
      val pct = math.round(100.0 * otherSum / total)
      top :+ (s"Other (${rest.size} items, $pct%)", otherSum)
    }
  }

  private val glyphs = "*+ox#@%&"

  /** horizontal labeled bar chart of label→value pairs (the shared
    * renderer behind `plotBars`/`plotBarsTopN`/`plotValueCounts`). */
  def renderBars(items: Seq[(String, Double)], width: Int = 40): String = {
    if (items.isEmpty) return "(empty)"
    val maxV = items.map(_._2).max
    val lw = items.map(_._1.length).max
    items.map { case (label, v) =>
      val bar = "#" * math.max(if (v > 0) 1 else 0,
        math.round(v / math.max(maxV, 1e-300) * width).toInt)
      val num = if (v == math.rint(v)) v.toLong.toString else f"$v%.2f"
      s"${label.padTo(lw, ' ')} | $bar $num"
    }.mkString("\n")
  }

  /** `plotBarsTopN` end-to-end: grouped counts (distributed), top-n +
    * Other fold, bar render (Plot.hs:213-231). */
  def asciiBarsTopN(df: DataFrame, name: String, n: Int = 10,
                    width: Int = 40): String = {
    val counts = df.groupBy(F.col(name).cast("string").as("label"))
      .agg(F.count(F.lit(1)).cast("double").as("n"))
      .collect().map(r => (Option(r.getString(0)).getOrElse("null"), r.getDouble(1))).toSeq
    renderBars(groupWithOther(n, counts), width)
  }

  /** character grid shared by scatter and line plots: points land on a
    * width×height canvas scaled to the data bounds, y up, one glyph per
    * series (later series overdraw earlier on collision). Frame is
    * drawn with `|`/`-`/`+`; min/max axis labels on the left and
    * bottom. */
  private def renderGrid(series: Seq[(String, Seq[(Double, Double)])],
                         width: Int, height: Int): String = {
    val pts = series.flatMap(_._2)
    if (pts.isEmpty) return "(empty)"
    val (xs, ys) = (pts.map(_._1), pts.map(_._2))
    val (xMin, xMax) = (xs.min, xs.max)
    val (yMin, yMax) = (ys.min, ys.max)
    def colOf(x: Double) =
      if (xMax == xMin) width / 2
      else math.min(width - 1, ((x - xMin) / (xMax - xMin) * (width - 1)).round.toInt)
    def rowOf(y: Double) =
      if (yMax == yMin) height / 2
      else math.min(height - 1, ((y - yMin) / (yMax - yMin) * (height - 1)).round.toInt)
    val grid = Array.fill(height, width)(' ')
    series.zipWithIndex.foreach { case ((_, ps), i) =>
      val g = glyphs(i % glyphs.length)
      ps.foreach { case (x, y) => grid(rowOf(y))(colOf(x)) = g }
    }
    val yLabW = 10
    val rows = (height - 1 to 0 by -1).map { r =>
      val lbl = if (r == height - 1) f"$yMax%10.2f" else if (r == 0) f"$yMin%10.2f"
        else " " * yLabW
      s"$lbl |${grid(r).mkString}".replaceFirst("\\s+$", "")
    }
    val axis = " " * yLabW + " +" + "-" * width
    val xLbl = " " * (yLabW + 2) + f"$xMin%.2f" +
      " " * math.max(1, width - f"$xMin%.2f".length - f"$xMax%.2f".length) +
      f"$xMax%.2f"
    val legend =
      if (series.size <= 1) Nil
      else Seq(series.zipWithIndex.map { case ((name, _), i) =>
        s"${glyphs(i % glyphs.length)} $name" }.mkString("  "))
    (rows ++ Seq(axis, xLbl) ++ legend).mkString("\n")
  }

  /** `plotScatter` / `plotScatterBy` (Plot.hs:66-92): xy point cloud,
    * one glyph per group. The distributed side is
    * [[Stats.scatterData]] (hash-thinned by `samplePct`); the collect
    * is additionally capped at `maxPoints` rows. */
  def asciiScatter(df: DataFrame, x: String, y: String,
                   group: Option[String] = None,
                   width: Int = 60, height: Int = 20,
                   samplePct: Double = 100.0,
                   maxPoints: Int = 10000): String = {
    val data = Stats.scatterData(df, x, y, group, samplePct).take(maxPoints)
    val series: Seq[(String, Seq[(Double, Double)])] = group match {
      case None => Seq(s"$x vs $y" -> data.map(r => (r.getDouble(0), r.getDouble(1))).toSeq)
      case Some(_) =>
        data.map(r => (Option(r.get(2)).map(_.toString).getOrElse("null"),
            (r.getDouble(0), r.getDouble(1))))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
          .toSeq.sortBy(_._1)
    }
    renderGrid(series, width, height)
  }

  /** `plotLines` (Plot.hs:94-104): each y column is a series over the
    * x column, one glyph per series, same canvas as scatter (ASCII
    * point-per-sample; the reference's Granite backend draws braille
    * segments — shape parity, not glyph parity). */
  def asciiLines(df: DataFrame, x: String, ys: Seq[String],
                 width: Int = 60, height: Int = 20,
                 maxPoints: Int = 10000): String = {
    val data = Stats.linesData(df, x, ys).take(maxPoints)
    val series = ys.map { s =>
      s -> data.filter(_.getString(1) == s)
        .map(r => (toDouble(r.get(0)), r.getDouble(2))).toSeq
    }
    renderGrid(series, width, height)
  }

  private def toDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toDouble
    case t: java.sql.Timestamp => t.getTime.toDouble
    case other => other.toString.toDouble
  }

  /** `plotBoxPlots` (Plot.hs:106-115): one box-and-whisker row per
    * group on a shared horizontal scale —
    * `|--[==M==]--|` = lo-whisker, q1, median, q3, hi-whisker; the
    * trailing annotation carries n and the outlier count. Data side is
    * [[Stats.boxPlotStats]] (five-number summary + Tukey whiskers,
    * distributed). */
  def asciiBoxPlot(df: DataFrame, value: String, by: String,
                   width: Int = 60): String = {
    val rows = Stats.boxPlotStats(df, value, by).collect()
      .map(r => (Option(r.get(0)).map(_.toString).getOrElse("null"),
        r.getDouble(r.fieldIndex("lo_whisker")), r.getDouble(r.fieldIndex("q1")),
        r.getDouble(r.fieldIndex("v_median")), r.getDouble(r.fieldIndex("q3")),
        r.getDouble(r.fieldIndex("hi_whisker")), r.getLong(r.fieldIndex("n")),
        r.getLong(r.fieldIndex("n_outliers"))))
      .sortBy(_._1).toSeq
    if (rows.isEmpty) return "(empty)"
    val gMin = rows.map(_._2).min
    val gMax = rows.map(_._6).max
    val span = math.max(gMax - gMin, 1e-300)
    def pos(v: Double) = math.min(width - 1,
      math.max(0, ((v - gMin) / span * (width - 1)).round.toInt))
    val lw = rows.map(_._1.length).max
    val body = rows.map { case (g, lo, q1, med, q3, hi, n, out) =>
      val line = Array.fill(width)(' ')
      val (pl, p1, pm, p3, ph) = (pos(lo), pos(q1), pos(med), pos(q3), pos(hi))
      (pl until p1).foreach(line(_) = '-')
      (p1 to p3).foreach(line(_) = '=')
      (p3 + 1 to ph).foreach(i => if (i < width) line(i) = '-')
      line(pl) = '|'; line(ph) = '|'
      line(p1) = '['; line(p3) = ']'; line(pm) = 'M'
      s"${g.padTo(lw, ' ')} ${line.mkString}  (n=$n, outliers=$out)"
    }
    val scale = " " * (lw + 1) + f"$gMin%.2f" +
      " " * math.max(1, width - f"$gMin%.2f".length - f"$gMax%.2f".length) +
      f"$gMax%.2f"
    (body :+ scale).mkString("\n")
  }

  /** `plotStackedBars` (Plot.hs:117-134): one horizontal bar per
    * category, segmented by the per-series SUM over that category (the
    * reference sums each value column within the category), glyph per
    * series, legend below. The per-category sums are one distributed
    * aggregate. */
  def asciiStackedBars(df: DataFrame, category: String, ys: Seq[String],
                       width: Int = 40): String = {
    require(ys.nonEmpty, "asciiStackedBars: need at least one value column")
    val agg = df.groupBy(F.col(category).cast("string").as("cat"))
      .agg(F.sum(F.col(ys.head).cast("double")).as(ys.head),
        ys.tail.map(c => F.sum(F.col(c).cast("double")).as(c)): _*)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("null"),
        ys.indices.map(i => if (r.isNullAt(i + 1)) 0.0 else r.getDouble(i + 1))))
      .sortBy(_._1).toSeq
    if (agg.isEmpty) return "(empty)"
    val maxTotal = agg.map(_._2.sum).max
    val lw = agg.map(_._1.length).max
    val bars = agg.map { case (cat, vals) =>
      val segs = vals.zipWithIndex.map { case (v, i) =>
        val len = math.round(v / math.max(maxTotal, 1e-300) * width).toInt
        glyphs(i % glyphs.length).toString * len
      }.mkString
      val total = vals.sum
      val num = if (total == math.rint(total)) total.toLong.toString else f"$total%.2f"
      s"${cat.padTo(lw, ' ')} | $segs $num"
    }
    val legend = ys.zipWithIndex.map { case (c, i) =>
      s"${glyphs(i % glyphs.length)} $c" }.mkString("  ")
    (bars :+ legend).mkString("\n")
  }

  /** `plotPie` (Plot.hs:233-262 via Granite's disc): an ASCII disc cut
    * into slices clockwise from 12 o'clock, one glyph per slice, legend
    * with value and percent. Counts are a distributed group-by; at most
    * `maxSlices` slices plus the reference's "Other (k items, p%)"
    * fold. Cell aspect is 2:1 (terminal chars are tall). */
  def asciiPie(df: DataFrame, name: String, maxSlices: Int = 8,
               radius: Int = 8): String = {
    val counts = df.groupBy(F.col(name).cast("string").as("label"))
      .agg(F.count(F.lit(1)).cast("double").as("n"))
      .collect().map(r => (Option(r.getString(0)).getOrElse("null"), r.getDouble(1))).toSeq
    renderPie(groupWithOtherForPie(maxSlices, counts), radius)
  }

  def renderPie(items: Seq[(String, Double)], radius: Int = 8): String = {
    if (items.isEmpty) return "(empty)"
    val total = items.map(_._2).sum
    val cum = items.scanLeft(0.0)(_ + _._2).init.zip(items)
      .map { case (start, (l, v)) => (start / total, (start + v) / total, l, v) }
    val disc = (-radius to radius).map { dy =>
      (-2 * radius to 2 * radius).map { dx =>
        val (fx, fy) = (dx / 2.0, dy.toDouble)
        if (fx * fx + fy * fy > radius * radius) ' '
        else {
          // clockwise angle fraction from 12 o'clock
          val frac = {
            val a = math.atan2(fx, -fy) // 0 at top, +cw
            (if (a < 0) a + 2 * math.Pi else a) / (2 * math.Pi)
          }
          val idx = cum.indexWhere { case (s, e, _, _) => frac >= s && frac < e }
          glyphs((if (idx < 0) cum.length - 1 else idx) % glyphs.length)
        }
      }.mkString
    }
    val legend = cum.zipWithIndex.map { case ((s, e, l, v), i) =>
      val pct = math.round((e - s) * 100)
      val num = if (v == math.rint(v)) v.toLong.toString else f"$v%.2f"
      s"${glyphs(i % glyphs.length)} $l: $num ($pct%)"
    }
    (disc ++ legend).mkString("\n")
  }
}
