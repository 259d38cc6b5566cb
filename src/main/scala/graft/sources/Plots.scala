package graft.sources

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S8: PNG plot sink (plots_charts.py:53-94) — the reference's
  * matplotlib histogram / bar-chart reports, re-split for Spark: the
  * engine computes the aggregate DISTRIBUTED (equal-width bin counts /
  * top-N value counts — a ≤`bins`-row table no matter the corpus size),
  * and only that aggregate is collected and rendered driver-side with
  * the JDK's own raster stack (`BufferedImage` + `ImageIO`, no plotting
  * dependency — the environment has none). Same driver-side-presentation
  * pattern as [[Sinks.writeMetricsJson]]: the 100 TB work is the
  * aggregation, and that part never leaves the cluster.
  *
  * Bin semantics match `plt.hist(series, bins=n)`: n equal-width bins
  * spanning [min, max] of the non-null data, last bin right-closed.
  * An all-identical column degenerates to one full-height bar, and an
  * empty/all-null column writes nothing and returns false (the
  * reference logs and skips, plots_charts.py:57-61).
  */
object Plots {

  /** Equal-width histogram PNG of a numeric column. Returns false (and
    * writes nothing) when the column has no non-null values.
    */
  def writeHistogramPng(df: DataFrame, valueCol: String, path: String,
                        title: String, xlabel: String,
                        bins: Int = 50): Boolean = {
    histogramCounts(df, valueCol, bins) match {
      case None => false
      case Some((counts, lo, hi)) =>
        writeHistogramFromCounts(counts, lo, hi, path, title, xlabel)
        true
    }
  }

  /** The distributed half of [[writeHistogramPng]], exposed for direct
    * testing and for callers that want the bin table without the render:
    * (per-bin counts, data min, data max), or None for an empty column.
    */
  private[graft] def histogramCounts(df: DataFrame, valueCol: String,
                                     bins: Int): Option[(Seq[Long], Double, Double)] = {
    require(bins > 0, "bins must be positive")
    val x = col(valueCol).cast("double")
    val vals = df.filter(x.isNotNull && !x.isNaN).select(x.as("x"))
    // pass 1: range (one row); pass 2: bucket counts (≤ bins rows).
    // matplotlib derives edges from data min/max the same way.
    val r = vals.agg(count(lit(1)).as("n"), min("x").as("lo"), max("x").as("hi"))
      .collect()(0)
    if (r.getLong(0) == 0L) return None
    val (lo, hi) = (r.getDouble(1), r.getDouble(2))
    val counts = new Array[Long](bins)
    if (lo == hi) counts(0) = r.getLong(0)
    else {
      val width = (hi - lo) / bins
      vals
        .groupBy(least(floor((col("x") - lo) / width), lit(bins - 1))
          .cast("int").as("b"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .foreach(row => counts(row.getInt(0)) = row.getLong(1))
    }
    Some((counts.toSeq, lo, hi))
  }

  private def writeHistogramFromCounts(counts: Seq[Long], lo: Double,
                                       hi: Double, path: String,
                                       title: String, xlabel: String): Unit = {
    val bins = counts.size
    val edgeLabels =
      if (lo == hi) Seq(0 -> fmt(lo))
      else Seq(0 -> fmt(lo), bins / 2 -> fmt(lo + (hi - lo) / 2), (bins - 1) -> fmt(hi))
    renderBars(counts, edgeLabels, title, xlabel, path, rotateLabels = false)
  }

  /** Top-N value-counts bar chart PNG of a categorical column
    * (`series.value_counts().head(n)` + bar plot, plots_charts.py:74-94).
    * Ties break on the value itself so the chart is deterministic.
    */
  def writeBarCountsPng(df: DataFrame, keyCol: String, path: String,
                        title: String, xlabel: String,
                        topN: Int = 30): Boolean = {
    val rows = graft.ops.Report.topValues(
      df.filter(col(keyCol).isNotNull), keyCol, topN).collect()
    if (rows.isEmpty) return false
    val counts = rows.map(_.getLong(1)).toSeq
    val labels = rows.indices.map(i => i -> String.valueOf(rows(i).get(0)))
    renderBars(counts, labels, title, xlabel, path, rotateLabels = true)
    true
  }

  private def fmt(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString
    else f"$v%.3g"

  /** Driver-side raster: axes, y ticks, bars, title, x label; category
    * labels rotated 45° like the reference's xticks(rotation=45).
    * Input is an already-collected aggregate (≤ bins/topN values).
    */
  private def renderBars(counts: Seq[Long], xLabels: Seq[(Int, String)],
                         title: String, xlabel: String, path: String,
                         rotateLabels: Boolean): Unit = {
    val (w, h) = (800, 500)
    val (mL, mR, mT, mB) = (70, 20, 40, if (rotateLabels) 110 else 60)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE); g.fillRect(0, 0, w, h)
      val plotW = w - mL - mR
      val plotH = h - mT - mB
      val maxN = math.max(counts.max, 1L)
      // y ticks at 0, ¼, ½, ¾, max
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
      (0 to 4).foreach { i =>
        val v = maxN * i / 4
        val y = mT + plotH - (plotH * i / 4)
        g.setColor(new Color(230, 230, 230)); g.drawLine(mL, y, w - mR, y)
        g.setColor(Color.DARK_GRAY)
        val s = v.toString
        g.drawString(s, mL - 8 - g.getFontMetrics.stringWidth(s), y + 4)
      }
      // bars
      val n = counts.size
      val slot = plotW.toDouble / n
      val barW = math.max(1, (slot * 0.9).toInt)
      g.setColor(new Color(31, 119, 180)) // matplotlib C0
      counts.zipWithIndex.foreach { case (c, i) =>
        val bh = ((plotH.toDouble * c) / maxN).round.toInt
        g.fillRect(mL + (slot * i).toInt + ((slot - barW) / 2).toInt,
          mT + plotH - bh, barW, bh)
      }
      // axes
      g.setColor(Color.BLACK)
      g.setStroke(new BasicStroke(1.5f))
      g.drawLine(mL, mT, mL, mT + plotH)
      g.drawLine(mL, mT + plotH, w - mR, mT + plotH)
      // x labels
      xLabels.foreach { case (i, s) =>
        val cx = mL + (slot * i + slot / 2).toInt
        if (rotateLabels) {
          val t = if (s.length > 18) s.take(17) + "…" else s
          val old = g.getTransform
          g.translate(cx.toDouble, (mT + plotH + 10).toDouble)
          g.rotate(math.Pi / 4)
          g.drawString(t, 0, 0)
          g.setTransform(old)
        } else {
          g.drawString(s, cx - g.getFontMetrics.stringWidth(s) / 2,
            mT + plotH + 18)
        }
      }
      // title + x-axis label + y-axis label ("Count", plots_charts.py:67)
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 15))
      g.drawString(title, (w - g.getFontMetrics.stringWidth(title)) / 2, 24)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
      g.drawString(xlabel, (w - g.getFontMetrics.stringWidth(xlabel)) / 2, h - 8)
      val old = g.getTransform
      g.translate(16.0, (mT + plotH / 2).toDouble)
      g.rotate(-math.Pi / 2)
      g.drawString("Count", -g.getFontMetrics.stringWidth("Count") / 2, 0)
      g.setTransform(old)
    } finally g.dispose()
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    javax.imageio.ImageIO.write(img, "png", f)
  }
}
