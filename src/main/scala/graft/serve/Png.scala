package graft.serve

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PNG render of the component-size histograms (SURVEY §2 S10,
  * `utils/analyze.py:371-425` `plot_complete_histogram`): a bar chart of
  * size → component-count with per-bar count labels, title carrying the
  * node/component totals, axis labels, and integer x ticks.
  *
  * Pure-JVM raster (headless `BufferedImage` + `ImageIO`) — no plotting
  * library. The histogram itself aggregates distributedly; only the
  * dimension-sized (size, count) rows reach the driver, exactly like the
  * reference's matplotlib step.
  */
object Png {

  /** Complete component-size histogram from a components labeling
    * (id, component): sizes aggregate in one distributed pass, the render
    * consumes the collected histogram. */
  def completeComponentHistogram(components: DataFrame): Array[Byte] = {
    val hist = components.groupBy(col("component"))
      .agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n"))
      .orderBy(col("size"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val totalNodes = hist.map { case (s, c) => s * c }.sum
    val totalComponents = hist.map(_._2).sum
    barChart(hist,
      titleLines = Seq("Complete Component Size Distribution",
        s"$totalNodes nodes in $totalComponents components"),
      xLabel = "Component Size (nodes)", yLabel = "Number of Components")
  }

  /** Deterministic bar chart: white canvas, y-linear bars, per-bar count
    * labels (`analyze.py:417-421`), integer x ticks. */
  def barChart(
      bars: Seq[(Long, Long)],
      titleLines: Seq[String],
      xLabel: String,
      yLabel: String,
      width: Int = 1200,
      height: Int = 640): Array[Byte] = {
    require(bars.nonEmpty, "empty histogram")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
        RenderingHints.VALUE_TEXT_ANTIALIAS_OFF)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, width, height)

      val (left, right, top, bottom) = (70, 20, 60, 60)
      val plotW = width - left - right
      val plotH = height - top - bottom
      val maxCount = bars.map(_._2).max.toDouble
      val minSize = bars.map(_._1).min
      val maxSize = bars.map(_._1).max
      val span = (maxSize - minSize + 1).toDouble

      // title
      g.setColor(Color.BLACK)
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 16))
      titleLines.zipWithIndex.foreach { case (t, i) =>
        val w = g.getFontMetrics.stringWidth(t)
        g.drawString(t, (width - w) / 2, 22 + i * 18)
      }

      // axes
      g.setStroke(new BasicStroke(1f))
      g.drawLine(left, top, left, top + plotH)
      g.drawLine(left, top + plotH, left + plotW, top + plotH)

      // bars + labels
      val slot = plotW / span
      val barW = math.max(1, (slot * 0.8).toInt)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
      bars.foreach { case (size, n) =>
        val x = left + ((size - minSize) * slot).toInt + ((slot - barW) / 2).toInt
        val h = math.max(1, (n / maxCount * plotH).toInt)
        g.setColor(new Color(31, 119, 180)) // matplotlib C0
        g.fillRect(x, top + plotH - h, barW, h)
        g.setColor(Color.BLACK)
        val label = n.toString
        val lw = g.getFontMetrics.stringWidth(label)
        g.drawString(label, x + (barW - lw) / 2, top + plotH - h - 4)
      }

      // x ticks (integers) + axis labels
      val tickStep = math.max(1L, (span / 20).toLong)
      (minSize to maxSize by tickStep).foreach { s =>
        val x = left + ((s - minSize) * slot).toInt + (slot / 2).toInt
        g.drawLine(x, top + plotH, x, top + plotH + 4)
        val t = s.toString
        val tw = g.getFontMetrics.stringWidth(t)
        g.drawString(t, x - tw / 2, top + plotH + 18)
      }
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 13))
      val xw = g.getFontMetrics.stringWidth(xLabel)
      g.drawString(xLabel, left + (plotW - xw) / 2, height - 14)
      // y label, rotated
      val g2 = g.create().asInstanceOf[java.awt.Graphics2D]
      g2.rotate(-math.Pi / 2)
      val yw = g2.getFontMetrics.stringWidth(yLabel)
      g2.drawString(yLabel, -(top + (plotH + yw) / 2), 18)
      g2.dispose()

      // y ticks: 0 and max
      g.drawString("0", left - 16, top + plotH + 4)
      val mt = maxCount.toLong.toString
      g.drawString(mt, left - 10 - g.getFontMetrics.stringWidth(mt), top + 10)
    } finally g.dispose()

    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
