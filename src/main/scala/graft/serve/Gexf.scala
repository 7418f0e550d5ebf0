package graft.serve

import org.apache.spark.sql.DataFrame

/** GEXF (Gephi) sink (`grapher.py:140-163`, `utils/construct_full_graph.py`).
  *
  * Driver-side writer: graph exports are dimension-sized (the reference's full
  * graph is ~17k nodes). Emits GEXF 1.2draft with node labels and viz colors,
  * matching the reference's red(work)/green(author)/gray(excluded) scheme.
  */
object Gexf {

  private val rgb = Map(
    "red" -> (255, 0, 0),
    "green" -> (6, 200, 50),
    "gray" -> (128, 128, 128))

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** @param nodes DataFrame with columns id, label (nullable), color
    *              (red|green|gray, nullable), and optionally x/y layout
    *              coordinates (e.g. from [[graft.graph.Layout]]) emitted as
    *              `viz:position` so Gephi opens the graph pre-laid-out
    * @param edges DataFrame with columns src, dst
    */
  def render(nodes: DataFrame, edges: DataFrame): String = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8"?>""" + "\n"
    sb ++= """<gexf xmlns="http://gexf.net/1.2draft" xmlns:viz="http://gexf.net/1.2draft/viz" version="1.2">""" + "\n"
    sb ++= """  <graph defaultedgetype="directed" mode="static">""" + "\n"
    sb ++= "    <nodes>\n"
    val hasPos = nodes.columns.contains("x") && nodes.columns.contains("y")
    val cols = Seq("id", "label", "color") ++ (if (hasPos) Seq("x", "y") else Nil)
    nodes.select(cols.head, cols.tail: _*).collect().foreach { r =>
      val id = r.getString(0)
      val label = Option(r.getString(1)).getOrElse(s"Node $id")
      sb ++= s"""      <node id="${esc(id)}" label="${esc(label)}">"""
      Option(r.getString(2)).flatMap(rgb.get).foreach { case (cr, cg, cb) =>
        sb ++= s"""<viz:color r="$cr" g="$cg" b="$cb" />"""
      }
      if (hasPos && !r.isNullAt(3) && !r.isNullAt(4))
        sb ++= s"""<viz:position x="${r.getDouble(3)}" y="${r.getDouble(4)}" z="0.0" />"""
      sb ++= "</node>\n"
    }
    sb ++= "    </nodes>\n    <edges>\n"
    edges.select("src", "dst").collect().zipWithIndex.foreach { case (r, i) =>
      sb ++= s"""      <edge id="$i" source="${esc(r.getString(0))}" target="${esc(r.getString(1))}" />""" + "\n"
    }
    sb ++= "    </edges>\n  </graph>\n</gexf>\n"
    sb.toString
  }

  def write(nodes: DataFrame, edges: DataFrame, path: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render(nodes, edges))
  }
}
