package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    // canonical order (id / (src, dst) — same as [[relation]]) so repeated
    // exports of the same graph are byte-identical
    nodes.select(cols.head, cols.tail: _*).orderBy("id").collect().foreach { r =>
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
    edges.select("src", "dst").orderBy("src", "dst").collect().zipWithIndex
      .foreach { case (r, i) =>
        sb ++= s"""      <edge id="$i" source="${esc(r.getString(0))}" target="${esc(r.getString(1))}" />""" + "\n"
      }
    sb ++= "    </edges>\n  </graph>\n</gexf>\n"
    sb.toString
  }

  /** The export surface as a RELATION — exactly the fields [[render]]
    * serializes, in its canonical order, with positions integerized to
    * micro-units so the relation hash-compares across engines. One row per
    * node (`kind='node'`: id, resolved label, viz color channels, x_u/y_u =
    * floor(coord·1e6)) and one per edge (`kind='edge'`: ordinal id by
    * (src, dst) — the same numbering render emits). This is what an
    * inventory/oracle query checks: a green row here certifies the export
    * path's field values, not just its XML well-formedness.
    *
    * Exports are dimension-sized (the reference's full graph is ~17k nodes),
    * so the single-partition ordinal window is acceptable here — this is a
    * sink-side relation, not a pipeline operator. */
  def relation(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val hasPos = nodes.columns.contains("x") && nodes.columns.contains("y")
    def chan(pick: ((Int, Int, Int)) => Int): Column =
      rgb.foldLeft(lit(null).cast("long")) { case (acc, (name, c)) =>
        when(col("color") === name, lit(pick(c).toLong)).otherwise(acc)
      }
    def posU(c: String): Column =
      if (hasPos) floor(col(c) * 1000000d).cast("long")
      else lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val n = nodes.select(lit("node").as("kind"),
      col("id").cast("string").as("id"),
      coalesce(col("label"), concat(lit("Node "), col("id"))).as("label"),
      chan(_._1).as("cr"), chan(_._2).as("cg"), chan(_._3).as("cb"),
      posU("x").as("x_u"), posU("y").as("y_u"),
      nullS.as("src"), nullS.as("dst"))
    val e = edges
      .select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst"))
      .withColumn("eid",
        row_number().over(Window.orderBy(col("src"), col("dst"))) - 1)
      .select(lit("edge").as("kind"), col("eid").cast("string").as("id"),
        nullS.as("label"),
        lit(null).cast("long").as("cr"), lit(null).cast("long").as("cg"),
        lit(null).cast("long").as("cb"),
        lit(null).cast("long").as("x_u"), lit(null).cast("long").as("y_u"),
        col("src"), col("dst"))
    n.unionByName(e)
  }

  def write(nodes: DataFrame, edges: DataFrame, path: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render(nodes, edges))
  }
}
