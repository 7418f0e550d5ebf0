package graft

import org.apache.spark.sql.functions._

import graft.serve.Gexf

/** GEXF sink (SURVEY S9): well-formed XML, node/edge fidelity, color scheme,
  * escaping — parsed back with the JDK's namespace-aware DOM parser. */
class GexfSpec extends SparkTestBase {

  test("full-graph GEXF round-trips through an XML parser") {
    val built = Fixtures.built
    val nodes = built.entities.select(col("id"), col("name").as("label"),
      when(col("type") === "work", "red").otherwise("green").as("color"))
    val edges = built.edges
    val xml = Gexf.render(nodes, edges)

    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val nNodes = doc.getElementsByTagNameNS("*", "node").getLength
    val nEdges = doc.getElementsByTagNameNS("*", "edge").getLength
    assert(nNodes === built.entities.count())
    assert(nEdges === built.edges.count())
    val nColors = doc.getElementsByTagNameNS("*", "color").getLength
    assert(nColors === nNodes, "every node carries a viz color")
  }

  test("layout coordinates emit as viz:position (Gephi opens pre-laid-out)") {
    import spark.implicits._
    val vs = Seq("1", "2", "3").toDF("id")
    val es = Seq(("1", "2"), ("2", "3")).toDF("src", "dst")
    val pos = graft.graph.Layout.fruchtermanReingold(vs, es, iterations = 5)
    val nodes = vs.select(col("id"), col("id").as("label"), lit("green").as("color"))
      .join(pos, Seq("id"))
    val xml = Gexf.render(nodes, es)
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val positions = doc.getElementsByTagNameNS("*", "position")
    assert(positions.getLength === 3, "every node carries a viz position")
    val x0 = positions.item(0).getAttributes.getNamedItem("x").getNodeValue
    assert(x0.toDouble.isFinite)
    // without x/y columns the sink emits no positions (backward compatible)
    assert(!Gexf.render(nodes.drop("x", "y"), es).contains("viz:position"))
  }

  test("labels with XML metacharacters are escaped") {
    import spark.implicits._
    val nodes = Seq(("1", """a <&"> z""", "gray"), ("2", null, null))
      .toDF("id", "label", "color")
    val edges = Seq(("1", "2")).toDF("src", "dst")
    val xml = Gexf.render(nodes, edges)
    assert(xml.contains("a &lt;&amp;&quot;&gt; z"))
    assert(xml.contains("""label="Node 2""""), "null label falls back")
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    assert(doc.getElementsByTagName("node").getLength === 2)
  }
}
