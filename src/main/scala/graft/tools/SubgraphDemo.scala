package graft.tools

import org.apache.spark.sql.SparkSession

import graft.etl.EntityBuilder
import graft.graph.Subgraph
import graft.serve.JsonOut

/** End-to-end demo/verification driver: reproduces the reference's flagship
  * `POST /api/graph/subgraph` query through the library's public API.
  *
  * Usage: SubgraphDemo <entitiesCsv> <seeds,comma,sep> <hops> [exclude,...]
  * Prints `{"nodes": [...sorted], "edges": [[src,dst]...sorted]}` for diffing
  * against the reference engine's output, then the full annotated JSON
  * response shape.
  */
object SubgraphDemo {
  def main(args: Array[String]): Unit = {
    val csv = args(0)
    val seeds = args(1).split(",").filter(_.nonEmpty).toSeq
    val hops = args(2).toInt
    val exclude = if (args.length > 3) args(3).split(",").filter(_.nonEmpty).toSeq else Nil

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[8]"))
      .appName("graft-subgraph-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val built = EntityBuilder.build(spark, csv)
    val entities = built.entities.cache()
    val edges = built.edges.cache()

    val result = Subgraph.extract(spark, edges, seeds, hops, exclude)
    val nodes = result.nodes.collect().map(_.getString(0)).sorted
    val keptEdges = result.edges.collect()
      .map(r => (r.getString(0), r.getString(1))).sorted

    val nodesJson = nodes.map(n => "\"" + n + "\"").mkString("[", ", ", "]")
    val edgesJson = keptEdges
      .map { case (s, d) => s"""["$s", "$d"]""" }.mkString("[", ", ", "]")
    println(s"""{"nodes": $nodesJson, "edges": $edgesJson}""")

    // Full annotated response (the reference API's response shape)
    val annotated = Subgraph.annotate(result.nodes, entities, seeds, exclude)
    val labeled = Subgraph.labelEdges(result.edges, entities)
    println(JsonOut.subgraphResponse(annotated, labeled,
      authors = Nil, works = seeds, hops = hops, exclude = exclude))

    spark.stop()
  }
}
