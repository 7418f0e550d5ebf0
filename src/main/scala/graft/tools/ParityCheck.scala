package graft.tools

import org.apache.spark.sql.SparkSession

import graft.etl.EntityBuilder
import graft.graph.Subgraph

/** Batch parity check: runs a set of subgraph queries in one session and
  * prints one `TAG {"nodes":[...],"edges":[[s,d]...]}` line per case, for
  * diffing against the reference engine's construct_subgraph output.
  */
object ParityCheck {
  def main(args: Array[String]): Unit = {
    val csv = args.headOption.getOrElse(
      "/root/reference/data/2025-11-07-extracted-entities-cleaned.csv")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-parity")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val built = EntityBuilder.build(spark, csv)
    val edges = built.edges.localCheckpoint(true)

    val cases = Seq(
      ("works89000_h2", Seq("89000"), 2, Nil),
      ("kalidasa_h1", Seq("40377"), 1, Nil),
      ("defaults_h1", Seq("85303", "85201", "89000", "88590"), 1, Nil),
      ("works89000_h2_excl", Seq("89000"), 2, Seq("85303")),
      ("works89000_h0", Seq("89000"), 0, Nil),
      ("kalidasa_h3", Seq("40377"), 3, Nil),
      ("kalidasa_h6", Seq("40377"), 6, Nil),
      ("kalidasa_h10", Seq("40377"), 10, Nil),
      ("excl_seed", Seq("89000", "40377"), 2, Seq("89000")))

    cases.foreach { case (tag, seeds, hops, excl) =>
      val r = Subgraph.extract(spark, edges, seeds, hops, excl)
      val nodes = r.nodes.collect().map(_.getString(0)).sorted
      val es = r.edges.collect().map(x => (x.getString(0), x.getString(1))).sorted
      val nj = nodes.map("\"" + _ + "\"").mkString("[", ",", "]")
      val ej = es.map { case (s, d) => s"""["$s","$d"]""" }.mkString("[", ",", "]")
      println(s"""PARITY $tag {"nodes":$nj,"edges":$ej}""")
    }
    spark.stop()
  }
}
