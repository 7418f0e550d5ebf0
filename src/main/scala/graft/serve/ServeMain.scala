package graft.serve

import org.apache.spark.sql.SparkSession

import graft.etl.{EntityBuilder, LinkBuilder}

/** Runnable serving entry point: ETL the entity/link exports once, cache the
  * dimension tables, and serve the reference's core API
  * (`flask_app.py:95-252`) over them.
  *
  * Usage: ServeMain <entitiesCsv> [setiCsv] [port]
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val entitiesCsv = args(0)
    val setiCsv = if (args.length > 1) Some(args(1)) else None
    val port = if (args.length > 2) args(2).toInt else 8080

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[8]"))
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val built = EntityBuilder.build(spark, entitiesCsv)
    val entities = built.entities.cache()
    val edges = built.edges.cache()
    val etext = setiCsv.map { csv =>
      JsonOut.nestEtextLinks(LinkBuilder.build(spark, csv).links)
    }.getOrElse(Map.empty)

    val shim = new HttpShim(spark, entities, edges, etext)
    val bound = shim.start(port)
    println(s"graft-serve listening on http://127.0.0.1:$bound/api/")
    Thread.currentThread().join() // serve until killed
  }
}
