package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for q323 internals (not part of any query path). */
object ProfileQ323 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    sink(docs.select(col("doc_id")))
    t("impactIndexBuild (stats+encode)") {
      val idx = graft.ops.Retrieval.impactIndexBuild(
        docs.select(col("doc_id"), col("text")))
      sink(idx.postings)
    }
    t("FULL q323 cold") {
      sink(graft.SparkEntry.queries("q323_impact_drift_recall")(spark, sfDir))
    }
    t("FULL q323 warm") {
      sink(graft.SparkEntry.queries("q323_impact_drift_recall")(spark, sfDir))
    }
    spark.stop()
  }
}
