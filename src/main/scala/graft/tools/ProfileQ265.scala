package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the release pipeline (not a query path). */
object ProfileQ265 {
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
    t("FULL q265 cold") {
      sink(graft.SparkEntry.queries("q265_dataset_release")(spark, sfDir))
    }
    t("FULL q265 warm") {
      sink(graft.SparkEntry.queries("q265_dataset_release")(spark, sfDir))
    }
    t("FULL q197 warm") {
      sink(graft.SparkEntry.queries("q197_pretrain_pipeline")(spark, sfDir))
    }
    t("FULL q36 warm") {
      sink(graft.SparkEntry.queries("q36_ngram_jaccard")(spark, sfDir))
    }
    spark.stop()
  }
}
