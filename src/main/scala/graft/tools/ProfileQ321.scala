package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for q321 internals (not part of any query path). */
object ProfileQ321 {
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
    val aug = docs.withColumn("text", concat(col("text"),
      lit(" reach u"), col("doc_id").cast("string"),
      lit("@mail.example.com")))
    val feats = t("dsirFeatures") {
      val f = graft.ops.TrainingData.dsirFeatures(
        aug.filter(col("doc_id") % 3 =!= 0), 4096)
      sink(f); f
    }
    val model = graft.ops.TrainingData.dsirModel(feats, "src7")
    t("dsirModel agg") { sink(model) }
    val dups = docs.filter(col("doc_id") % 13 === 5).select(col("doc_id"))
    val dec = t("admissionDecisions") {
      val d = graft.streaming.IngestStream.admissionDecisions(
        aug, model, dups, 4096, 0L)
      sink(d); d
    }
    t("admissionFunnel (on top)") {
      sink(graft.streaming.IngestStream.admissionFunnel(dec))
    }
    t("FULL q321") {
      sink(graft.SparkEntry.queries("q321_ingest_admission")(spark, sfDir))
    }
    spark.stop()
  }
}
